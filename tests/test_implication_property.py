"""Property-based soundness for planner/implication.py: if the prover
says q ⇒ p, then EVERY value satisfying q satisfies p — checked by
brute-force evaluation over the literal-neighborhood domain.  A prover
false-positive here is a wrong-results bug (a partial index would serve
rows it doesn't hold); false NEGATIVES are fine (conservative).
"""

from hypothesis import given, settings, strategies as st

from hyperspace_spark.planner.expr import Attr, BoolOp, Cmp, InExpr, Lit
from hyperspace_spark.planner.implication import implies

COLS = ("x", "y")
OPS = ("=", "<", "<=", ">", ">=")


def _attr(col):
    return Attr(sql=col, references=frozenset([col]), name=col, dtype="bigint")


def _lit(v):
    return Lit(sql=str(v), dtype="int")


def _cmp(col, op, v):
    return Cmp(
        sql=f"({col} {op} {v})", references=frozenset([col]), op=op,
        left=_attr(col), right=_lit(v),
    )


def _in(col, vals):
    return InExpr(
        sql=f"{col} IN ({', '.join(map(str, vals))})",
        references=frozenset([col]),
        child=_attr(col),
        values=tuple(_lit(v) for v in vals),
    )


def _and(parts):
    refs = frozenset().union(*[p.references for p in parts])
    return BoolOp(
        sql="(" + " AND ".join(p.sql for p in parts) + ")",
        references=refs, op="and", children=tuple(parts),
    )


def _or(parts):
    refs = frozenset().union(*[p.references for p in parts])
    return BoolOp(
        sql="(" + " OR ".join(p.sql for p in parts) + ")",
        references=refs, op="or", children=tuple(parts),
    )


def _eval(e, row):
    """Two-valued evaluation over non-null integer rows (the partial
    index build filter also sees non-null rows for these shapes)."""
    if isinstance(e, Cmp):
        v = row[e.left.name]
        w = int(e.right.sql)
        return {
            "=": v == w, "<=>": v == w,
            "<": v < w, "<=": v <= w, ">": v > w, ">=": v >= w,
        }[e.op]
    if isinstance(e, InExpr):
        return row[e.child.name] in {int(l.sql) for l in e.values}
    if isinstance(e, BoolOp):
        vals = [_eval(c, row) for c in e.children]
        return all(vals) if e.op == "and" else any(vals)
    raise AssertionError(type(e))


conj = st.one_of(
    st.tuples(
        st.sampled_from(COLS), st.sampled_from(OPS), st.integers(-5, 5)
    ).map(lambda t: _cmp(*t)),
    st.tuples(
        st.sampled_from(COLS),
        st.lists(st.integers(-5, 5), min_size=1, max_size=4, unique=True),
    ).map(lambda t: _in(*t)),
)

expr = st.one_of(
    conj,
    st.lists(conj, min_size=2, max_size=3).map(_and),
    st.lists(conj, min_size=2, max_size=3).map(_or),
)


@settings(max_examples=500, deadline=None)
@given(q=expr, p=expr)
def test_implies_is_sound(q, p):
    if not implies(q, p):
        return  # conservative negatives are always fine
    # exhaustive check over the domain the literals live in (bounds ±1)
    for x in range(-7, 8):
        for y in range(-7, 8):
            row = {"x": x, "y": y}
            if _eval(q, row):
                assert _eval(p, row), (q.sql, p.sql, row)


@settings(max_examples=200, deadline=None)
@given(e=expr)
def test_implies_is_reflexive(e):
    assert implies(e, e)
