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


# ---------------------------------------------------------------------------
# r11: NOT + NULL grammar, three-valued-logic soundness
# ---------------------------------------------------------------------------
from hyperspace_spark.planner.expr import NotExpr, NullTest  # noqa: E402


def _not(e):
    return NotExpr(sql=f"(NOT {e.sql})", references=e.references, child=e)


def _null(col, is_null):
    word = "IS NULL" if is_null else "IS NOT NULL"
    return NullTest(
        sql=f"({col} {word})", references=frozenset([col]),
        child=_attr(col), is_null=is_null,
    )


def _eval3(e, row):
    """SQL three-valued logic over rows that may hold None; a WHERE
    keeps the row iff the result is True (not None)."""
    if isinstance(e, Cmp):
        v = row[e.left.name]
        if v is None:
            return None
        w = int(e.right.sql)
        return {
            "=": v == w, "<": v < w, "<=": v <= w, ">": v > w, ">=": v >= w,
        }[e.op]
    if isinstance(e, InExpr):
        v = row[e.child.name]
        if v is None:
            return None
        return v in {int(l.sql) for l in e.values}
    if isinstance(e, NullTest):
        return (row[e.child.name] is None) == e.is_null
    if isinstance(e, NotExpr):
        r = _eval3(e.child, row)
        return None if r is None else (not r)
    if isinstance(e, BoolOp):
        vals = [_eval3(c, row) for c in e.children]
        if e.op == "and":
            if any(v is False for v in vals):
                return False
            return None if any(v is None for v in vals) else True
        if any(v is True for v in vals):
            return True
        return None if any(v is None for v in vals) else False
    raise AssertionError(type(e))


atom3 = st.one_of(
    conj,
    st.tuples(st.sampled_from(COLS), st.booleans()).map(lambda t: _null(*t)),
)
atom3_or_not = st.one_of(atom3, atom3.map(_not))
expr3 = st.one_of(
    atom3_or_not,
    st.lists(atom3_or_not, min_size=2, max_size=3).map(_and),
    st.lists(atom3_or_not, min_size=2, max_size=3).map(_or),
    st.lists(atom3_or_not, min_size=2, max_size=2).map(_and).map(_not),
    st.lists(atom3_or_not, min_size=2, max_size=2).map(_or).map(_not),
)

_DOMAIN3 = [None] + list(range(-7, 8))


@settings(max_examples=500, deadline=None)
@given(q=expr3, p=expr3)
def test_implies_is_sound_with_not_and_null(q, p):
    """Soundness under 3VL with NULLs in the domain: if the prover says
    q ⇒ p, every row where q is TRUE must have p TRUE (a NULL p would
    drop the row from the partial index — wrong results)."""
    if not implies(q, p):
        return
    for x in _DOMAIN3:
        for y in _DOMAIN3:
            row = {"x": x, "y": y}
            if _eval3(q, row) is True:
                assert _eval3(p, row) is True, (q.sql, p.sql, row)


@settings(max_examples=200, deadline=None)
@given(e=expr3)
def test_implies_reflexive_with_not(e):
    assert implies(e, e)
