"""Property-based soundness of data-skipping predicate translation.

THE invariant of file skipping: for any data layout and any supported
predicate, pruning may drop only files with NO matching rows — the
accelerated result must always equal the full scan.  Hypothesis
generates random per-file integer data and random predicates; we
evaluate the sketch conversion in pure Python against per-file min/max /
value-list / bloom sketches and compare with brute-force row evaluation.
"""

import math

from hypothesis import given, settings, strategies as st

from hyperspace_spark.indexes.sketches import (
    BloomFilterSketch,
    MinMaxSketch,
    PartitionSketch,
    ValueListSketch,
    bloom_build,
    bloom_might_contain,
)
from hyperspace_spark.planner.expr import Attr, BoolOp, Cmp, InExpr, Lit, NullTest


def attr(name="x"):
    return Attr(sql=name, references=frozenset([name]), name=name, dtype="long")


def lit(v):
    return Lit(sql=str(v), dtype="long")


cmp_ops = st.sampled_from(["=", "<", "<=", ">", ">="])
values = st.integers(min_value=-50, max_value=50)


@st.composite
def predicates(draw, depth=2):
    if depth == 0 or draw(st.booleans()):
        kind = draw(st.sampled_from(["cmp", "in", "notnull"]))
        if kind == "cmp":
            op = draw(cmp_ops)
            v = draw(values)
            return Cmp(sql=f"(x {op} {v})", references=frozenset(["x"]), op=op,
                       left=attr(), right=lit(v)), lambda row, _op=op, _v=v: (
                row is not None and {
                    "=": row == _v, "<": row < _v, "<=": row <= _v,
                    ">": row > _v, ">=": row >= _v}[_op])
        if kind == "in":
            vs = draw(st.lists(values, min_size=1, max_size=4))
            return InExpr(sql="x in", references=frozenset(["x"]), child=attr(),
                          values=tuple(lit(v) for v in vs)), (
                lambda row, _vs=tuple(vs): row is not None and row in _vs)
        return NullTest(sql="x is not null", references=frozenset(["x"]),
                        child=attr(), is_null=False), (lambda row: row is not None)
    op = draw(st.sampled_from(["and", "or"]))
    (e1, f1) = draw(predicates(depth=depth - 1))
    (e2, f2) = draw(predicates(depth=depth - 1))
    e = BoolOp(sql=f"({e1.sql} {op} {e2.sql})", references=frozenset(["x"]),
               op=op, children=(e1, e2))
    fn = (lambda row: f1(row) and f2(row)) if op == "and" else (lambda row: f1(row) or f2(row))
    return e, fn


def eval_minmax_sql(pred_sql_fn, lo, hi):
    """Evaluate MinMax conversion semantics in Python (mirrors the SQL)."""
    raise NotImplementedError  # not used; kept for clarity


def might_match_minmax(e, lo, hi, has_value):
    """Pure-Python evaluation of MinMaxSketch.convert semantics."""
    if isinstance(e, BoolOp):
        parts = [might_match_minmax(c, lo, hi, has_value) for c in e.children]
        return all(parts) if e.op == "and" else any(parts)
    if isinstance(e, Cmp):
        v = int(e.right.sql)
        if lo is None:
            return False if e.op in ("=", "<", "<=", ">", ">=") else True
        return {
            "=": lo <= v <= hi,
            "<": lo < v,
            "<=": lo <= v,
            ">": hi > v,
            ">=": hi >= v,
        }[e.op]
    if isinstance(e, InExpr):
        if lo is None:
            return False
        return any(lo <= int(v.sql) <= hi for v in e.values)
    if isinstance(e, NullTest):
        return lo is not None  # min IS NOT NULL
    return True


@settings(max_examples=300, deadline=None)
@given(
    files=st.lists(
        st.lists(st.one_of(st.none(), values), min_size=1, max_size=20),
        min_size=1,
        max_size=6,
    ),
    pe=predicates(),
)
def test_minmax_pruning_never_drops_matches(files, pe):
    e, row_fn = pe
    for rows in files:
        non_null = [r for r in rows if r is not None]
        lo = min(non_null) if non_null else None
        hi = max(non_null) if non_null else None
        file_has_match = any(row_fn(r) for r in rows)
        if file_has_match:
            assert might_match_minmax(e, lo, hi, bool(non_null)), (
                f"sound-pruning violated: rows={rows} pred={e.sql}"
            )


@settings(max_examples=200, deadline=None)
@given(
    rows=st.lists(values, min_size=1, max_size=50),
    probe=values,
)
def test_bloom_never_false_negative(rows, probe):
    blob = bloom_build(rows, 512, 5)
    if probe in rows:
        assert bloom_might_contain(blob, probe, 512, 5)


@settings(max_examples=200, deadline=None)
@given(rows=st.lists(values, min_size=1, max_size=30), v=values)
def test_valuelist_semantics(rows, v):
    vals = sorted(set(rows))
    # array_contains(vals, v) must equal membership
    assert (v in vals) == (v in rows or v in vals)
    # element_at(vals, 1) < v must imply some row < v
    if vals and vals[0] < v:
        assert any(r < v for r in rows)
    if vals and vals[-1] > v:
        assert any(r > v for r in rows)


@settings(max_examples=150, deadline=None)
@given(
    files=st.lists(
        st.lists(st.one_of(st.none(), values), min_size=1, max_size=20),
        min_size=1,
        max_size=5,
    ),
    pe=predicates(),
)
def test_actual_translate_sql_is_sound(files, pe):
    """Evaluate the REAL translate() output SQL (DuckDB) against per-file
    sketch values: any file with a matching row must survive."""
    import duckdb

    from hyperspace_spark.indexes.dataskipping import translate

    e, row_fn = pe
    pred = translate(e, [MinMaxSketch(["x"])])
    if pred.sql is None:
        return  # no pruning claimed -> trivially sound
    sql = pred.sql.replace("`", '"')  # Spark backticks -> DuckDB quotes
    con = duckdb.connect()
    for rows in files:
        non_null = [r for r in rows if r is not None]
        lo = min(non_null) if non_null else None
        hi = max(non_null) if non_null else None
        lo_sql = "NULL" if lo is None else str(lo)
        hi_sql = "NULL" if hi is None else str(hi)
        kept = con.execute(
            f'SELECT coalesce(({sql}), false) FROM '
            f'(SELECT CAST({lo_sql} AS BIGINT) AS "MinMax_x__min", '
            f'        CAST({hi_sql} AS BIGINT) AS "MinMax_x__max")'
        ).fetchone()[0]
        if any(row_fn(r) for r in rows):
            assert kept, f"translate() pruned a matching file: rows={rows} pred={e.sql} -> {pred.sql}"
