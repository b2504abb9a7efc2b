"""Property-based parse->replay fuzzing (hypothesis).

The replayer's contract is semantic identity: ANY query the parser
models must replay to the same rows with no index involved.  The fixed
cases in test_plan_roundtrip.py pin known shapes; this fuzzer samples
the predicate space that r7 made much wider — IN lists crossing both
the Catalyst In->InSet threshold (10) and the sketch OR-chain cap (64),
strings containing quotes/backslashes, negative and boundary numerics,
NULL-bearing comparisons — over filter/project/aggregate/sort stacks.

Examples are capped (30) and the frame is tiny (200 rows, built once):
each example costs one parse + one replay + two collects (~0.3 s).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings

from tests.conftest import hyp_examples
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hyperspace_spark.planner.parser import UnsupportedPlan, parse_df
from hyperspace_spark.planner.replay import replay

_BASE_ROWS = 200


@pytest.fixture(scope="module")
def fuzz_df(spark):
    strings = ["alpha", "a'b", "a\\b", "x,y", "", "Z" * 10, "ünïcode"]
    rows = [
        (
            i,  # k long
            i % 23 - 11,  # small int incl. negatives
            float(i) * 1.25 - 30.0 if i % 17 else None,  # v double with NULLs
            strings[i % len(strings)] if i % 13 else None,  # s string with NULLs
        )
        for i in range(_BASE_ROWS)
    ]
    return spark.createDataFrame(rows, "k long, g int, v double, s string")


_num_lit = st.one_of(
    st.integers(min_value=-(2**33), max_value=2**33),
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=64).map(
        lambda x: round(x, 3)
    ),
)
_str_lit = st.sampled_from(["alpha", "a'b", "a\\b", "x,y", "", "nope"])


@st.composite
def _predicate(draw):
    """One boolean Column over (k, g, v, s)."""
    kind = draw(st.sampled_from(["cmp", "in_small", "in_inset", "in_huge", "null", "str"]))
    if kind == "cmp":
        col = draw(st.sampled_from(["k", "g", "v"]))
        op = draw(st.sampled_from(["<", "<=", ">", ">=", "==", "!="]))
        lit = draw(_num_lit)
        c = F.col(col)
        return {
            "<": c < lit, "<=": c <= lit, ">": c > lit,
            ">=": c >= lit, "==": c == lit, "!=": c != lit,
        }[op]
    if kind.startswith("in_"):
        n = {"in_small": 5, "in_inset": 15, "in_huge": 80}[kind]
        col = draw(st.sampled_from(["k", "g"]))
        base = draw(st.integers(min_value=-40, max_value=150))
        step = draw(st.integers(min_value=1, max_value=7))
        return F.col(col).isin([base + step * i for i in range(n)])
    if kind == "null":
        col = draw(st.sampled_from(["v", "s"]))
        return F.col(col).isNull() if draw(st.booleans()) else F.col(col).isNotNull()
    # str
    vals = draw(st.lists(_str_lit, min_size=1, max_size=12, unique=True))
    return F.col("s").isin(vals) if len(vals) > 1 else F.col("s") == vals[0]


@st.composite
def _query(draw, df_getter):
    df = df_getter()
    preds = draw(st.lists(_predicate(), min_size=1, max_size=3))
    combined = preds[0]
    for p in preds[1:]:
        combined = combined & p if draw(st.booleans()) else combined | p
    q = df.filter(combined)
    shape = draw(st.sampled_from(["project", "agg", "sort_limit"]))
    if shape == "project":
        return q.select("k", (F.col("g") + 1).alias("g1"), "s")
    if shape == "agg":
        return q.groupBy("g").agg(
            F.count("*").alias("cnt"), F.round(F.sum("v"), 2).alias("sv")
        )
    return q.select("k", "v").orderBy(F.col("k").desc()).limit(25)


@settings(
    max_examples=hyp_examples(30),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_replay_roundtrip_fuzz(spark, fuzz_df, data):
    q = data.draw(_query(lambda: fuzz_df))
    try:
        node = parse_df(q)
    except UnsupportedPlan:
        return  # fallback path: apply() would leave the query untouched
    out = replay(spark, node)
    got = sorted(map(tuple, out.collect()))
    want = sorted(map(tuple, q.collect()))
    assert got == want, f"replay mismatch for plan:\n{node}"
