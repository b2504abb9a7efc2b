"""Planner soundness fuzz: for RANDOM filter predicates over a source
with every index kind active at once, `hs.apply(df)` must return exactly
the raw result — whichever rule wins (plain filter rewrite, index-OR
union, partial-index implication, skipping intersection, z-order stats
pruning) and however they interact.

This is the adversarial complement to the per-rule suites: each of those
pins ONE rule's happy path; real queries hand the optimizer arbitrary
predicate shapes where the WRONG winner (or a wrong guard in the OR
union, or an unsound implication) silently drops or duplicates rows.
The hypothesis grammar covers =, <>, ranges, BETWEEN, IN, IS [NOT]
NULL, AND/OR/NOT nesting — over the bucket column, the z-order column,
the partial predicate's column, and a never-indexed column.
"""

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from tests.conftest import hyp_examples
from pyspark.sql import functions as F

from hyperspace_spark import (
    CoveringIndexConfig,
    DataSkippingIndexConfig,
    Hyperspace,
    MinMaxSketch,
    ZOrderCoveringIndexConfig,
)
from hyperspace_spark.indexes.sketches import BloomFilterSketch, ValueListSketch

from tests.conftest import table


@pytest.fixture(scope="module")
def fuzz_env(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("hs_fuzz"))
    src = f"{root}/orders"
    table(spark, "orders").repartition(4).write.parquet(src)
    o = spark.read.parquet(src)
    hs = Hyperspace(spark, system_path=f"{root}/idx")
    hs.create_index(
        o,
        CoveringIndexConfig(
            "fz_cust",
            ["o_custkey"],
            ["o_orderkey", "o_totalprice", "o_orderpriority"],
            num_buckets=8,
        ),
    )
    hs.create_index(
        o,
        CoveringIndexConfig(
            "fz_okey",
            ["o_orderkey"],
            ["o_custkey", "o_totalprice", "o_orderpriority"],
            num_buckets=8,
        ),
    )
    hs.create_index(
        o,
        CoveringIndexConfig(
            "fz_partial",
            ["o_custkey"],
            ["o_orderkey", "o_totalprice", "o_orderpriority"],
            num_buckets=4,
            where="o_orderpriority = '1-URGENT'",
        ),
    )
    hs.create_index(
        o,
        ZOrderCoveringIndexConfig(
            "fz_z",
            ["o_custkey", "o_totalprice"],
            ["o_orderkey", "o_orderpriority"],
        ),
    )
    hs.create_index(
        o,
        DataSkippingIndexConfig(
            "fz_skip",
            [
                MinMaxSketch(["o_totalprice"]),
                BloomFilterSketch(["o_orderkey"]),
                ValueListSketch(["o_orderpriority"]),
            ],
        ),
    )
    # Nullable twin (r13, VERDICT r12 #2): NULLs injected into the JOIN
    # KEY and the BAND column so the semi/anti band fuzz exercises 3VL —
    # TPC-H orders has no NULLs anywhere, so without this arm the
    # all-NULL-group / NULL-probe cases were never generated.
    src_nulls = f"{root}/orders_nulls"
    (
        o.withColumn(
            "o_custkey",
            F.when(F.col("o_orderkey") % 11 == 0, None).otherwise(F.col("o_custkey")),
        )
        .withColumn(
            "o_totalprice",
            F.when(F.col("o_orderkey") % 7 == 0, None).otherwise(F.col("o_totalprice")),
        )
        .repartition(4)
        .write.parquet(src_nulls)
    )
    hs.create_index(
        spark.read.parquet(src_nulls),
        CoveringIndexConfig(
            "fz_cust_n",
            ["o_custkey"],
            ["o_orderkey", "o_totalprice", "o_orderpriority"],
            num_buckets=8,
        ),
    )
    # zero apply-cache TTL: every fuzz case must RE-PLAN (a cache hit
    # would silently re-test the previous example's rewrite)
    spark.conf.set("spark.hyperspace.apply.cacheTtlSeconds", "0")
    yield hs, src, src_nulls
    spark.conf.unset("spark.hyperspace.apply.cacheTtlSeconds")


PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


def _leaf() -> st.SearchStrategy[str]:
    custkey = st.integers(0, 1500)
    okey = st.integers(0, 60000)
    price = st.integers(0, 400000)
    return st.one_of(
        st.tuples(st.sampled_from(["=", "<", "<=", ">", ">=", "<>"]), custkey).map(
            lambda t: f"o_custkey {t[0]} {t[1]}"
        ),
        st.tuples(st.sampled_from(["=", "<", ">"]), okey).map(
            lambda t: f"o_orderkey {t[0]} {t[1]}"
        ),
        st.tuples(price, price).map(
            lambda t: f"o_totalprice BETWEEN {min(t)} AND {max(t)}.5"
        ),
        st.lists(custkey, min_size=1, max_size=5, unique=True).map(
            lambda v: f"o_custkey IN ({', '.join(map(str, v))})"
        ),
        st.sampled_from(PRIORITIES).map(lambda p: f"o_orderpriority = '{p}'"),
        st.sampled_from(PRIORITIES).map(lambda p: f"o_orderpriority <> '{p}'"),
        st.sampled_from(
            ["o_orderpriority IS NOT NULL", "o_orderpriority IS NULL"]
        ),
    )


def _expr(depth: int = 2) -> st.SearchStrategy[str]:
    if depth == 0:
        return _leaf()
    sub = _expr(depth - 1)
    return st.one_of(
        _leaf(),
        st.tuples(sub, sub).map(lambda t: f"({t[0]} AND {t[1]})"),
        st.tuples(sub, sub).map(lambda t: f"({t[0]} OR {t[1]})"),
        sub.map(lambda s: f"(NOT {s})"),
    )


@pytest.mark.slow
@settings(
    max_examples=hyp_examples(20),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pred=_expr(1), shape=st.sampled_from(["plain", "rollup", "postfilter"]))
def test_apply_matches_raw_on_random_join_shapes(spark, fuzz_env, pred, shape):
    """Join-shaped fuzz: the same index set under an equi self-join of
    orders aggregates (the q65 skeleton) with a random side filter —
    JoinIndexRule / partial-side implication / the co-bucketed agg path
    must never change results, including under a rollup on top."""
    hs, src, _ = fuzz_env
    o = spark.read.parquet(src)
    left = o.filter(pred).groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("spend")
    )
    right = o.groupBy("o_custkey").agg(F.count("*").alias("n_orders"))
    j = left.join(right, "o_custkey")
    if shape == "rollup":
        df = j.rollup("o_custkey").agg(
            F.round(F.sum("spend"), 2).alias("s"), F.sum("n_orders").alias("n")
        )
    elif shape == "postfilter":
        df = j.filter("n_orders >= 2").select("o_custkey", "spend", "n_orders")
    else:
        df = j.select("o_custkey", "spend", "n_orders")
    out, used = hs._apply_with_info(df)
    key = lambda r: tuple((x is None, x) for x in r)
    raw = sorted(map(key, df.collect()))
    got = sorted(map(key, out.collect()))
    assert got == raw, (pred, shape, used, len(raw), len(got))


@pytest.mark.slow
@settings(
    max_examples=hyp_examples(20),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pred=_expr(1),
    part=st.sampled_from(["o_custkey", "o_orderpriority"]),
    fn=st.sampled_from(["row_number", "rank", "sum", "lag"]),
)
def test_apply_matches_raw_on_random_windows(spark, fuzz_env, pred, part, fn):
    """Window fuzz: a random filter under a window function partitioned
    by the bucket key or a non-key — WindowBucketedIndexRule (when the
    partition key matches the index bucketing) and the plain filter
    rewrite must never change results.  Ties are broken with a full
    deterministic ORDER BY so rank comparisons are stable."""
    from pyspark.sql import Window as W

    hs, src, _ = fuzz_env
    o = spark.read.parquet(src)
    w = W.partitionBy(part).orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    col = {
        "row_number": F.row_number().over(w),
        "rank": F.rank().over(w),
        "sum": F.round(F.sum("o_totalprice").over(w), 2),
        "lag": F.lag("o_orderkey", 1).over(w),
    }[fn]
    df = (
        o.filter(pred)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
        .withColumn("wv", col)
    )
    out, used = hs._apply_with_info(df)
    key = lambda r: tuple((x is None, x) for x in r)
    raw = sorted(map(key, df.collect()))
    got = sorted(map(key, out.collect()))
    assert got == raw, (pred, part, fn, used, len(raw), len(got))


@pytest.mark.slow
@settings(
    max_examples=hyp_examples(60),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pred=_expr(2), proj=st.sampled_from(["narrow", "wide", "agg"]))
def test_apply_matches_raw_on_random_predicates(spark, fuzz_env, pred, proj):
    hs, src, _ = fuzz_env
    o = spark.read.parquet(src)
    if proj == "narrow":
        df = o.filter(pred).select("o_orderkey", "o_totalprice")
    elif proj == "wide":
        df = o.filter(pred).select(
            "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
        )
    else:
        df = o.filter(pred).agg(
            F.count("*").alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("s"),
            F.min("o_orderkey").alias("mk"),
        )
    out, used = hs._apply_with_info(df)
    key = lambda r: tuple((x is None, x) for x in r)
    raw = sorted(map(key, df.collect()))
    got = sorted(map(key, out.collect()))
    assert got == raw, (pred, proj, used, len(raw), len(got))


def _band_residual() -> st.SearchStrategy:
    """(build_fn, n_conjuncts) strategies for a both-side residual: a
    comparison between arithmetic over the left row and arithmetic over
    the right row.  >,>=,<,<= single-conjunct shapes are the
    BandExistsAggRule surface; =, <> and multi-conjunct shapes force the
    plain r11 semi/anti serving — both must stay result-exact."""
    ops = st.sampled_from([">", ">=", "<", "<=", "=", "<>"])
    lexpr = st.sampled_from(
        [
            "a.o_totalprice",
            "(a.o_totalprice * 2)",
            "(a.o_totalprice + 1000)",
            "a.o_orderkey",
        ]
    )
    rexpr = st.sampled_from(
        ["b.o_totalprice", "(b.o_totalprice / 2)", "b.o_orderkey"]
    )
    one = st.tuples(rexpr, ops, lexpr).map(lambda t: f"{t[0]} {t[1]} {t[2]}")
    return st.lists(one, min_size=1, max_size=2)


@pytest.mark.slow
@settings(
    max_examples=hyp_examples(25),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    jt=st.sampled_from(["left_semi", "left_anti"]),
    residual=_band_residual(),
    pred=_expr(1),
    filt=st.sampled_from(["none", "left", "right", "both"]),
    src_kind=st.sampled_from(["plain", "nulls"]),
)
def test_apply_matches_raw_on_semi_anti_band_joins(
    spark, fuzz_env, jt, residual, pred, filt, src_kind
):
    """Semi/anti + residual fuzz (r12, VERDICT r11 #3): the trickiest
    attribution code — side-qualified residual rendering by exprId and
    the band-to-aggregate rewrite — under random both-side arithmetic
    comparisons, random side filters, every index kind active.  apply()
    must be row-exact whichever of {BandExistsAggRule, plain semi/anti
    serving, single-side rewrites, opaque fallback} wins.  The "nulls"
    arm (r13) runs the same shapes over the NULL-injected twin — NULL
    join keys (never equi-match), all-NULL and mixed band groups, NULL
    probe values — so the rewrite's 3VL argument is fuzzed, not just
    argued."""
    hs, src, src_nulls = fuzz_env
    o = spark.read.parquet(src if src_kind == "plain" else src_nulls)
    a = (o.filter(pred) if filt in ("left", "both") else o).alias("a")
    b = (o.filter(pred) if filt in ("right", "both") else o).alias("b")
    cond = F.col("a.o_custkey") == F.col("b.o_custkey")
    for r in residual:
        cond = cond & F.expr(r)
    df = a.join(b, cond, jt).select(
        F.col("a.o_orderkey").alias("o_orderkey"),
        F.col("a.o_custkey").alias("o_custkey"),
        F.round(F.col("a.o_totalprice"), 2).alias("total"),
    )
    out, used = hs._apply_with_info(df)
    key = lambda r: tuple((x is None, x) for x in r)
    raw = sorted(map(key, df.collect()))
    got = sorted(map(key, out.collect()))
    assert got == raw, (jt, residual, pred, filt, used, len(raw), len(got))


def _fuse_proj() -> st.SearchStrategy:
    """Random side-attributed projection lists over a colliding inner
    self-join — the r12 Project-fusion surface.  Both sides expose the
    same column names, so every projected expression must attribute by
    exprId; the apply-vs-raw oracle catches any mis-attribution."""
    atom = st.sampled_from(
        [
            "a.o_totalprice",
            "b.o_totalprice",
            "a.o_orderkey",
            "b.o_orderkey",
            "(a.o_totalprice + b.o_totalprice)",
            "(b.o_totalprice - a.o_totalprice)",
            "(a.o_totalprice * 2)",
            "CAST(b.o_orderkey AS DOUBLE)",
        ]
    )
    return st.lists(atom, min_size=1, max_size=4)


@pytest.mark.slow
@settings(
    max_examples=hyp_examples(20),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    projs=_fuse_proj(),
    residual=st.sampled_from(
        [
            "a.o_orderkey <> b.o_orderkey",
            "b.o_totalprice > a.o_totalprice",
            "a.o_orderkey < b.o_orderkey",
        ]
    ),
    pred=_expr(1),
)
def test_apply_matches_raw_on_fused_projections(spark, fuzz_env, projs, residual, pred):
    """Fusion fuzz (r12): a Project of random both-side expressions over
    a colliding inner self-join must stay row-exact under apply() —
    whichever of {fusion + pair serving, fusion alone, opaque fallback}
    the planner lands on."""
    hs, src, _ = fuzz_env
    o = spark.read.parquet(src)
    a = o.filter(pred).alias("a")
    b = o.alias("b")
    cond = (F.col("a.o_custkey") == F.col("b.o_custkey")) & F.expr(residual)
    df = a.join(b, cond, "inner").select(
        *[F.expr(p).alias(f"c{i}") for i, p in enumerate(projs)]
    )
    out, used = hs._apply_with_info(df)
    key = lambda r: tuple((x is None, x) for x in r)
    raw = sorted(map(key, df.collect()))
    got = sorted(map(key, out.collect()))
    assert got == raw, (projs, residual, pred, used, len(raw), len(got))
