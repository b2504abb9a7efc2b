"""FilterOrIndexRule: disjunctive filters served by a UNION of
bucket-pruned covering-index scans (index-OR / bitmap-union analogue —
extension beyond the reference, whose FilterIndexRule.scala:62-103
handles an OR only as one full index scan).

Soundness corners under test: overlap dedup (a row matching several
disjuncts surfaces once), three-valued-logic guards (NULL disjuncts),
decline on unprunable branches / stale indexes, and per-branch bucket
pruning in the executed plan.
"""

import pytest
from pyspark.sql import functions as F

from hyperspace_spark import CoveringIndexConfig, Hyperspace

from tests.conftest import rows_equal, table


@pytest.fixture(scope="module")
def env(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("hs_or"))
    src = f"{root}/orders"
    table(spark, "orders").repartition(4).write.parquet(src)
    o = spark.read.parquet(src)
    hs = Hyperspace(spark, system_path=f"{root}/idx")
    hs.create_index(
        o,
        CoveringIndexConfig(
            "or_cust", ["o_custkey"], ["o_orderkey", "o_totalprice"], num_buckets=8
        ),
    )
    hs.create_index(
        o,
        CoveringIndexConfig(
            "or_okey", ["o_orderkey"], ["o_custkey", "o_totalprice"], num_buckets=8
        ),
    )
    return hs, src


def _overlap_orderkey(spark, src):
    """An orderkey belonging to customer 42 — the row both disjuncts hit."""
    rows = (
        spark.read.parquet(src)
        .filter("o_custkey = 42")
        .select("o_orderkey")
        .limit(1)
        .collect()
    )
    return rows[0][0] if rows else None


def test_or_union_both_indexes_and_dedup(spark, env):
    hs, src = env
    okey = _overlap_orderkey(spark, src)
    assert okey is not None
    o = spark.read.parquet(src)
    df = o.filter(f"o_custkey = 42 OR o_orderkey = {okey}").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    out, used = hs._apply_with_info(df)
    assert {"or_cust", "or_okey"}.issubset(set(used)), hs.why_not(df)
    assert rows_equal(df, out)  # overlap row exactly once
    # per-branch bucket pruning: each index contributes ~1 bucket file,
    # never its full file set
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "or_cust" in plan and "or_okey" in plan
    assert "orders/part" not in plan  # no source scan


def test_or_explain_verbose_branch_stats(spark, env):
    """explain(verbose=True) surfaces per-branch statistics: which index
    serves each disjunct and how many of its files the branch reads —
    so a user can see which disjunct prunes and which full-scans."""
    import re

    hs, src = env
    okey = _overlap_orderkey(spark, src)
    o = spark.read.parquet(src)
    df = o.filter(f"o_custkey = 42 OR o_orderkey = {okey}").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    txt = hs.explain(df, verbose=True)
    assert "Index-OR branches:" in txt
    lines = [l for l in txt.splitlines() if "index files" in l]
    assert len(lines) == 2, txt
    assert any("or_cust" in l for l in lines) and any("or_okey" in l for l in lines)
    for l in lines:
        m = re.search(r"reads (\d+)/(\d+) index files", l)
        assert m, l
        read, total = int(m.group(1)), int(m.group(2))
        # a point probe reads a strict subset of the index's buckets
        assert 0 < read < total, l
    # non-verbose explain stays unchanged (no branch section)
    assert "Index-OR branches:" not in hs.explain(df)


def test_or_union_in_probe_and_conjunct_branch(spark, env):
    hs, src = env
    o = spark.read.parquet(src)
    # IN pins branch 1 to several buckets; branch 2 is a CONJUNCTION whose
    # equality conjunct still pins the bucket while the range rides along.
    df = o.filter(
        "o_custkey IN (7, 19, 23) OR (o_orderkey = 1409 AND o_totalprice > 0)"
    ).select("o_orderkey", "o_custkey")
    out, used = hs._apply_with_info(df)
    assert {"or_cust", "or_okey"}.issubset(set(used)), hs.why_not(df)
    assert rows_equal(df, out)


def test_or_declines_on_unprunable_branch(spark, env):
    hs, src = env
    o = spark.read.parquet(src)
    # range disjunct on o_orderkey: that branch would full-scan its index,
    # so the OR rule declines; plain FilterIndexRule cannot bucket-prune
    # an OR either, but may still serve it as one full index scan.
    df = o.filter("o_custkey = 42 OR o_orderkey > 100").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    out, used = hs._apply_with_info(df)
    assert not {"or_cust", "or_okey"}.issubset(set(used)) or rows_equal(df, out)
    # whichever path won, results must match
    assert rows_equal(df, out)


def test_or_null_disjunct_rows_survive(spark, env):
    """Guard semantics: `NOT coalesce(d1, false)` must keep rows where d1
    is NULL but d2 is TRUE (plain NOT d1 would drop them)."""
    hs, src = env
    root = src.rsplit("/", 1)[0]
    src2 = f"{root}/orders_nulls"
    o = spark.read.parquet(src)
    o.withColumn(
        "o_custkey", F.when(F.col("o_orderkey") % 3 == 0, None).otherwise(F.col("o_custkey"))
    ).write.mode("overwrite").parquet(src2)
    on = spark.read.parquet(src2)
    hs.create_index(
        on,
        CoveringIndexConfig("orn_cust", ["o_custkey"], ["o_orderkey", "o_totalprice"], num_buckets=8),
    )
    hs.create_index(
        on,
        CoveringIndexConfig("orn_okey", ["o_orderkey"], ["o_custkey", "o_totalprice"], num_buckets=8),
    )
    # pick an orderkey divisible by 3 -> that row has o_custkey NULL, so
    # disjunct 1 evaluates NULL and only the guard path can keep it.
    okey = on.filter("o_custkey IS NULL").select("o_orderkey").limit(1).collect()[0][0]
    df = on.filter(f"o_custkey = 42 OR o_orderkey = {okey}").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    out, used = hs._apply_with_info(df)
    assert {"orn_cust", "orn_okey"}.issubset(set(used)), hs.why_not(df)
    assert rows_equal(df, out)
    # the NULL-custkey row is present
    assert out.filter(f"o_orderkey = {okey}").count() == 1


def test_or_declines_on_stale_index(spark, env):
    """Appended source files -> the rule declines (a per-branch hybrid
    union would scan the appended files once per branch)."""
    hs, src = env
    import glob
    import shutil

    root = src.rsplit("/", 1)[0]
    src3 = f"{root}/orders_stale"
    shutil.copytree(src, src3)
    o3 = spark.read.parquet(src3)
    hs.create_index(
        o3,
        CoveringIndexConfig("ors_cust", ["o_custkey"], ["o_orderkey", "o_totalprice"], num_buckets=8),
    )
    hs.create_index(
        o3,
        CoveringIndexConfig("ors_okey", ["o_orderkey"], ["o_custkey", "o_totalprice"], num_buckets=8),
    )
    # append a file AFTER both builds
    one = glob.glob(f"{src}/part-*.parquet")[0]
    shutil.copy(one, f"{src3}/appended_0.parquet")
    o3b = spark.read.parquet(src3)
    df = o3b.filter("o_custkey = 42 OR o_orderkey = 7").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    out, used = hs._apply_with_info(df)
    assert not {"ors_cust", "ors_okey"}.issubset(set(used))
    assert rows_equal(df, out)


def test_or_union_mixed_kind_zorder_range_branch(spark, env, tmp_path_factory):
    """r10b: a RANGE disjunct rides a z-order index's per-file stats
    pruning while the equality disjunct rides bucket pruning — the
    union composes index KINDS."""
    from pyspark.sql import functions as F

    from hyperspace_spark import Hyperspace, ZOrderCoveringIndexConfig, CoveringIndexConfig

    root = str(tmp_path_factory.mktemp("hs_or_z"))
    src = f"{root}/orders"
    table(spark, "orders").repartition(8).write.parquet(src)
    o = spark.read.parquet(src)
    hs = Hyperspace(spark, system_path=f"{root}/idx")
    hs.create_index(
        o,
        CoveringIndexConfig(
            "mz_cust", ["o_custkey"], ["o_orderkey", "o_totalprice"], num_buckets=8
        ),
    )
    # z-order on totalprice: range-clustered files -> tight min/max stats
    hs.create_index(
        o,
        ZOrderCoveringIndexConfig(
            "mz_price",
            ["o_totalprice"],
            ["o_orderkey", "o_custkey"],
            target_bytes_per_partition=16 * 1024,
        ),
    )
    hi = o.agg(F.expr("percentile(o_totalprice, 0.99)")).collect()[0][0]
    df = o.filter(f"o_custkey = 42 OR o_totalprice > {hi}").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    out, used = hs._apply_with_info(df)
    assert set(used) == {"mz_cust", "mz_price"}, hs.why_not(df)
    assert rows_equal(df, out)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "mz_cust" in plan and "mz_price" in plan
