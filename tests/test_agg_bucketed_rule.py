"""AggBucketedIndexRule (r7): an Aggregate whose grouping keys cover
the index's bucket columns reads the index through its bucketed catalog
table, so the aggregation inherits the hash distribution and the agg
Exchange disappears — the aggregation analog of JoinIndexRule's shuffle
elimination, and the selective form of the reference's
`spark.hyperspace.index.filterRule.useBucketSpec`
(HyperspaceConf.scala:80-87)."""

import pytest
from pyspark.sql import functions as F

from hyperspace_spark import CoveringIndexConfig, Hyperspace
from tests.conftest import rows_equal, table


@pytest.fixture(scope="module")
def hs(spark, tmp_path_factory):
    hs = Hyperspace(spark, system_path=str(tmp_path_factory.mktemp("hsidx_agg")))
    li = table(spark, "lineitem")
    hs.create_index(
        li,
        CoveringIndexConfig(
            "li_agg", ["l_orderkey"], ["l_quantity", "l_linenumber"]
        ),
    )
    return hs


def final_plan(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]


def test_groupby_on_bucket_key_is_exchange_free(spark, hs):
    li = table(spark, "lineitem")
    q = li.groupBy("l_orderkey").agg(
        F.round(F.sum("l_quantity"), 2).alias("qty"), F.count("*").alias("n")
    )
    fast, used = hs._apply_with_info(q)
    assert used == ["li_agg"], hs.why_not(q)
    plan = final_plan(fast)
    assert "Exchange" not in plan, plan
    assert "v__=" in plan  # reading the index data
    assert rows_equal(q, fast)


def test_groupby_superset_of_key_is_exchange_free(spark, hs):
    """HashPartitioning(bucket cols) satisfies ClusteredDistribution of
    any SUPERSET grouping — rows sharing (key, extra) also share key."""
    li = table(spark, "lineitem")
    q = li.groupBy("l_orderkey", "l_linenumber").agg(
        F.round(F.sum("l_quantity"), 2).alias("qty")
    )
    fast, used = hs._apply_with_info(q)
    assert used == ["li_agg"], hs.why_not(q)
    plan = final_plan(fast)
    assert "Exchange" not in plan, plan
    assert rows_equal(q, fast)


def test_groupby_with_filter_below_stays_correct(spark, hs):
    li = table(spark, "lineitem")
    q = (
        li.where(F.col("l_quantity") > 10)
        .groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("qty"))
    )
    fast, used = hs._apply_with_info(q)
    assert used == ["li_agg"], hs.why_not(q)
    assert "Exchange" not in final_plan(fast)
    assert rows_equal(q, fast)


def test_groupby_on_non_key_not_rewritten_by_agg_rule(spark, hs):
    """Grouping on a non-bucket column gains nothing from the bucketed
    read; whatever rewrite applies (or none), the agg exchange stays and
    results are equal."""
    li = table(spark, "lineitem")
    q = li.groupBy("l_linenumber").agg(
        F.round(F.sum("l_quantity"), 2).alias("qty")
    )
    fast, used = hs._apply_with_info(q)
    assert "Exchange" in final_plan(fast)
    assert rows_equal(q, fast)


def test_count_distinct_on_bucket_key_is_exchange_free(spark, hs):
    """count(DISTINCT x) GROUP BY key lowers to a two-level aggregate;
    the INNER aggregate groups by (key, x) ⊇ bucket key, so the rule
    rewrites it at its own subtree and the outer aggregate inherits the
    partitioning — the whole distinct-count is shuffle-free."""
    li = table(spark, "lineitem")
    q = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_quantity").alias("n_qty")
    )
    fast, used = hs._apply_with_info(q)
    assert used == ["li_agg"], hs.why_not(q)
    plan = final_plan(fast)
    assert "Exchange" not in plan, plan
    assert rows_equal(q, fast)


def test_dropduplicates_on_bucket_key_is_exchange_free(spark, hs):
    """dropDuplicates(subset) lowers to an Aggregate grouped on the
    subset — when the subset covers the bucket key the same rule
    applies and the dedup runs shuffle-free."""
    li = table(spark, "lineitem")
    q = li.select("l_orderkey", "l_quantity").dropDuplicates(
        ["l_orderkey", "l_quantity"]
    )
    fast, used = hs._apply_with_info(q)
    assert used == ["li_agg"], hs.why_not(q)
    plan = final_plan(fast)
    assert "Exchange" not in plan, plan
    assert rows_equal(q, fast)


def test_window_on_bucket_key_is_exchange_free(spark, hs):
    """row_number() OVER (PARTITION BY bucket_key ORDER BY ...) — the
    latest-record dedup pattern — inherits the index's bucketing too
    (WindowBucketedIndexRule): the window Exchange disappears, only the
    in-partition sort remains."""
    from pyspark.sql.window import Window

    li = table(spark, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy(
        F.desc("l_quantity"), "l_linenumber"
    )
    q = (
        li.select("l_orderkey", "l_quantity", "l_linenumber")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    fast, used = hs._apply_with_info(q)
    assert used == ["li_agg"], hs.why_not(q)
    plan = final_plan(fast)
    assert "Exchange" not in plan, plan
    assert "v__=" in plan
    assert rows_equal(q, fast)


def test_window_on_computed_partition_not_claimed(spark, hs):
    """A computed PARTITION BY expression (pmod of the key) can't be
    served by the bucketing — the rule must not fire on it; results
    stay equal under whatever rewrite (or none) applies."""
    from pyspark.sql.window import Window

    li = table(spark, "lineitem")
    w = Window.partitionBy((F.col("l_orderkey") % 7)).orderBy("l_linenumber")
    q = li.select("l_orderkey", "l_linenumber").withColumn(
        "rn", F.row_number().over(w)
    )
    fast, used = hs._apply_with_info(q)
    assert "Exchange" in final_plan(fast)
    assert rows_equal(q, fast)


def test_appended_files_defer_to_plain_rewrite(spark, tmp_path_factory):
    """Appended source files break the bucketing (hybrid union side is
    unbucketed), so the agg rule must NOT claim the scan; the plain
    covering rewrite with the hybrid union still answers correctly."""
    import shutil

    root = tmp_path_factory.mktemp("agg_append")
    src = str(root / "src")
    li = table(spark, "lineitem")
    li.where("l_orderkey % 2 = 0").write.parquet(src)
    hs = Hyperspace(spark, system_path=str(root / "idx"))
    df = spark.read.parquet(src)
    hs.create_index(
        df, CoveringIndexConfig("li_app", ["l_orderkey"], ["l_quantity"])
    )
    # append more files AFTER the index build
    li.where("l_orderkey % 2 = 1").write.mode("append").parquet(src)
    cur = spark.read.parquet(src)
    q = cur.groupBy("l_orderkey").agg(F.round(F.sum("l_quantity"), 2).alias("qty"))
    fast, used = hs._apply_with_info(q)
    assert rows_equal(q, fast)
    if used:
        # hybrid rewrite: both index data and the appended source files
        plan = final_plan(fast)
        assert "v__=" in plan
