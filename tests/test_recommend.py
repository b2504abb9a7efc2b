"""hs.recommend(df): the advisory loop's other half — whyNot explains a
miss, recommend proposes the config that would hit.  Round-trip tested:
create exactly what it suggests, re-plan, and the suggestion must fire."""

import pytest

from hyperspace_spark import Hyperspace

from tests.conftest import rows_equal, table


@pytest.fixture()
def hs(spark, tmp_path):
    return Hyperspace(spark, system_path=str(tmp_path / "idx"))


def test_recommend_filter_and_roundtrip(spark, hs, tmp_path):
    src = str(tmp_path / "orders")
    table(spark, "orders").repartition(4).write.parquet(src)
    o = spark.read.parquet(src)
    df = o.filter("o_custkey = 42").select("o_orderkey", "o_totalprice")
    recs = hs.recommend(df)
    assert len(recs) == 1
    cfg = recs[0]["config"]
    assert cfg.indexed_columns == ["o_custkey"]
    assert set(cfg.included_columns) == {"o_orderkey", "o_totalprice"}
    assert recs[0]["rule"] == "FilterIndexRule"
    # create exactly the suggestion -> the planner now uses it
    hs.create_index(o, cfg)
    out, used = hs._apply_with_info(df)
    assert used == [cfg.name], hs.why_not(df)
    assert rows_equal(df, out)
    # and the suggestion disappears (already covered)
    assert hs.recommend(df) == []


def test_recommend_range_and_join_and_agg(spark, hs, tmp_path):
    from pyspark.sql import functions as F

    src_o = str(tmp_path / "o")
    src_l = str(tmp_path / "l")
    table(spark, "orders").write.parquet(src_o)
    table(spark, "lineitem").write.parquet(src_l)
    o = spark.read.parquet(src_o)
    li = spark.read.parquet(src_l)
    # range filter -> first predicate column as the sort key
    r = hs.recommend(o.filter("o_totalprice > 1000.0").select("o_orderkey"))
    assert len(r) == 1 and r[0]["config"].indexed_columns == ["o_totalprice"]
    # equi-join -> a co-bucketed pair (one suggestion per side)
    j = li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderpriority").agg(
        F.count("*").alias("cnt")
    )
    recs = hs.recommend(j)
    by_rule = {}
    for rec in recs:
        by_rule.setdefault(rec["rule"], []).append(rec)
    assert len(by_rule.get("JoinIndexRule", [])) == 2
    keys = {tuple(rec["config"].indexed_columns) for rec in by_rule["JoinIndexRule"]}
    assert keys == {("l_orderkey",), ("o_orderkey",)}
    # group-by over a scan -> bucketed-agg suggestion
    a = o.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("s"))
    recs_a = hs.recommend(a)
    assert any(
        rec["rule"] == "AggBucketedIndexRule"
        and rec["config"].indexed_columns == ["o_custkey"]
        for rec in recs_a
    )


def test_recommend_never_raises_on_odd_plans(spark, hs):
    assert hs.recommend(spark.range(5)) == []
    assert hs.recommend(spark.createDataFrame([(1,)], ["x"])) == []


def test_recommend_partial_index_variant(spark, hs, tmp_path):
    """A literal equality conjunct alongside other predicates also
    yields a partial-index suggestion scoped to that conjunct — and
    creating it makes the planner serve the query."""
    from tests.conftest import rows_equal

    src = str(tmp_path / "o2")
    table(spark, "orders").repartition(4).write.parquet(src)
    o = spark.read.parquet(src)
    df = o.filter(
        "o_custkey BETWEEN 100 AND 200 AND o_orderpriority = '1-URGENT'"
    ).select("o_orderkey", "o_totalprice")
    recs = hs.recommend(df)
    partial = [r for r in recs if getattr(r["config"], "where", None)]
    assert partial, recs
    cfg = partial[0]["config"]
    assert "1-URGENT" in cfg.where
    assert cfg.indexed_columns == ["o_custkey"]
    hs.create_index(o, cfg)
    out, used = hs._apply_with_info(df)
    assert cfg.name in used, hs.why_not(df)
    assert rows_equal(df, out)
