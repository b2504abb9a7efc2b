"""Nested-column covering indexes: dotted paths flatten to __hs_nested
top-level columns; query-time rewrite rebuilds partial structs.

Mirrors the reference's SampleNestedData fixture + nested resolution
(ResolverUtils.scala:44-98, dev flag IndexConstants.scala:77-78).
"""

import pytest
from pyspark.sql import functions as F

from hyperspace_spark import CoveringIndexConfig, Hyperspace
from hyperspace_spark.hyperspace import HyperspaceException

from tests.conftest import rows_equal


@pytest.fixture(scope="module")
def nested_src(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("nested_src"))
    rows = [
        (i, f"guid{i:04d}", ("top" + str(i % 3), (f"leaf{i % 5}", i * 10)))
        for i in range(200)
    ]
    df = spark.createDataFrame(
        rows,
        "c1 long, c2 string, nested struct<id:string, leaf:struct<id:string, cnt:long>>",
    )
    df.repartition(4).write.mode("overwrite").parquet(d)
    return d


@pytest.fixture(scope="module")
def hs(spark, nested_src, tmp_path_factory):
    hs = Hyperspace(spark, system_path=str(tmp_path_factory.mktemp("hsidx_nested")))
    hs.create_index(
        spark.read.parquet(nested_src),
        CoveringIndexConfig("n_idx", ["nested.leaf.cnt"], ["c1", "nested.id"]),
    )
    return hs


def test_nested_filter_rewrite(spark, hs, nested_src):
    df = spark.read.parquet(nested_src)
    q = df.filter(F.col("nested.leaf.cnt") == 250).select("c1", "nested.leaf.cnt")
    fast, used = hs._apply_with_info(q)
    assert used == ["n_idx"], hs.why_not(q)
    assert all("n_idx" in f for f in fast.inputFiles())
    assert rows_equal(q, fast)


def test_nested_range_with_included_nested(spark, hs, nested_src):
    df = spark.read.parquet(nested_src)
    q = df.filter("nested.leaf.cnt < 300").selectExpr("c1", "nested.id AS nid")
    fast, used = hs._apply_with_info(q)
    assert used == ["n_idx"], hs.why_not(q)
    assert rows_equal(q, fast)


def test_nested_not_covered_no_rewrite(spark, hs, nested_src):
    df = spark.read.parquet(nested_src)
    # nested.leaf.id is not covered by the index.
    q = df.filter("nested.leaf.cnt < 300").selectExpr("c1", "nested.leaf.id AS lid")
    fast, used = hs._apply_with_info(q)
    assert not used
    assert rows_equal(q, fast)


def test_nested_missing_column_rejected(spark, hs, nested_src):
    df = spark.read.parquet(nested_src)
    with pytest.raises(HyperspaceException):
        hs.create_index(df, CoveringIndexConfig("bad", ["nested.nope.x"], ["c1"]))
