"""Partitioned parquet sources: PartitionSketch pruning + covering index
over a partitioned layout (reference: PartitionSketch.scala:38-74;
sample_partitioned fixture in E2EHyperspaceRulesTest.scala:57).
"""

import pytest
from pyspark.sql import functions as F

from hyperspace_spark import (
    CoveringIndexConfig,
    DataSkippingIndexConfig,
    Hyperspace,
    MinMaxSketch,
    PartitionSketch,
)

from tests.conftest import rows_equal, table


@pytest.fixture(scope="module")
def part_src(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("orders_part"))
    (
        table(spark, "orders")
        .withColumn("o_year", F.year("o_orderdate"))
        .write.mode("overwrite")
        .partitionBy("o_year")
        .parquet(d)
    )
    return d


@pytest.fixture(scope="module")
def hs(spark, tmp_path_factory):
    return Hyperspace(spark, system_path=str(tmp_path_factory.mktemp("hsidx_part")))


def test_partition_sketch_prunes_partitions(spark, hs, part_src):
    df = spark.read.parquet(part_src)
    hs.create_index(
        df,
        DataSkippingIndexConfig(
            "part_skip", [PartitionSketch(["o_year"]), MinMaxSketch(["o_custkey"])]
        ),
    )
    q = df.filter("o_year = 1996 AND o_custkey < 100").select("o_orderkey", "o_custkey")
    fast, used = hs._apply_with_info(q)
    assert used == ["part_skip"], hs.why_not(q)
    assert len(fast.inputFiles()) < len(q.inputFiles())
    assert rows_equal(q, fast)


def test_covering_index_over_partitioned_source(spark, hs, part_src):
    df = spark.read.parquet(part_src)
    hs.create_index(
        df, CoveringIndexConfig("part_cov", ["o_custkey"], ["o_orderkey", "o_year"])
    )
    q = df.filter("o_custkey = 42").select("o_orderkey", "o_year")
    fast, used = hs._apply_with_info(q)
    assert "part_cov" in used, hs.why_not(q)
    assert rows_equal(q, fast)


def test_analyze_file_distribution(spark, hs, part_src):
    df = spark.read.parquet(part_src)
    report = hs.analyze_file_distribution(df, "o_custkey")
    assert "files analyzed" in report and "point lookup" in report
