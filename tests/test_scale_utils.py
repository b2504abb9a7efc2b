"""Skew utilities: salted aggregation / join must equal their plain
counterparts while spreading hot keys over many reducers."""

import pytest
from pyspark.sql import functions as F

from hyperspace_spark.scale import salted_agg, salted_join

from tests.conftest import rows_equal, table


@pytest.fixture(scope="module")
def skewed(spark):
    """90% of rows share one key."""
    li = table(spark, "lineitem")
    return li.withColumn(
        "k", F.when(F.col("l_linenumber") <= 5, F.lit(0)).otherwise(F.col("l_orderkey"))
    )


def test_salted_agg_matches_plain(spark, skewed):
    plain = skewed.groupBy("k").agg(
        F.sum("l_quantity").alias("sq"),
        F.count("*").alias("c"),
        F.min("l_extendedprice").alias("mn"),
        F.max("l_extendedprice").alias("mx"),
        F.avg("l_discount").alias("av"),
    )
    salted = salted_agg(
        skewed,
        ["k"],
        {
            "sq": ("sum", "l_quantity"),
            "c": ("count", "*"),
            "mn": ("min", "l_extendedprice"),
            "mx": ("max", "l_extendedprice"),
            "av": ("avg", "l_discount"),
        },
        salt_buckets=8,
    )
    assert rows_equal(plain.select("k", "sq", "c", "mn", "mx", "av"), salted)


def test_salted_agg_rejects_non_decomposable(spark, skewed):
    with pytest.raises(ValueError):
        salted_agg(skewed, ["k"], {"d": ("countDistinct", "l_orderkey")})


def test_salted_join_matches_plain(spark):
    li = table(spark, "lineitem").select("l_orderkey", "l_quantity")
    o = table(spark, "orders").select("o_orderkey", "o_orderpriority")
    plain = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "l_quantity", "o_orderpriority"
    )
    salted = salted_join(li, o, "l_orderkey", "o_orderkey", salt_buckets=4).select(
        "l_orderkey", "l_quantity", "o_orderpriority"
    )
    assert rows_equal(plain, salted)


def test_salted_left_join_matches_plain(spark):
    li = table(spark, "lineitem").select("l_orderkey", "l_quantity").limit(1000)
    o = table(spark, "orders").filter("o_custkey < 100").select("o_orderkey", "o_custkey")
    plain = li.join(o, li.l_orderkey == o.o_orderkey, "left").select(
        "l_orderkey", "l_quantity", "o_custkey"
    )
    salted = salted_join(li, o, "l_orderkey", "o_orderkey", 4, "left").select(
        "l_orderkey", "l_quantity", "o_custkey"
    )
    assert rows_equal(plain, salted)
