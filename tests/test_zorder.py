"""Z-order covering index: build, rewrite on any indexed column, equality.

Mirrors the reference's E2EHyperspaceZOrderIndexTest.
"""

import pytest
from pyspark.sql import functions as F

from hyperspace_spark import Hyperspace, ZOrderCoveringIndexConfig

from tests.conftest import rows_equal, table


@pytest.fixture(scope="module")
def hs(spark, tmp_path_factory):
    hs = Hyperspace(spark, system_path=str(tmp_path_factory.mktemp("hsidx_z")))
    part = table(spark, "part")
    hs.create_index(
        part,
        ZOrderCoveringIndexConfig(
            "p_z", ["p_size", "p_retailprice"], ["p_partkey", "p_brand"]
        ),
    )
    ev = table(spark, "events")  # ts reads as long (nanosAsLong)
    hs.create_index(ev, ZOrderCoveringIndexConfig("ev_z", ["ts"], ["event_id", "value"]))
    return hs


def test_zorder_2d_range_filter(spark, hs):
    part = table(spark, "part")
    q = part.filter("p_size BETWEEN 10 AND 20 AND p_retailprice < 1200").select(
        "p_partkey", "p_size", "p_brand"
    )
    fast, used = hs._apply_with_info(q)
    assert used == ["p_z"], hs.why_not(q)
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "p_z" in plan and "part.parquet" not in plan
    assert rows_equal(q, fast)


def test_zorder_second_column_only(spark, hs):
    """Unlike the covering filter rule, ANY indexed column qualifies."""
    part = table(spark, "part")
    q = part.filter("p_retailprice > 1800").select("p_partkey", "p_retailprice")
    fast, used = hs._apply_with_info(q)
    assert used == ["p_z"], hs.why_not(q)
    assert rows_equal(q, fast)


def test_zorder_single_column_timestamp(spark, hs):
    ev = table(spark, "events")
    cutoff = 1706745600 * 10**9  # 2024-02-01 as epoch nanos
    q = ev.filter(F.col("ts") < cutoff).select("event_id", "value")
    fast, used = hs._apply_with_info(q)
    assert used == ["ev_z"], hs.why_not(q)
    assert rows_equal(q, fast)


def test_zorder_beats_covering_score(spark, hs, tmp_path_factory):
    """z-order score 60 > covering score 50 on the same predicate when
    both cover (reference scoring)."""
    from hyperspace_spark import CoveringIndexConfig

    part = table(spark, "part")
    hs.create_index(part, CoveringIndexConfig("p_c", ["p_size"], ["p_partkey", "p_brand", "p_retailprice"]))
    try:
        q = part.filter("p_size = 15").select("p_partkey", "p_brand")
        _, used = hs._apply_with_info(q)
        assert used == ["p_z"]
    finally:
        hs.delete_index("p_c")
        hs.vacuum_index("p_c")


def test_zaddr_udf_type_matrix(spark):
    """Z-address mapping over the reference's type matrix: ints, doubles
    (quantile path), strings, booleans (ZOrderField.scala:206-473)."""
    import pandas as pd

    from hyperspace_spark.indexes.zorder import make_zaddr_udf

    rows = [(i, float(i) / 7, f"s{i:03d}", i % 2 == 0) for i in range(100)]
    df = spark.createDataFrame(rows, "a int, b double, c string, d boolean")
    stats = {
        "a": {"dtype": "int", "min": 0, "max": 99, "quantiles": None},
        "b": {"dtype": "double", "min": 0.0, "max": 99 / 7, "quantiles": [i / 10 for i in range(1, 140)]},
        "c": {"dtype": "string", "min": "s000", "max": "s099", "quantiles": None},
        "d": {"dtype": "boolean", "min": False, "max": True, "quantiles": None},
    }
    udf = make_zaddr_udf(["a", "b", "c", "d"], stats, bits_per_col=8)
    out = df.withColumn("z", udf("a", "b", "c", "d")).collect()
    zs = [r.z for r in out]
    assert len(set(zs)) > 50  # distinct addresses, no degenerate mapping
    assert all(z >= 0 for z in zs)
    # Deterministic: same inputs -> identical addresses across evaluations
    # (z-order is NOT monotone in any single coordinate by design).
    again = {r.a: r.z for r in df.withColumn("z", udf("a", "b", "c", "d")).collect()}
    assert {r.a: r.z for r in out} == again
