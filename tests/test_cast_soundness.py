"""Round-2 soundness regressions (ADVICE r1).

1. Cast-wrapped predicates must not be unwrapped into sketch probes unless
   the cast is an exact, order-preserving widening — CAST(ts AS DATE) = d
   translated as ts = d prunes files whose rows match only via truncation.
2. ValueList sketches must survive all-NULL files (empty value arrays)
   under Spark 4 ANSI mode.
3. PartitionSketch on a non-partition column must be rejected at create.
4. The apply-cache TTL must be configurable to 0 (re-plan every query) so
   externally appended files are never missed.
5. A refresh failure stranding the log in REFRESHING must self-heal on the
   next streaming maintenance batch.
"""

import pytest
from pyspark.sql import functions as F

from hyperspace_spark import (
    DataSkippingIndexConfig,
    Hyperspace,
    MinMaxSketch,
    ValueListSketch,
)
from hyperspace_spark.indexes.sketches import PartitionSketch

from tests.conftest import rows_equal, table


@pytest.fixture(scope="module")
def ts_src(spark, tmp_path_factory):
    """Files range-clustered by a timestamp column whose values fall at
    10:00 — so a file's per-file min is strictly after midnight and a
    naive cast-stripping MinMax probe would prune matching files."""
    d = str(tmp_path_factory.mktemp("ts_src"))
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"),
        F.expr("timestamp_seconds(36000 + id * 86400)").alias("ts"),  # day i at 10:00 UTC
        (F.col("id") % 7).alias("v"),
    )
    df.repartitionByRange(8, "ts").write.mode("overwrite").parquet(d)
    return d


def test_truncating_cast_not_converted(spark, ts_src, tmp_path_factory):
    hs = Hyperspace(spark, system_path=str(tmp_path_factory.mktemp("hs_cast")))
    df = spark.read.parquet(ts_src)
    hs.create_index(df, DataSkippingIndexConfig("ts_skip", [MinMaxSketch(["ts"])]))
    # Row with k=500 has ts = day 500 at 10:00; its date is 1971-05-16 etc.
    target_date = df.filter("k = 500").select(F.col("ts").cast("date")).first()[0]
    q = df.filter(F.col("ts").cast("date") == F.lit(target_date)).select("k", "v")
    assert q.count() == 1  # sanity: exactly one row matches via truncation
    fast, used = hs._apply_with_info(q)
    # Whatever the planner decides, the rows must be right.
    assert rows_equal(q, fast)
    assert fast.count() == 1


def test_safe_widening_cast_still_prunes(spark, tmp_path_factory):
    hs = Hyperspace(spark, system_path=str(tmp_path_factory.mktemp("hs_widen")))
    d = str(tmp_path_factory.mktemp("int_src"))
    df0 = spark.range(0, 10000).select(F.col("id").cast("int").alias("k"), (F.col("id") % 9).alias("v"))
    df0.repartitionByRange(8, "k").write.mode("overwrite").parquet(d)
    df = spark.read.parquet(d)
    hs.create_index(df, DataSkippingIndexConfig("int_skip", [MinMaxSketch(["k"])]))
    # int column compared against a BIGINT literal -> Cast(k as bigint) < 100L
    q = df.filter(F.col("k").cast("long") < F.lit(100).cast("long")).select("k", "v")
    fast, used = hs._apply_with_info(q)
    assert used == ["int_skip"], hs.why_not(q)
    assert len(fast.inputFiles()) < len(q.inputFiles())
    assert rows_equal(q, fast)


def test_valuelist_all_null_file(spark, tmp_path_factory):
    hs = Hyperspace(spark, system_path=str(tmp_path_factory.mktemp("hs_vlnull")))
    d = str(tmp_path_factory.mktemp("null_src"))
    # file 0: all-null flag column; file 1: real values.
    spark.createDataFrame([(i, None) for i in range(100)], "k int, flag string").coalesce(
        1
    ).write.mode("overwrite").parquet(d)
    spark.createDataFrame(
        [(i, "A" if i % 2 else "B") for i in range(100, 200)], "k int, flag string"
    ).coalesce(1).write.mode("append").parquet(d)
    df = spark.read.parquet(d)
    hs.create_index(df, DataSkippingIndexConfig("vl_skip", [ValueListSketch(["flag"])]))
    q = df.filter(F.col("flag") > "A").select("k", "flag")
    fast, used = hs._apply_with_info(q)
    assert used == ["vl_skip"], hs.why_not(q)
    # the all-null file must be prunable without throwing under ANSI
    assert len(fast.inputFiles()) < len(q.inputFiles())
    assert rows_equal(q, fast)


def test_partition_sketch_rejected_on_regular_column(spark, tmp_path_factory):
    from hyperspace_spark.hyperspace import HyperspaceException

    hs = Hyperspace(spark, system_path=str(tmp_path_factory.mktemp("hs_psk")))
    d = str(tmp_path_factory.mktemp("plain_src"))
    table(spark, "orders").write.mode("overwrite").parquet(d)
    df = spark.read.parquet(d)
    with pytest.raises(HyperspaceException, match="PartitionSketch"):
        hs.create_index(
            df, DataSkippingIndexConfig("bad_psk", [PartitionSketch(["o_orderstatus"])])
        )


def test_apply_cache_ttl_zero_sees_external_append(spark, tmp_path_factory):
    hs = Hyperspace(spark, system_path=str(tmp_path_factory.mktemp("hs_ttl")))
    d = str(tmp_path_factory.mktemp("ttl_src"))
    spark.createDataFrame([(i, i % 5) for i in range(1000)], "k int, v int").write.mode(
        "overwrite"
    ).parquet(d)
    df = spark.read.parquet(d)
    from hyperspace_spark import CoveringIndexConfig

    hs.create_index(df, CoveringIndexConfig("ttl_idx", ["v"], ["k"]))
    spark.conf.set("spark.hyperspace.apply.cacheTtlSeconds", "0")
    try:
        q = spark.read.parquet(d).filter(F.col("v") == 3).select("k")
        fast1, used1 = hs._apply_with_info(q)
        n1 = fast1.count()
        # external append: no lifecycle op, no epoch bump
        spark.createDataFrame([(9999, 3)], "k int, v int").write.mode("append").parquet(d)
        q2 = spark.read.parquet(d).filter(F.col("v") == 3).select("k")
        fast2, used2 = hs._apply_with_info(q2)
        assert fast2.count() == n1 + 1  # hybrid scan must compensate, not a stale cache hit
    finally:
        spark.conf.unset("spark.hyperspace.apply.cacheTtlSeconds")


def test_stuck_refreshing_self_heals(spark, tmp_path_factory):
    from hyperspace_spark import CoveringIndexConfig
    from hyperspace_spark.metadata.entry import States
    from hyperspace_spark.streaming.refresh import ensure_stable, make_maintenance_handler

    hs = Hyperspace(spark, system_path=str(tmp_path_factory.mktemp("hs_stuck")))
    d = str(tmp_path_factory.mktemp("stuck_src"))
    spark.createDataFrame([(i, i % 5) for i in range(500)], "k int, v int").write.mode(
        "overwrite"
    ).parquet(d)
    df = spark.read.parquet(d)
    hs.create_index(df, CoveringIndexConfig("stuck_idx", ["v"], ["k"]))

    # Simulate a crash mid-refresh: latest log entry is transient REFRESHING.
    mgr = hs._log_mgr("stuck_idx", hs.conf())
    latest = mgr.get_latest_log()
    stuck = latest.with_state(States.REFRESHING, mgr.get_latest_id() + 1)
    assert mgr.write_log(stuck.id, stuck)
    hs._invalidate_cache()

    # Direct refresh now fails (not ACTIVE) — the pre-fix permanent stall.
    with pytest.raises(Exception):
        hs.refresh_index("stuck_idx", "incremental")

    # One maintenance batch must roll back and refresh successfully.
    handle = make_maintenance_handler(hs, d, ["stuck_idx"], refresh_every=1)
    batch = spark.createDataFrame([(10_000 + i, i % 5) for i in range(50)], "k int, v int")
    handle(batch, 0)

    latest2 = mgr.get_latest_log()
    assert latest2.state == States.ACTIVE
    # and the refresh actually picked up the appended batch
    ensure_stable(hs, "stuck_idx")  # no-op now
    q = spark.read.parquet(d).filter(F.col("v") == 1).select("k")
    fast, used = hs._apply_with_info(q)
    assert used == ["stuck_idx"], hs.why_not(q)
    assert rows_equal(q, fast)
