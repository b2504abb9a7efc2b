"""Regression tests for the round-1 self-review findings: each of these
was a real bug (unsound pruning, state-machine hole, nested-column
breakage, path-encoding miss) caught by review, fixed, and pinned here.
"""

import pytest
from pyspark.sql import functions as F

from hyperspace_spark import (
    BloomFilterSketch,
    CoveringIndexConfig,
    DataSkippingIndexConfig,
    Hyperspace,
    MinMaxSketch,
)
from hyperspace_spark.hyperspace import HyperspaceException

from tests.conftest import rows_equal, table


@pytest.fixture()
def hs(spark, tmp_path):
    return Hyperspace(spark, system_path=str(tmp_path / "idx"))


def test_bloom_probe_inside_or_is_not_applied(spark, hs, tmp_path):
    """Finding 1: `x = k OR y > v` must NOT prune via the x-bloom —
    files matching only the y-branch must survive."""
    d = str(tmp_path / "src")
    (
        table(spark, "lineitem")
        .repartitionByRange(8, "l_partkey")
        .write.parquet(d)
    )
    df = spark.read.parquet(d)
    hs.create_index(
        df,
        DataSkippingIndexConfig(
            "orx", [BloomFilterSketch(["l_partkey"], 0.01, 500), MinMaxSketch(["l_quantity"])]
        ),
    )
    key = df.select("l_partkey").first()[0]
    q = df.filter(
        (F.col("l_partkey") == key) | (F.col("l_quantity") >= 1)
    ).select("l_orderkey", "l_partkey")
    fast, used = hs._apply_with_info(q)
    # The OR collapses to TRUE (no sound conversion) -> no rewrite at all,
    # and crucially results stay EQUAL (before the fix rows vanished).
    assert rows_equal(q, fast)
    if used:  # if anything applied, it must not have pruned rows
        assert fast.count() == q.count()


def test_bloom_two_point_predicates_ored_sound(spark, hs, tmp_path):
    """Finding 1b: `x = 5 OR x = 7` must not AND two probes."""
    d = str(tmp_path / "src2")
    table(spark, "lineitem").repartitionByRange(8, "l_partkey").write.parquet(d)
    df = spark.read.parquet(d)
    hs.create_index(df, DataSkippingIndexConfig("or2", [BloomFilterSketch(["l_partkey"], 0.01, 500)]))
    keys = [r[0] for r in df.select("l_partkey").distinct().orderBy("l_partkey").take(2)]
    q = df.filter((F.col("l_partkey") == keys[0]) | (F.col("l_partkey") == keys[-1])).select(
        "l_orderkey", "l_partkey"
    )
    fast, _ = hs._apply_with_info(q)
    assert rows_equal(q, fast)


def test_bloom_on_timestamp_never_converts(spark, hs, tmp_path):
    """Finding 2: timestamp literals hash differently at build vs probe;
    the probe must decline (no pruning) instead of pruning everything."""
    d = str(tmp_path / "src3")
    table(spark, "lineitem").repartitionByRange(4, "l_shipdate").write.parquet(d)
    df = spark.read.parquet(d)
    hs.create_index(df, DataSkippingIndexConfig("bts", [BloomFilterSketch(["l_shipdate"], 0.01, 500)]))
    ts = df.select("l_shipdate").first()[0]
    q = df.filter(F.col("l_shipdate") == ts).select("l_orderkey")
    fast, used = hs._apply_with_info(q)
    assert used == []  # declined, not wrongly pruned
    assert rows_equal(q, fast)
    assert q.count() > 0


def test_refresh_deleted_index_rejected(spark, hs, tmp_path):
    """Finding 4: refresh/optimize must not resurrect a DELETED index."""
    d = str(tmp_path / "src4")
    table(spark, "orders").repartition(2).write.parquet(d)
    hs.create_index(
        spark.read.parquet(d), CoveringIndexConfig("dz", ["o_custkey"], ["o_orderkey"])
    )
    hs.delete_index("dz")
    with pytest.raises(HyperspaceException):
        hs.refresh_index("dz", "full")
    with pytest.raises(HyperspaceException):
        hs.optimize_index("dz", "full")
    assert hs._log_mgr("dz", hs.conf()).get_latest_stable_log().state == "DELETED"


def test_nested_incremental_refresh(spark, hs, tmp_path):
    """Finding 3: incremental refresh of a nested-column covering index
    must flatten appended data like the build did."""
    d = str(tmp_path / "nested_mut")
    rows = [(i, (f"t{i % 3}", (f"l{i % 5}", i * 10))) for i in range(300)]
    df = spark.createDataFrame(
        rows, "c1 long, nested struct<id:string, leaf:struct<id:string, cnt:long>>"
    )
    df.repartition(3).write.parquet(d)
    hs.create_index(
        spark.read.parquet(d),
        CoveringIndexConfig("nmut", ["nested.leaf.cnt"], ["c1", "nested.id"]),
    )
    extra = [(1000 + i, (f"t{i}", (f"l{i}", 99999 + i))) for i in range(50)]
    spark.createDataFrame(
        extra, "c1 long, nested struct<id:string, leaf:struct<id:string, cnt:long>>"
    ).coalesce(1).write.mode("append").parquet(d)
    hs.refresh_index("nmut", "incremental")
    src = spark.read.parquet(d)
    q = src.filter(F.col("nested.leaf.cnt") == 99999).select("c1", "nested.id")
    fast, used = hs._apply_with_info(q)
    assert used == ["nmut"], hs.why_not(q)
    assert rows_equal(q, fast)
    assert fast.count() == 1  # the appended row is served from the index


def test_zorder_nested_now_supported(spark, hs, tmp_path):
    """Finding 5 (r1): nested z-order used to build an unusable index and
    was rejected; round 2 flattens nested paths like covering indexes do,
    so the build succeeds AND the index applies."""
    from hyperspace_spark import ZOrderCoveringIndexConfig

    d = str(tmp_path / "nested_z")
    rows = [(i, (i * 2,)) for i in range(200)]
    df = spark.createDataFrame(rows, "c1 long, n struct<v:long>")
    df.repartition(2).write.parquet(d)
    src = spark.read.parquet(d)
    hs.create_index(src, ZOrderCoveringIndexConfig("zn", ["n.v"], ["c1"]))
    try:
        q = src.filter(F.col("n.v") < 100).select("c1", "n.v")
        fast, used = hs._apply_with_info(q)
        assert used == ["zn"], hs.why_not(q)
        assert sorted(map(tuple, q.collect())) == sorted(map(tuple, fast.collect()))
    finally:
        hs.delete_index("zn")
        hs.vacuum_index("zn")


def test_space_in_path_lineage_and_skipping(spark, hs, tmp_path):
    """Finding 7: files under directories with spaces must still match
    the lineage/id joins (percent-encoding alignment)."""
    d = str(tmp_path / "my data dir")
    table(spark, "orders").repartition(3).write.parquet(d)
    df = spark.read.parquet(d)
    hs.create_index(df, CoveringIndexConfig("sp", ["o_custkey"], ["o_orderkey"]))
    entry = hs._log_mgr("sp", hs.conf()).get_latest_stable_log()
    # Lineage ids must be populated (no NULL-join misses): every index row
    # carries a valid _data_file_id.
    idx = spark.read.parquet(*entry.index_data_dirs)
    assert idx.filter("_data_file_id IS NULL").count() == 0
    hs.create_index(df, DataSkippingIndexConfig("sp_skip", [MinMaxSketch(["o_custkey"])]))
    e2 = hs._log_mgr("sp_skip", hs.conf()).get_latest_stable_log()
    idx2 = spark.read.parquet(*e2.index_data_dirs)
    # One sketch row per source file: the encoded-path join dropped none.
    assert idx2.count() == len(e2.source_files)


def test_same_named_join_keys_safe_fallback(spark, hs, tmp_path):
    """Finding 6 (updated for r7 exprId attribution): df1.join(df2,
    'id')-style shared names must never produce a broken replay.
    Originally that meant an explicit bail; the parser now resolves the
    key pair by exprId and dedups the inner join's right copy, so the
    query ACCELERATES — with identical columns and values.  An OUTER
    join on the shared name (right copy not value-equal) must still
    fall back cleanly."""
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    table(spark, "orders").select(F.col("o_orderkey").alias("id"), "o_custkey").write.parquet(d1)
    table(spark, "lineitem").select(F.col("l_orderkey").alias("id"), "l_quantity").write.parquet(d2)
    a, b = spark.read.parquet(d1), spark.read.parquet(d2)
    hs.create_index(a, CoveringIndexConfig("aid", ["id"], ["o_custkey"]))
    q = a.join(b, "id").select("id", "o_custkey", "l_quantity")
    fast, used = hs._apply_with_info(q)
    assert used == ["aid"], hs.why_not(q)
    assert fast.columns == q.columns
    assert rows_equal(q, fast)
    # outer join: right key copy can be NULL -> dedup unsound -> fall back
    q_outer = a.join(b, a.id == b.id, "left_outer")
    fast2, used2 = hs._apply_with_info(q_outer)
    assert fast2.columns == q_outer.columns
    assert rows_equal(q_outer, fast2)


def test_partitioned_incremental_refresh(spark, hs, tmp_path):
    """Finding 8: appended files of a partitioned source need basePath to
    keep partition columns during incremental refresh."""
    d = str(tmp_path / "part_src")
    o = table(spark, "orders").withColumn("o_year", F.year("o_orderdate"))
    o.filter("o_year <= 1997").write.partitionBy("o_year").parquet(d)
    df = spark.read.parquet(d)
    hs.create_index(df, CoveringIndexConfig("pinc", ["o_custkey"], ["o_orderkey", "o_year"]))
    o.filter("o_year = 1998").write.mode("append").partitionBy("o_year").parquet(d)
    hs.refresh_index("pinc", "incremental")
    src = spark.read.parquet(d)
    q = src.filter("o_custkey = 42").select("o_orderkey", "o_year")
    fast, used = hs._apply_with_info(q)
    assert used == ["pinc"], hs.why_not(q)
    assert rows_equal(q, fast)


def test_bucketed_table_registration_is_location_keyed(spark, tmp_path):
    """Round-3 finding: the query-time catalog registration used the bare
    build-time table name (hs_<index>_v<version>), which is session-global
    while index names repeat across Hyperspace system paths — a workspace
    could silently serve ANOTHER workspace's same-named index data
    (observed as wrong join results across scale-factor workspaces in one
    session).  Registration must be keyed by data location."""
    from hyperspace_spark.indexes.covering import ensure_bucketed_table

    srcs = []
    for i, n in enumerate((100, 50)):
        d = str(tmp_path / f"src{i}")
        spark.range(0, n).selectExpr("id AS k", f"id * {i + 2} AS v").write.parquet(d)
        srcs.append(d)

    entries = []
    for i, d in enumerate(srcs):
        hs_i = Hyperspace(spark, system_path=str(tmp_path / f"sys{i}"))
        hs_i.create_index(
            spark.read.parquet(d), CoveringIndexConfig("dup_idx", ["k"], ["v"])
        )
        entries.append(hs_i._log_mgr("dup_idx", hs_i.conf()).get_latest_stable_log())

    t0 = ensure_bucketed_table(spark, entries[0])
    t1 = ensure_bucketed_table(spark, entries[1])
    assert t0 != t1, "same catalog name for two different index locations"
    assert spark.table(t0).count() == 100
    assert spark.table(t1).count() == 50


def test_concurrent_apply_threads_no_view_collision(spark, tmp_path):
    """Concurrent apply() calls from multiple threads must never serve
    each other's scan data: the replay temp-view counter was a
    non-atomic list increment, so two threads could mint the same
    __hs_scan_N name and one query silently read the other's table."""
    import threading

    from pyspark.sql import functions as F

    from hyperspace_spark import CoveringIndexConfig, Hyperspace

    hs = Hyperspace(spark, system_path=str(tmp_path / "idx"))
    src1, src2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    spark.range(500).selectExpr("id AS k", "id*2 AS v").write.parquet(src1)
    spark.range(500).selectExpr("id AS k", "id*3 AS w").write.parquet(src2)
    d1, d2 = spark.read.parquet(src1), spark.read.parquet(src2)
    hs.create_index(d1, CoveringIndexConfig("cc1", ["k"], ["v"]))
    hs.create_index(d2, CoveringIndexConfig("cc2", ["k"], ["w"]))
    spark.conf.set("spark.hyperspace.apply.cacheTtlSeconds", "0")
    errors = []

    def worker(df, col, mult):
        try:
            for i in range(10):
                key = (i * 37) % 500
                rows = hs.apply(
                    df.filter(F.col("k") == key).select("k", col)
                ).collect()
                assert len(rows) == 1 and rows[0][1] == key * mult, (key, rows)
        except Exception as e:  # pragma: no cover - failure reporting
            errors.append(e)

    threads = [
        threading.Thread(target=worker, args=(d1, "v", 2)),
        threading.Thread(target=worker, args=(d2, "w", 3)),
        threading.Thread(target=worker, args=(d1, "v", 2)),
        threading.Thread(target=worker, args=(d2, "w", 3)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    spark.conf.unset("spark.hyperspace.apply.cacheTtlSeconds")
    assert not errors, errors[:3]
