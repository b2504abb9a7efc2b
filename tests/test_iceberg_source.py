"""Iceberg source: open-spec metadata/manifest reader (avro via the JVM's
bundled org.apache.avro), snapshots, time travel, index lifecycle.

Reference: index/sources/iceberg/IcebergRelation.scala:65-223 (snapshot
signature, file enumeration from manifests, time-travel selection)."""

import os

import pytest
from pyspark.sql import functions as F

from hyperspace_spark import CoveringIndexConfig, Hyperspace
from hyperspace_spark.sources.iceberg import (
    IcebergTable,
    read_iceberg,
    table_snapshot_id,
    write_iceberg,
)

from tests.conftest import rows_equal, table


@pytest.fixture()
def itab(spark, tmp_path):
    root = str(tmp_path / "orders_iceberg")
    o = table(spark, "orders")
    s0 = write_iceberg(o.filter("o_orderkey % 19 != 0"), root)  # ~95%
    s1 = write_iceberg(o.filter("o_orderkey % 19 = 0"), root)   # +5%
    assert s0 != s1
    return root, s0, s1


def test_snapshot_and_read_roundtrip(spark, itab):
    root, s0, s1 = itab
    o = table(spark, "orders")
    got = read_iceberg(spark, root)
    assert got.count() == o.count()
    assert table_snapshot_id(root) == s1
    assert sorted(map(tuple, got.select("o_orderkey", "o_custkey").collect())) == sorted(
        map(tuple, o.select("o_orderkey", "o_custkey").collect())
    )


def test_time_travel_reads_pinned_snapshot(spark, itab):
    root, s0, _ = itab
    o = table(spark, "orders")
    assert read_iceberg(spark, root, snapshot_id=s0).count() == o.filter(
        "o_orderkey % 19 != 0"
    ).count()


def test_overwrite_replaces_content(spark, tmp_path):
    root = str(tmp_path / "ow_iceberg")
    o = table(spark, "orders")
    write_iceberg(o.filter("o_orderkey % 2 = 0"), root)
    write_iceberg(o.filter("o_orderkey % 2 = 1"), root, mode="overwrite")
    got = read_iceberg(spark, root)
    assert got.filter("o_orderkey % 2 = 0").count() == 0
    assert got.count() == o.filter("o_orderkey % 2 = 1").count()


def test_schema_comes_from_metadata_not_footers(spark, itab):
    root, _, _ = itab
    snap = IcebergTable(root).snapshot()
    assert snap.schema_json, "metadata schema should map to a Spark schema"
    got = read_iceberg(spark, root)
    assert got.schema["o_orderkey"].dataType.simpleString() == "bigint"


def test_index_on_iceberg_snapshot_signature(spark, itab, tmp_path):
    root, _, s1 = itab
    hs = Hyperspace(spark, system_path=str(tmp_path / "idx"))
    hs.create_index(
        read_iceberg(spark, root),
        CoveringIndexConfig("i_cov", ["o_custkey"], ["o_orderkey", "o_totalprice"]),
    )
    q = read_iceberg(spark, root).filter(F.col("o_custkey") == 14).select(
        "o_orderkey", "o_totalprice"
    )
    fast, used = hs._apply_with_info(q)
    assert used == ["i_cov"], hs.why_not(q)
    assert rows_equal(q, fast)
    entry = next(e for e in hs._active_entries(hs.conf()) if e.name == "i_cov")
    import hashlib

    assert entry.signature == hashlib.md5(f"iceberg:{root}@{s1}".encode()).hexdigest()


def test_index_survives_iceberg_append_hybrid(spark, itab, tmp_path):
    root, _, _ = itab
    hs = Hyperspace(spark, system_path=str(tmp_path / "idx"))
    hs.create_index(
        read_iceberg(spark, root),
        CoveringIndexConfig("i_app", ["o_custkey"], ["o_orderkey"]),
    )
    o = table(spark, "orders")
    write_iceberg(o.filter("o_orderkey % 97 = 0"), root)  # new snapshot
    q = read_iceberg(spark, root).filter("o_custkey < 100").select("o_orderkey", "o_custkey")
    fast, used = hs._apply_with_info(q)
    assert used == ["i_app"], hs.why_not(q)
    assert rows_equal(q, fast)


def test_index_serves_time_travel_query(spark, itab, tmp_path):
    """Index at the newest snapshot serves a time-traveled query via
    hybrid-delete compensation (lineage anti-filter)."""
    root, s0, _ = itab
    hs = Hyperspace(spark, system_path=str(tmp_path / "idx"))
    hs.create_index(
        read_iceberg(spark, root),
        CoveringIndexConfig("i_tt", ["o_custkey"], ["o_orderkey"]),
    )
    q = read_iceberg(spark, root, snapshot_id=s0).filter("o_custkey < 200").select(
        "o_orderkey", "o_custkey"
    )
    fast, used = hs._apply_with_info(q)
    assert used == ["i_tt"], hs.why_not(q)
    assert rows_equal(q, fast)


def test_refresh_full_reads_current_snapshot(spark, itab, tmp_path):
    root, _, _ = itab
    hs = Hyperspace(spark, system_path=str(tmp_path / "idx"))
    hs.create_index(
        read_iceberg(spark, root),
        CoveringIndexConfig("i_rf", ["o_custkey"], ["o_orderkey"]),
    )
    o = table(spark, "orders")
    new_sid = write_iceberg(o.filter("o_orderkey % 50 = 0"), root)
    hs.refresh_index("i_rf", "full")
    q = read_iceberg(spark, root).filter("o_custkey < 500").select("o_orderkey", "o_custkey")
    fast, used = hs._apply_with_info(q)
    assert used == ["i_rf"], hs.why_not(q)
    assert rows_equal(q, fast)
    entry = next(e for e in hs._active_entries(hs.conf()) if e.name == "i_rf")
    import hashlib

    assert entry.signature == hashlib.md5(f"iceberg:{root}@{new_sid}".encode()).hexdigest()


def test_partitioned_table_roundtrip(spark, tmp_path):
    """Identity-partitioned tables: hive-layout data dirs, partition spec
    recorded, partition-column types from the metadata schema."""
    root = str(tmp_path / "part_iceberg")
    o = table(spark, "orders").select("o_orderkey", "o_custkey", "o_orderpriority")
    write_iceberg(o, root, partition_by=["o_orderpriority"])
    snap = IcebergTable(root).snapshot()
    assert snap.partition_columns == ["o_orderpriority"]
    got = read_iceberg(spark, root)
    assert got.schema["o_orderpriority"].dataType.simpleString() == "string"
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, o.collect()))
    # Partition append keeps layout + reads whole
    write_iceberg(
        o.filter("o_orderkey % 97 = 0"), root, partition_by=["o_orderpriority"]
    )
    assert read_iceberg(spark, root).count() == o.count() + o.filter("o_orderkey % 97 = 0").count()


def test_closest_index_version_for_time_travel(spark, tmp_path):
    """Closest-version selection over Iceberg snapshots (shared code path
    with Delta: planner/candidates.py _closest_history_candidate) — a
    snapshot-pinned query beyond the hybrid thresholds uses a RETAINED
    older index version that matches it exactly."""
    root = str(tmp_path / "ci_iceberg")
    o = table(spark, "orders")
    s0 = write_iceberg(o.filter("o_orderkey % 3 = 0"), root)   # ~1/3
    hs = Hyperspace(spark, system_path=str(tmp_path / "idx"))
    hs.create_index(
        read_iceberg(spark, root),
        CoveringIndexConfig("i_ci", ["o_custkey"], ["o_orderkey"]),
    )
    s1 = write_iceberg(o.filter("o_orderkey % 3 != 0"), root)  # triples it
    assert s1 != s0
    hs.refresh_index("i_ci", "full")

    q0 = read_iceberg(spark, root, snapshot_id=s0).filter("o_custkey < 300").select(
        "o_orderkey", "o_custkey"
    )
    fast, used = hs._apply_with_info(q0)
    assert used == ["i_ci"], hs.why_not(q0)
    assert rows_equal(q0, fast)

    q1 = read_iceberg(spark, root).filter("o_custkey < 300").select("o_orderkey", "o_custkey")
    fast1, used1 = hs._apply_with_info(q1)
    assert used1 == ["i_ci"], hs.why_not(q1)
    assert rows_equal(q1, fast1)
