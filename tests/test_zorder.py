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
    ev = table(spark, "events")  # ts is TIMESTAMP_NTZ (micros)
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
    cutoff = "2024-01-15 00:00:00"
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


def test_file_stats_pruning_correct(spark, tmp_path):
    """Per-file min/max stats prune z-index files driver-side; pruned
    reads stay row-identical to raw scans, including boundary literals."""
    src = str(tmp_path / "src")
    spark.range(0, 20000).select(
        (F.col("id") % 1000).alias("a"),
        (F.col("id") % 77).cast("double").alias("b"),
        F.col("id").alias("payload"),
    ).write.mode("overwrite").parquet(src)
    hs = Hyperspace(spark, system_path=str(tmp_path / "idx"))
    spark.conf.set(
        "spark.hyperspace.index.zorder.targetSourceBytesPerPartition", "16384"
    )
    try:
        hs.create_index(
            spark.read.parquet(src),
            ZOrderCoveringIndexConfig("zfs", ["a", "b"], ["payload"]),
        )
        entry = next(e for e in hs._active_entries(hs.conf()) if e.name == "zfs")
        assert entry.derived_properties.get("fileStats"), "stats missing"
        assert len(entry.content_files) > 3, "need multiple files to prune"
        for pred in (
            "a BETWEEN 10 AND 20 AND b < 30.0",
            "a = 500",
            "a >= 990",
            "a IN (1, 2, 3)",
            "a < 0",          # empty result, all files prunable
            "a <= 0",         # boundary: min itself
            "a >= 999",       # boundary: max itself
        ):
            q = spark.read.parquet(src).filter(pred).select("a", "b", "payload")
            fast, used = hs._apply_with_info(q)
            assert used == ["zfs"], (pred, hs.why_not(q))
            got = sorted(map(tuple, fast.collect()))
            want = sorted(map(tuple, q.collect()))
            assert got == want, pred
        # Evidence pruning actually happens for a selective range.
        q = spark.read.parquet(src).filter("a BETWEEN 10 AND 20").select("a", "payload")
        fast, _ = hs._apply_with_info(q)
        assert 0 < len(fast.inputFiles()) < len(entry.content_files)
    finally:
        spark.conf.unset("spark.hyperspace.index.zorder.targetSourceBytesPerPartition")


def test_file_stats_temporal_pruning(spark, tmp_path):
    """Timestamp literals compare correctly against ISO-stored stats."""
    import datetime

    src = str(tmp_path / "src")
    spark.range(0, 5000).select(
        F.to_timestamp(
            F.concat(F.lit("1995-01-"), F.lpad((F.col("id") % 28 + 1).cast("string"), 2, "0"))
        ).alias("ts"),
        F.col("id").alias("payload"),
    ).write.mode("overwrite").parquet(src)
    hs = Hyperspace(spark, system_path=str(tmp_path / "idx"))
    spark.conf.set(
        "spark.hyperspace.index.zorder.targetSourceBytesPerPartition", "8192"
    )
    try:
        hs.create_index(
            spark.read.parquet(src), ZOrderCoveringIndexConfig("zts", ["ts"], ["payload"])
        )
        q = (
            spark.read.parquet(src)
            .filter(F.col("ts") < "1995-01-05")
            .select("ts", "payload")
        )
        fast, used = hs._apply_with_info(q)
        assert used == ["zts"], hs.why_not(q)
        assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, q.collect()))
    finally:
        spark.conf.unset("spark.hyperspace.index.zorder.targetSourceBytesPerPartition")


def test_lit_python_typed_suffixes():
    """Catalyst typed-literal suffixes (5000.0D, 1.5F, 7L, 2S, 1Y, 9.00BD)
    must parse back to Python numbers — an unparsed '5000.0D' string made
    file-stats pruning silently keep every file (verify-drive find, r2)."""
    from hyperspace_spark.indexes.sketches import _lit_python
    from hyperspace_spark.planner.expr import Lit

    def lit(sql, dtype="double"):
        return Lit(sql=sql, references=frozenset(), dtype=dtype, is_null=False)

    assert _lit_python(lit("5000.0D")) == 5000.0
    assert _lit_python(lit("1.5F", "float")) == 1.5
    assert _lit_python(lit("7L", "long")) == 7
    assert _lit_python(lit("2S", "short")) == 2
    assert _lit_python(lit("1Y", "byte")) == 1
    assert _lit_python(lit("9.00BD", "decimal(4,2)")) == 9.0
    assert _lit_python(lit("'FOOD'", "string")) == "FOOD"
    assert _lit_python(lit("42", "int")) == 42


def test_file_stats_prune_double_range(spark, tmp_path):
    """A range predicate with a double literal (rendered 'xD' by Catalyst)
    actually prunes range-clustered index files, not just stays correct."""
    src = str(tmp_path / "src")
    spark.range(0, 20000).select(
        (F.col("id") % 10000).cast("double").alias("price"),
        F.col("id").alias("payload"),
    ).write.mode("overwrite").parquet(src)
    hs = Hyperspace(spark, system_path=str(tmp_path / "idx"))
    spark.conf.set(
        "spark.hyperspace.index.zorder.targetSourceBytesPerPartition", "16384"
    )
    try:
        hs.create_index(
            spark.read.parquet(src),
            ZOrderCoveringIndexConfig("zdp", ["price"], ["payload"]),
        )
        entry = next(e for e in hs._active_entries(hs.conf()) if e.name == "zdp")
        assert len(entry.content_files) > 2
        q = spark.read.parquet(src).filter(F.col("price") < 500.0).select("price", "payload")
        fast, used = hs._apply_with_info(q)
        assert used == ["zdp"], hs.why_not(q)
        assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, q.collect()))
        assert 0 < len(fast.inputFiles()) < len(entry.content_files), "double literal did not prune"
    finally:
        spark.conf.unset("spark.hyperspace.index.zorder.targetSourceBytesPerPartition")


def test_file_stats_huge_int_strict_inequality_sound():
    """Ints above 2^53 must compare exactly: float-folding lo==lit for
    `< lit+1` would prune a file whose min row matches (r2 review)."""
    from hyperspace_spark.indexes.zorder import _range_might_match

    big = 1 << 60
    assert _range_might_match("<", big, big + 10, big + 1) is True
    assert _range_might_match(">", big - 10, big, big - 1) is True
    assert _range_might_match("<", big + 1, big + 10, big) is False  # still prunes


def test_file_stats_decimal_column_roundtrip(spark, tmp_path):
    """Decimal min/max stats must json-serialize (type-tagged) and prune
    exactly (r2 review: Decimal crashed entry.to_json)."""
    import json as _json

    src = str(tmp_path / "src")
    spark.range(0, 20000).select(
        (F.col("id") % 10000).cast("decimal(12,2)").alias("price"),
        F.col("id").alias("payload"),
    ).write.parquet(src)
    hs = Hyperspace(spark, system_path=str(tmp_path / "idx"))
    spark.conf.set("spark.hyperspace.index.zorder.targetSourceBytesPerPartition", "16384")
    try:
        hs.create_index(
            spark.read.parquet(src),
            ZOrderCoveringIndexConfig("zdec", ["price"], ["payload"]),
        )
        entry = next(e for e in hs._active_entries(hs.conf()) if e.name == "zdec")
        _json.dumps(entry.derived_properties["fileStats"])  # must serialize
        q = spark.read.parquet(src).filter("price < 500").select("price", "payload")
        fast, used = hs._apply_with_info(q)
        assert used == ["zdec"], hs.why_not(q)
        assert sorted(map(tuple, q.collect())) == sorted(map(tuple, fast.collect()))
        assert 0 < len(fast.inputFiles()) < len(entry.content_files), "decimal stats did not prune"
    finally:
        spark.conf.unset("spark.hyperspace.index.zorder.targetSourceBytesPerPartition")


def test_zorder_incremental_append_local_cluster(spark, tmp_path):
    """r9: a bounded append refreshes a z-order index INCREMENTALLY —
    appended rows z-cluster locally into their own files (frozen
    build-time scaling), retained files hardlink through (same inode),
    fileStats gains the new files, and pruned queries stay row-exact
    over the grown corpus.  Deletes or drift beyond
    zorder.maxIncrementalRatio still re-cluster fully."""
    import os

    src = str(tmp_path / "src")
    spark.range(0, 20000).select(
        (F.col("id") % 1000).alias("a"),
        (F.col("id") % 77).cast("double").alias("b"),
        F.col("id").alias("payload"),
    ).write.mode("overwrite").parquet(src)
    hs = Hyperspace(spark, system_path=str(tmp_path / "idx"))
    spark.conf.set(
        "spark.hyperspace.index.zorder.targetSourceBytesPerPartition", "16384"
    )
    try:
        hs.create_index(
            spark.read.parquet(src),
            ZOrderCoveringIndexConfig("zinc", ["a", "b"], ["payload"]),
        )
        e0 = next(e for e in hs._active_entries(hs.conf()) if e.name == "zinc")
        base0 = e0.index_data_dirs[-1].rstrip("/")
        inodes0 = {
            f.path[len(base0) + 1 :]: os.stat(f.path).st_ino for f in e0.content_files
        }
        nstats0 = len(e0.derived_properties["fileStats"])

        # Bounded append (values inside AND outside the original ranges:
        # a in 0..1499 stretches past max(a)=999 — clipped z-cells are a
        # clustering, not correctness, concern).
        spark.range(20000, 24000).select(
            (F.col("id") % 1500).alias("a"),
            (F.col("id") % 77).cast("double").alias("b"),
            F.col("id").alias("payload"),
        ).coalesce(1).write.mode("append").parquet(src)
        # Small-file parquet overhead can push the BYTE ratio past the
        # 0.3 default even for a 20% row append — pin it for the test.
        spark.conf.set("spark.hyperspace.index.zorder.maxIncrementalRatio", "0.6")
        hs.refresh_index("zinc", "incremental")

        e1 = next(e for e in hs._active_entries(hs.conf()) if e.name == "zinc")
        assert e1.data_version > e0.data_version
        base1 = e1.index_data_dirs[-1].rstrip("/")
        after = {f.path[len(base1) + 1 :]: f.path for f in e1.content_files}
        for rel, ino in inodes0.items():
            assert rel in after and os.stat(after[rel]).st_ino == ino, rel
        assert len(after) > len(inodes0), "no appended z-files written"
        assert len(e1.derived_properties["fileStats"]) > nstats0

        # Row-exactness incl. the out-of-range region, and pruning still
        # engages for a selective range.
        for pred in ("a BETWEEN 10 AND 20", "a >= 1200", "a = 1400 AND b < 50.0"):
            q = spark.read.parquet(src).filter(pred).select("a", "b", "payload")
            fast, used = hs._apply_with_info(q)
            assert used == ["zinc"], (pred, hs.why_not(q))
            assert sorted(map(tuple, fast.collect())) == sorted(
                map(tuple, q.collect())
            ), pred
        q = spark.read.parquet(src).filter("a BETWEEN 10 AND 20").select("a", "payload")
        fast, _ = hs._apply_with_info(q)
        assert 0 < len(fast.inputFiles()) < len(e1.content_files)

        # Drift beyond the ratio: full re-cluster (fresh stats, no
        # hardlink guarantee) — and still exact.
        spark.range(24000, 80000).select(
            (F.col("id") % 1500).alias("a"),
            (F.col("id") % 77).cast("double").alias("b"),
            F.col("id").alias("payload"),
        ).write.mode("append").parquet(src)
        hs.refresh_index("zinc", "incremental")
        e2 = next(e for e in hs._active_entries(hs.conf()) if e.name == "zinc")
        assert e2.derived_properties["zorderStats"]["a"]["max"] == 1499
        q = spark.read.parquet(src).filter("a BETWEEN 10 AND 20").select("a", "payload")
        fast, used = hs._apply_with_info(q)
        assert used == ["zinc"]
        assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, q.collect()))
    finally:
        spark.conf.unset("spark.hyperspace.index.zorder.targetSourceBytesPerPartition")
        spark.conf.unset("spark.hyperspace.index.zorder.maxIncrementalRatio")


def test_zorder_delete_refresh_per_file_rewrite(spark, tmp_path):
    """r10: deletes refresh a z-order index WITHOUT re-clustering — the
    lineage anti-filter rewrites only the z-files holding deleted rows
    (survivors keep their z-sort), every other file hardlinks through
    (inode-asserted), fileStats swaps the affected files' rows for the
    rewritten files', and pruned queries stay row-exact.  A combined
    delete+append refresh composes both paths; zorderStats (the frozen
    scaling) never changes on this path."""
    import os

    src = str(tmp_path / "src")
    spark.range(0, 20000).select(
        (F.col("id") % 1000).alias("a"),
        (F.col("id") % 77).cast("double").alias("b"),
        F.col("id").alias("payload"),
    ).write.mode("overwrite").parquet(src)
    base_files = set(os.listdir(src))
    # a retractable slice in its own source file, in a DISJOINT key
    # region (a in 2000..2999) so its rows z-cluster into few files —
    # the locality that makes per-file delete rewrites bounded
    spark.range(100000, 103000).select(
        (F.lit(2000) + F.col("id") % 1000).alias("a"),
        (F.col("id") % 77).cast("double").alias("b"),
        F.col("id").alias("payload"),
    ).coalesce(1).write.mode("append").parquet(src)
    victim = set(os.listdir(src)) - base_files

    hs = Hyperspace(spark, system_path=str(tmp_path / "idx"))
    spark.conf.set(
        "spark.hyperspace.index.zorder.targetSourceBytesPerPartition", "16384"
    )
    try:
        hs.create_index(
            spark.read.parquet(src),
            ZOrderCoveringIndexConfig("zdel", ["a", "b"], ["payload"]),
        )
        e0 = next(e for e in hs._active_entries(hs.conf()) if e.name == "zdel")
        base0 = e0.index_data_dirs[-1].rstrip("/")
        zstats0 = e0.derived_properties["zorderStats"]
        stats0 = e0.derived_properties["fileStats"]
        inodes0 = {
            f.path[len(base0) + 1 :]: os.stat(f.path).st_ino for f in e0.content_files
        }
        # which index files hold the victim's rows (payload >= 100000)?
        idx0 = spark.read.parquet(base0)
        affected = {
            r[0].rsplit("/", 1)[-1]
            for r in idx0.filter("payload >= 100000")
            .select(F.input_file_name())
            .distinct()
            .collect()
        }
        assert affected and len(affected) < len(inodes0), affected

        for fn in victim:
            os.remove(os.path.join(src, fn))
        hs.refresh_index("zdel", "incremental")

        e1 = next(e for e in hs._active_entries(hs.conf()) if e.name == "zdel")
        assert e1.data_version > e0.data_version
        # frozen scaling: no re-cluster happened
        assert e1.derived_properties["zorderStats"] == zstats0
        base1 = e1.index_data_dirs[-1].rstrip("/")
        after = {f.path[len(base1) + 1 :]: f.path for f in e1.content_files}
        for rel, ino in inodes0.items():
            norm = rel.rsplit("/", 1)[-1]
            if norm in affected:
                assert rel not in after, f"affected file {rel} must not hardlink"
            else:
                assert rel in after and os.stat(after[rel]).st_ino == ino, rel
        # fileStats: affected basenames gone, rewritten files present
        stats1 = e1.derived_properties["fileStats"]
        assert not (affected & set(stats1))
        assert set(stats1) - set(stats0), "no rewritten-file stats recorded"

        # row-exact + no ghost rows, pruning still engages; a >= 2000
        # covers exactly the deleted region -> must come back EMPTY
        for pred in ("a BETWEEN 10 AND 20", "a >= 2000"):
            q = spark.read.parquet(src).filter(pred).select("a", "b", "payload")
            fast, used = hs._apply_with_info(q)
            assert used == ["zdel"], (pred, hs.why_not(q))
            assert sorted(map(tuple, fast.collect())) == sorted(
                map(tuple, q.collect())
            ), pred
        assert (
            spark.read.parquet(src).filter("a >= 2000").count() == 0
        ), "staging mishap"
        q = spark.read.parquet(src).filter("a BETWEEN 10 AND 20").select("a", "payload")
        fast, _ = hs._apply_with_info(q)
        assert 0 < len(fast.inputFiles()) < len(e1.content_files)

        # combined delete + bounded append in ONE refresh
        pre = set(os.listdir(src))
        spark.range(200000, 202000).select(
            (F.col("id") % 1000).alias("a"),
            (F.col("id") % 77).cast("double").alias("b"),
            F.col("id").alias("payload"),
        ).coalesce(1).write.mode("append").parquet(src)
        second_victim = set(os.listdir(src)) - pre
        hs.refresh_index("zdel", "incremental")  # absorb the append
        spark.conf.set("spark.hyperspace.index.zorder.maxIncrementalRatio", "0.6")
        spark.range(300000, 302000).select(
            (F.col("id") % 1000).alias("a"),
            (F.col("id") % 77).cast("double").alias("b"),
            F.col("id").alias("payload"),
        ).coalesce(1).write.mode("append").parquet(src)
        for fn in second_victim:
            os.remove(os.path.join(src, fn))
        hs.refresh_index("zdel", "incremental")
        e3 = next(e for e in hs._active_entries(hs.conf()) if e.name == "zdel")
        assert e3.derived_properties["zorderStats"] == zstats0
        q = (
            spark.read.parquet(src)
            .filter("a BETWEEN 0 AND 1000")
            .select("a", "payload")
        )
        fast, used = hs._apply_with_info(q)
        assert used == ["zdel"], hs.why_not(q)
        want = sorted(map(tuple, q.collect()))
        assert sorted(map(tuple, fast.collect())) == want
        # second victim's rows (payload 200000..201999) are gone; the
        # third append's rows (payload 300000..301999) landed
        pays = {p for _, p in want}
        assert not any(200000 <= p < 202000 for p in pays)
        assert any(300000 <= p < 302000 for p in pays)
    finally:
        spark.conf.unset("spark.hyperspace.index.zorder.targetSourceBytesPerPartition")
        spark.conf.unset("spark.hyperspace.index.zorder.maxIncrementalRatio")


def test_zorder_stale_query_append_and_delete_exact(spark, tmp_path):
    """A STALE z-order index (append + delete, NO refresh) answers
    exactly: appended files union in on the fly, deleted files' rows
    anti-filter by lineage — same hybrid discipline as covering."""
    import os

    src = str(tmp_path / "src")
    spark.range(0, 10000).select(
        (F.col("id") % 500).alias("a"), F.col("id").alias("p")
    ).write.mode("overwrite").parquet(src)
    before = set(os.listdir(src))
    spark.range(50000, 52000).select(
        (F.lit(1000) + F.col("id") % 500).alias("a"), F.col("id").alias("p")
    ).coalesce(1).write.mode("append").parquet(src)
    victim = set(os.listdir(src)) - before
    hs = Hyperspace(spark, system_path=str(tmp_path / "idx"))
    hs.create_index(
        spark.read.parquet(src), ZOrderCoveringIndexConfig("zs", ["a"], ["p"])
    )
    # mutate WITHOUT refresh
    for fn in victim:
        os.remove(os.path.join(src, fn))
    spark.range(90000, 91000).select(
        (F.col("id") % 500).alias("a"), F.col("id").alias("p")
    ).coalesce(1).write.mode("append").parquet(src)

    for pred in ("a BETWEEN 5 AND 9", "a >= 900"):
        q = spark.read.parquet(src).filter(pred).select("a", "p")
        fast, used = hs._apply_with_info(q)
        assert used == ["zs"], (pred, hs.why_not(q))
        assert sorted(map(tuple, fast.collect())) == sorted(
            map(tuple, q.collect())
        ), pred
    # the deleted region is empty, the appended rows are present
    q = spark.read.parquet(src).filter("a >= 900").select("a", "p")
    assert q.count() == 0
    q2 = spark.read.parquet(src).filter("a BETWEEN 5 AND 9").select("a", "p")
    fast2, _ = hs._apply_with_info(q2)
    assert any(90000 <= p < 91000 for _, p in map(tuple, fast2.collect()))
