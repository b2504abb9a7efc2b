"""Driver-side bucket pruning: Python murmur3 must agree with Spark's
Murmur3Hash (seed 42) bit-for-bit, and the pruned-file read must return
exactly the rows a full index read returns.

Reference semantics being replicated: HashPartitioning.partitionIdExpression
= pmod(murmur3(key, 42), numBuckets) (public Spark source); the reference
engine gets the same effect via useBucketSpec + Spark-side bucket pruning
(covering/FilterIndexRule.scala:118-132).
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from hyperspace_spark.planner.mmh3 import bucket_id, spark_hash


@pytest.fixture(scope="module")
def hash_rows(spark):
    """(value, dtype, spark_hash) triples computed by Spark itself."""
    rows = []
    df = spark.createDataFrame(
        [(0,), (1,), (42,), (-7,), (2**33,), (2**62 - 1,), (-(2**40),)], "v long"
    ).select("v", F.hash("v").alias("h"))
    rows += [(r.v, "long", r.h) for r in df.collect()]
    df = spark.createDataFrame([(0,), (1,), (42,), (-7,), (2**31 - 1,)], "v int").select(
        "v", F.hash("v").alias("h")
    )
    rows += [(r.v, "integer", r.h) for r in df.collect()]
    df = spark.createDataFrame(
        [("",), ("a",), ("hello",), ("héllo wörld",), ("0123456789abcdef",), ("xy\x00z",)],
        "v string",
    ).select("v", F.hash("v").alias("h"))
    rows += [(r.v, "string", r.h) for r in df.collect()]
    df = spark.createDataFrame([(True,), (False,)], "v boolean").select(
        "v", F.hash("v").alias("h")
    )
    rows += [(r.v, "boolean", r.h) for r in df.collect()]
    df = spark.createDataFrame(
        [(datetime.date(1970, 1, 1),), (datetime.date(1995, 3, 15),), (datetime.date(2024, 12, 31),)],
        "v date",
    ).select("v", F.hash("v").alias("h"))
    rows += [(r.v, "date", r.h) for r in df.collect()]
    return rows


def test_python_murmur3_matches_spark_hash(hash_rows):
    for v, dtype, expected in hash_rows:
        assert spark_hash(v, dtype) == expected, (v, dtype)


def test_null_hash_matches_spark(spark):
    h = spark.createDataFrame([(None,)], "v long").select(F.hash("v")).collect()[0][0]
    assert spark_hash(None, "long") == h


def test_unsupported_type_returns_none():
    assert spark_hash(1.5, "double") is None
    assert bucket_id(1.5, "double", 8) is None


def test_bucket_id_matches_file_layout(spark, tmp_path):
    """Rows written by write_bucketed land in the file mmh3 predicts."""
    from hyperspace_spark.indexes.covering import _BUCKET_FILE_RE, write_bucketed

    df = spark.range(0, 500).withColumn("k", F.col("id") % 37).withColumn(
        "s", F.concat(F.lit("u"), F.col("id"))
    )
    write_bucketed(spark, df, ["k"], 8, str(tmp_path / "data"), "hs_test_bp")
    # For each file, every distinct k in it must hash to that file's bucket.
    import glob

    for path in glob.glob(str(tmp_path / "data" / "*.parquet")):
        m = _BUCKET_FILE_RE.search(path.rsplit("/", 1)[-1])
        assert m, path
        bucket = int(m.group(1))
        for row in spark.read.parquet(path).select("k").distinct().collect():
            assert bucket_id(row.k, "long", 8) == bucket
    spark.sql("DROP TABLE IF EXISTS hs_test_bp")


def test_filter_point_uses_pruned_files_and_is_correct(spark, tmp_path):
    """End-to-end: equality filter reads a strict subset of index files
    and returns exactly the raw-scan rows."""
    from hyperspace_spark import CoveringIndexConfig, Hyperspace

    src = str(tmp_path / "src")
    spark.range(0, 2000).select(
        (F.col("id") % 211).alias("k"),
        F.col("id").alias("payload"),
    ).write.mode("overwrite").parquet(src)
    hs = Hyperspace(spark, system_path=str(tmp_path / "idx"))
    spark.conf.set("spark.hyperspace.index.numBuckets", "8")
    try:
        hs.create_index(
            spark.read.parquet(src), CoveringIndexConfig("bp_idx", ["k"], ["payload"])
        )
        q = spark.read.parquet(src).filter(F.col("k") == 7).select("k", "payload")
        accel = hs.apply(q)
        read = {f for f in accel.inputFiles()}
        assert read, "index not applied"
        assert all("bp_idx" in f for f in read), read
        entry = next(e for e in hs._active_entries(hs.conf()) if e.name == "bp_idx")
        assert len(read) < len(entry.content_files), "no file pruning happened"
        assert sorted(r.payload for r in accel.collect()) == sorted(
            r.payload for r in q.collect()
        )
    finally:
        spark.conf.unset("spark.hyperspace.index.numBuckets")


def test_in_list_pruning_correct(spark, tmp_path):
    from hyperspace_spark import CoveringIndexConfig, Hyperspace

    src = str(tmp_path / "src")
    spark.range(0, 3000).select(
        F.concat(F.lit("cat_"), (F.col("id") % 97).cast("string")).alias("k"),
        F.col("id").alias("payload"),
    ).write.mode("overwrite").parquet(src)
    hs = Hyperspace(spark, system_path=str(tmp_path / "idx"))
    spark.conf.set("spark.hyperspace.index.numBuckets", "8")
    try:
        hs.create_index(
            spark.read.parquet(src), CoveringIndexConfig("bp_in", ["k"], ["payload"])
        )
        q = (
            spark.read.parquet(src)
            .filter(F.col("k").isin("cat_3", "cat_55", "cat_90"))
            .select("k", "payload")
        )
        accel = hs.apply(q)
        assert any("bp_in" in f for f in accel.inputFiles())
        assert sorted((r.k, r.payload) for r in accel.collect()) == sorted(
            (r.k, r.payload) for r in q.collect()
        )
    finally:
        spark.conf.unset("spark.hyperspace.index.numBuckets")


def test_empty_bucket_literal_returns_empty(spark, tmp_path):
    """A literal whose bucket holds no rows must yield an empty (not
    wrong) result, even when the bucket file does not exist."""
    from hyperspace_spark import CoveringIndexConfig, Hyperspace

    src = str(tmp_path / "src")
    # Only even keys: some buckets may be row-free.
    spark.range(0, 100).select(
        (F.col("id") * 2).alias("k"), F.col("id").alias("payload")
    ).write.mode("overwrite").parquet(src)
    hs = Hyperspace(spark, system_path=str(tmp_path / "idx"))
    spark.conf.set("spark.hyperspace.index.numBuckets", "16")
    try:
        hs.create_index(
            spark.read.parquet(src), CoveringIndexConfig("bp_empty", ["k"], ["payload"])
        )
        for probe in (1, 3, 99999):
            q = spark.read.parquet(src).filter(F.col("k") == probe).select("k", "payload")
            assert hs.apply(q).count() == 0
    finally:
        spark.conf.unset("spark.hyperspace.index.numBuckets")


def test_epoch_micros_is_exact():
    """total_seconds()*1e6 routed through float64 and was off by 1us for
    ~1% of timestamps — the hash then picked the wrong bucket and the
    matching file was silently pruned."""
    from hyperspace_spark.planner.mmh3 import _EPOCH_TS, _epoch_micros

    dt = datetime.datetime(2038, 10, 8, 19, 4, 37, 412461, tzinfo=datetime.timezone.utc)
    assert _epoch_micros(dt) % 1000 == 461
    # sweep: reconstruct each timestamp from its exact micros and demand
    # the round trip is lossless
    import random

    rnd = random.Random(7)
    for _ in range(2000):
        micros = rnd.randrange(0, 4102444800_000_000)  # through 2100
        dt = _EPOCH_TS + datetime.timedelta(microseconds=micros)
        assert _epoch_micros(dt) == micros


def test_timestamp_bucket_pruning_respects_session_timezone(spark, tmp_path):
    """Catalyst renders TIMESTAMP literals as session-timezone wall time;
    hashing them as UTC picks the wrong bucket for any non-UTC session
    and silently drops matching rows."""
    from hyperspace_spark import CoveringIndexConfig, Hyperspace

    src = str(tmp_path / "src_ts")
    spark.sql(
        "SELECT timestampadd(HOUR, CAST(id AS INT), TIMESTAMP '2024-01-01 00:00:00') AS ts,"
        " id AS payload FROM range(500)"
    ).write.mode("overwrite").parquet(src)
    hs = Hyperspace(spark, system_path=str(tmp_path / "idx_ts"))
    spark.conf.set("spark.hyperspace.index.numBuckets", "8")
    old_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        hs.create_index(
            spark.read.parquet(src), CoveringIndexConfig("ts_idx", ["ts"], ["payload"])
        )
        # Kolkata is +5:30, so its wall-clock literal needs :30 to land
        # back on the data's hour grid.
        for tz, wall in [
            ("UTC", "2024-01-05 07:00:00"),
            ("America/New_York", "2024-01-05 07:00:00"),
            ("Asia/Kolkata", "2024-01-05 07:30:00"),
        ]:
            spark.conf.set("spark.sql.session.timeZone", tz)
            spark.conf.set("spark.hyperspace.apply.cacheTtlSeconds", "0")
            probe = spark.read.parquet(src).filter(
                F.col("ts") == F.lit(wall).cast("timestamp")
            ).select("payload")
            accel = hs.apply(probe)
            assert [r.payload for r in accel.collect()] == [
                r.payload for r in probe.collect()
            ], f"wrong rows under session tz {tz}"
            assert len(probe.collect()) == 1  # non-vacuous
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)
        spark.conf.unset("spark.hyperspace.index.numBuckets")
        spark.conf.unset("spark.hyperspace.apply.cacheTtlSeconds")


def test_lit_python_recovers_inset_renderings():
    """r7: the InSet-recovery literal forms must round-trip through
    _lit_python into the exact Python values the hash/bucket layer
    expects — a raw passthrough string here silently disables (or,
    worse, mis-targets) pruning."""
    import datetime as dt

    from hyperspace_spark.indexes.sketches import _lit_python
    from hyperspace_spark.planner.expr import Lit

    assert _lit_python(Lit(sql="DATE_FROM_UNIX_DATE(9190)")) == dt.date(1970, 1, 1) + dt.timedelta(days=9190)
    ts = _lit_python(Lit(sql="TIMESTAMP_MICROS(864864000000000)"))
    assert ts == dt.datetime(1997, 5, 29, tzinfo=dt.timezone.utc)
    assert ts.tzinfo is not None  # aware: no session-zone reinterpretation
    assert _lit_python(Lit(sql="TIMESTAMP_NTZ '1997-03-01 00:00:00.000000'")) == "1997-03-01 00:00:00.000000"
    # escaping: backslash + quote both fold correctly (Catalyst escapes
    # exactly these two), and the old naive replace's failure case works
    assert _lit_python(Lit(sql=r"'a\\b'")) == "a\\b"
    assert _lit_python(Lit(sql=r"'a\'b'")) == "a'b"
    assert _lit_python(Lit(sql=r"'a\\\'b'")) == "a\\'b"


def test_date_inset_bucket_pruning_end_to_end(spark, tmp_path):
    """r7 review fix: a >10-literal date IN list (Catalyst InSet) on a
    date-bucketed covering index must still accelerate AND bucket-prune
    correctly — the recovered DATE_FROM_UNIX_DATE literals used to crash
    the bucket hash and silently drop the rewrite."""
    import datetime as dt

    from hyperspace_spark import CoveringIndexConfig, Hyperspace

    src = str(tmp_path / "dsrc")
    days = [dt.date(1994, 1, 1) + dt.timedelta(days=i) for i in range(400)]
    spark.createDataFrame(
        [(d, i, float(i) * 1.5) for i, d in enumerate(days)], "d date, k int, v double"
    ).repartition(4).write.parquet(src)
    df = spark.read.parquet(src)
    hs = Hyperspace(spark, system_path=str(tmp_path / "didx"))
    hs.create_index(df, CoveringIndexConfig("d_cov", ["d"], ["k", "v"], num_buckets=8))
    probe = [dt.date(1994, 2, 1) + dt.timedelta(days=i) for i in range(12)]  # InSet (>10)
    q = df.filter(F.col("d").isin(probe)).select("d", "k", "v")
    fast, used = hs._apply_with_info(q)
    assert used == ["d_cov"], hs.why_not(q)
    got = sorted(map(tuple, fast.collect()))
    want = sorted(map(tuple, q.collect()))
    assert got == want and len(got) == 12


def test_backslash_string_bloom_probe_no_wrong_pruning(spark, tmp_path):
    """r7 review fix: Bloom probes on strings containing backslashes must
    hash the true value — the naive unescape pruned files that DO hold
    matches (silent wrong results)."""
    from hyperspace_spark import BloomFilterSketch, DataSkippingIndexConfig, Hyperspace

    src = str(tmp_path / "bsrc")
    vals = ["a\\b", "a'b", "plain", "x\\'y"] + [f"filler{i}" for i in range(200)]
    spark.createDataFrame([(v, i) for i, v in enumerate(vals)], "s string, k int").coalesce(
        1
    ).write.parquet(src)
    df = spark.read.parquet(src)
    hs = Hyperspace(spark, system_path=str(tmp_path / "bidx"))
    hs.create_index(
        df, DataSkippingIndexConfig("b_skip", [BloomFilterSketch(["s"], 0.01, 300)])
    )
    probes = ["a\\b", "a'b", "x\\'y"] + [f"zmiss{i}" for i in range(10)]  # InSet (>10)
    q = df.filter(F.col("s").isin(probes)).select("s", "k")
    fast, used = hs._apply_with_info(q)
    got = sorted(map(tuple, fast.collect()))
    want = sorted(map(tuple, q.collect()))
    assert got == want and len(got) == 3, (used, got)


def test_boolean_literal_rendering_hashes_correctly():
    """r7 review fix: _lit_python('false') must be Python False — the raw
    string is TRUTHY and would hash a false-probe into the true bucket
    (silent row loss).  spark_hash also refuses leaked non-bool strings."""
    from hyperspace_spark.indexes.sketches import _lit_python
    from hyperspace_spark.planner.expr import Lit

    assert _lit_python(Lit(sql="false")) is False
    assert _lit_python(Lit(sql="true")) is True
    assert spark_hash("false", "boolean") == spark_hash(False, "boolean")
    assert spark_hash("true", "boolean") == spark_hash(True, "boolean")
    assert spark_hash("junk", "boolean") is None


def test_ntz_literal_year_padding():
    """r7 review fix: TIMESTAMP_NTZ renderings must zero-pad the year
    (strftime('%Y') emits '1-01-01' for year 1 — an invalid literal that
    would kill the whole rewrite via the apply() catch-all)."""
    from hyperspace_spark.planner.expr import _render_internal_literal

    # year 1: ~ -62135596800000000 micros from epoch
    import datetime as dt

    micros = int((dt.datetime(5, 1, 1) - dt.datetime(1970, 1, 1)).total_seconds()) * 1_000_000
    s = _render_internal_literal(micros, "timestamp_ntz", None)
    assert s == "TIMESTAMP_NTZ '0005-01-01 00:00:00.000000'", s


def test_multi_column_hash_chains_like_spark(spark):
    """bucket_id_multi's per-column fold must equal F.hash(c1, c2, ...)
    (Murmur3Hash folds children, each hash seeding the next) — including
    NULL columns (skipped: seed passes through)."""
    from hyperspace_spark.planner.mmh3 import bucket_id_multi, spark_hash
    from hyperspace_spark.planner.mmh3 import SEED, _signed32

    rows = [
        (1, "a"), (42, "hello"), (-7, ""), (2**40, "héllo"), (0, None), (None, "x"),
    ]
    df = spark.createDataFrame(rows, "a long, b string").select(
        "a", "b", F.hash("a", "b").alias("h")
    )
    for r in df.collect():
        h = SEED
        h = spark_hash(r.a, "long", seed=h)
        h = spark_hash(r.b, "string", seed=h)
        assert _signed32(h) == r.h, (r.a, r.b)
        # and the bucket id derives from the same fold
        assert bucket_id_multi([r.a, r.b], ["long", "string"], 16) == ((r.h % 16) + 16) % 16


def test_composite_key_filter_pruning_e2e(spark, tmp_path):
    """A 2-column covering index bucket-prunes when the predicate pins
    BOTH indexed columns, reads exactly the probed bucket's files, and
    returns the same rows as the unpruned plan; pinning only one column
    serves the index WITHOUT pruning (sound fallback)."""
    from hyperspace_spark import CoveringIndexConfig, Hyperspace

    src = str(tmp_path / "li")
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").repartition(
        4
    ).write.parquet(src)
    li = spark.read.parquet(src)
    hs = Hyperspace(spark, system_path=str(tmp_path / "idx"))
    hs.create_index(
        li,
        CoveringIndexConfig(
            "comp_idx",
            ["l_orderkey", "l_linenumber"],
            ["l_quantity", "l_extendedprice"],
            num_buckets=16,
        ),
    )
    ok = li.select("l_orderkey").limit(1).collect()[0][0]
    q = li.filter(f"l_orderkey = {ok} AND l_linenumber IN (1, 2)").select(
        "l_quantity", "l_extendedprice"
    )
    out, used = hs._apply_with_info(q)
    assert used == ["comp_idx"], hs.why_not(q)
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re

    m = re.search(r"InMemoryFileIndex\((\d+) paths?\)", plan)
    assert m and int(m.group(1)) <= 2, plan  # <=2 bucket files, not all 16
    assert sorted(map(tuple, q.collect())) == sorted(map(tuple, out.collect()))
    # single-column equality on a composite key: no pruning, still served
    q2 = li.filter(f"l_orderkey = {ok}").select("l_quantity", "l_extendedprice")
    out2, used2 = hs._apply_with_info(q2)
    assert used2 == ["comp_idx"]
    assert sorted(map(tuple, q2.collect())) == sorted(map(tuple, out2.collect()))
