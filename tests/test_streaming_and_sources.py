"""Streaming index maintenance + non-parquet source formats.

- Structured Streaming: micro-batches land in the source dir, indexes
  refresh incrementally per batch, accelerated queries stay correct.
- CSV/JSON sources: index create + filter rewrite work for any default
  file source (reference: DefaultFileBasedSource supports
  avro,csv,json,orc,parquet,text).
"""

import os
import time

import pytest
from pyspark.sql import functions as F

from hyperspace_spark import CoveringIndexConfig, Hyperspace
from hyperspace_spark.streaming.refresh import attach_index_maintenance

from tests.conftest import rows_equal, table


def test_streaming_incremental_maintenance(spark, tmp_path):
    src_stream = str(tmp_path / "stream_in")
    src_data = str(tmp_path / "data")
    os.makedirs(src_stream)

    # Seed the indexed table with an initial batch.
    table(spark, "orders").limit(500).repartition(2).write.parquet(src_data)
    hs = Hyperspace(spark, system_path=str(tmp_path / "idx"))
    hs.create_index(
        spark.read.parquet(src_data),
        CoveringIndexConfig("s_idx", ["o_custkey"], ["o_orderkey", "o_totalprice"]),
    )

    # Stream two more batches of files through the maintenance sink.
    schema = spark.read.parquet(src_data).schema
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src_stream)
    writer = attach_index_maintenance(
        stream.writeStream.option("checkpointLocation", str(tmp_path / "ckpt")),
        hs,
        src_data,
        ["s_idx"],
    )
    table(spark, "orders").limit(700).coalesce(1).write.mode("append").parquet(src_stream)
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination(120)

    deadline = time.time() + 30
    while time.time() < deadline:
        e = hs._log_mgr("s_idx", hs.conf()).get_latest_stable_log()
        if e is not None and len(e.source_files) > 2:
            break
        time.sleep(1)

    query = (
        spark.read.parquet(src_data)
        .filter(F.col("o_custkey") < 100)
        .select("o_orderkey", "o_totalprice")
    )
    fast, used = hs._apply_with_info(query)
    assert used == ["s_idx"], hs.why_not(query)
    assert rows_equal(query, fast)
    # Refresh happened: indexed file count grew beyond the initial 2.
    e = hs._log_mgr("s_idx", hs.conf()).get_latest_stable_log()
    assert len(e.source_files) > 2


def test_enabled_writestream_sink_auto_refreshes_index(spark, tmp_path):
    """r9: an enable()d session's writeStream file sink targeting an
    index's SOURCE root enrols the query for automatic incremental
    maintenance (no attach_index_maintenance wiring) — after the
    micro-batches land, the index has refreshed to cover the streamed
    files and still accelerates exactly.

    The sink dir carries a ``_spark_metadata`` FileStreamSink manifest,
    so Spark reads (and therefore the index, via the manifest-aware
    default provider) see COMMITTED files only — the index is created
    after the first batch, when the manifest already governs the dir."""
    src_stream = str(tmp_path / "stream_in")
    sink = str(tmp_path / "data")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src_stream)

    orders = table(spark, "orders")
    schema = orders.limit(1).schema

    def run_stream():
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_stream)
            .writeStream.option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start(sink)
        )
        q.awaitTermination(120)
        return q

    # Batch 1 seeds the sink (and its manifest); index over the result.
    orders.limit(500).coalesce(1).write.mode("append").parquet(src_stream)
    run_stream().stop()
    hs = Hyperspace(spark, system_path=str(tmp_path / "idx"))
    hs.create_index(
        spark.read.parquet(sink),
        CoveringIndexConfig("ws_idx", ["o_custkey"], ["o_orderkey", "o_totalprice"]),
    )
    e0 = hs._log_mgr("ws_idx", hs.conf()).get_latest_stable_log()
    n0 = len(e0.source_files)

    # Two more files -> two more micro-batches under enable(): the sink
    # routing must refresh the index with NO explicit wiring.
    orders.limit(700).coalesce(1).write.mode("append").parquet(src_stream)
    orders.filter("o_custkey >= 100").limit(300).coalesce(1).write.mode(
        "append"
    ).parquet(src_stream)
    hs.enable()
    try:
        q = run_stream()
        # The maintenance listener fires ASYNCHRONOUSLY after each batch:
        # poll for the refreshed log entry.
        deadline = time.time() + 60
        while time.time() < deadline:
            e = hs._log_mgr("ws_idx", hs.conf()).get_latest_stable_log()
            if e is not None and len(e.source_files) >= n0 + 2:
                break
            time.sleep(1)
        q.stop()
    finally:
        hs.disable()

    e1 = hs._log_mgr("ws_idx", hs.conf()).get_latest_stable_log()
    assert len(e1.source_files) >= n0 + 2, "sink batches never refreshed the index"
    query = (
        spark.read.parquet(sink)
        .filter(F.col("o_custkey") < 100)
        .select("o_orderkey", "o_totalprice")
    )
    fast, used = hs._apply_with_info(query)
    assert used == ["ws_idx"], hs.why_not(query)
    assert rows_equal(query, fast)


def test_stream_sink_manifest_replay(tmp_path):
    """FileStreamSinkLog replay: latest .compact wins as the base state,
    later batch files apply on top, delete actions drop entries, and a
    plain dir (no _spark_metadata) returns None so listing still rules."""
    import json

    from hyperspace_spark.sources.registry import _stream_sink_manifest_files

    root = str(tmp_path / "sinkdir")
    meta = os.path.join(root, "_spark_metadata")
    os.makedirs(meta)

    def write_batch(name, entries):
        with open(os.path.join(meta, name), "w") as f:
            f.write("v1\n")
            for e in entries:
                f.write(json.dumps(e) + "\n")

    def add(p, size=10, mt=1000):
        return {
            "path": f"file://{root}/{p}", "size": size, "isDir": False,
            "modificationTime": mt, "blockReplication": 1,
            "blockSize": 1, "action": "add",
        }

    # Batches 0..2 with a compact at 1: batch 0's content must come from
    # the COMPACT (which dropped a.parquet via retention), not batch 0.
    write_batch("0", [add("a.parquet"), add("b.parquet")])
    write_batch("1.compact", [add("b.parquet"), add("c.parquet")])
    write_batch("2", [add("d.parquet", size=77, mt=2222)])
    got = _stream_sink_manifest_files(root)
    assert [f.path.rsplit("/", 1)[-1] for f in got] == [
        "b.parquet", "c.parquet", "d.parquet",
    ]
    d = next(f for f in got if f.path.endswith("d.parquet"))
    assert d.size == 77 and d.mtime == 2222  # manifest values, not stat
    # Delete action in a later batch removes the entry.
    write_batch("3", [dict(add("c.parquet"), action="delete")])
    got2 = _stream_sink_manifest_files(root)
    assert [f.path.rsplit("/", 1)[-1] for f in got2] == ["b.parquet", "d.parquet"]
    # Plain directory: manifest route declines, listing applies.
    assert _stream_sink_manifest_files(str(tmp_path / "plain")) is None


def test_streaming_dedup_against_ledger_cross_run(spark, tmp_path):
    """Ledger-backed ingest dedup: the watermark gate handles in-stream
    replays, the persisted ledger remembers EVERYTHING — including
    across a pipeline restart with a fresh checkpoint, where streaming
    state is gone but the ledger is not."""
    from pyspark.sql import functions as F

    from hyperspace_spark.llm import dedup as bdedup
    from hyperspace_spark.streaming.dedup import dedup_stream_against_ledger

    work = str(tmp_path)
    docs = spark.createDataFrame(
        [(i, f"body {i}") for i in range(30)], "doc_id long, text string"
    )
    bdedup.write_fingerprint_ledger(
        spark, bdedup.corpus_fingerprints(docs.filter("doc_id < 10")), f"{work}/ledger", 4
    )
    src = f"{work}/src"
    docs.write.parquet(src)
    # replayed copies under new ids: must collapse in-stream
    docs.filter("doc_id % 6 = 0").select(
        (F.col("doc_id") + 1000).alias("doc_id"), "text"
    ).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withColumn("event_ts", F.lit("2024-01-01 00:00:00").cast("timestamp"))
    )
    q = dedup_stream_against_ledger(
        stream, f"{work}/ledger", f"{work}/out", f"{work}/ckpt", num_buckets=4
    )
    q.awaitTermination()
    ids = sorted(r.doc_id for r in spark.read.parquet(f"{work}/out").collect())
    assert ids == list(range(10, 30)), ids
    # Restart: overlapping docs rejected by the LEDGER (new checkpoint, no
    # streaming state), new docs accepted.
    more = spark.createDataFrame(
        [(i, f"body {i}") for i in range(25, 40)], "doc_id long, text string"
    )
    more.write.parquet(f"{work}/src2")
    stream2 = (
        spark.readStream.schema("doc_id long, text string")
        .parquet(f"{work}/src2")
        .withColumn("event_ts", F.lit("2024-01-02 00:00:00").cast("timestamp"))
    )
    q2 = dedup_stream_against_ledger(
        stream2, f"{work}/ledger", f"{work}/out2", f"{work}/ckpt2", num_buckets=4
    )
    q2.awaitTermination()
    ids2 = sorted(r.doc_id for r in spark.read.parquet(f"{work}/out2").collect())
    assert ids2 == list(range(30, 40)), ids2


@pytest.mark.parametrize("fmt", ["csv", "json", "orc", "text"])
def test_non_parquet_source_index(spark, tmp_path, fmt):
    src = str(tmp_path / f"orders_{fmt}")
    o = table(spark, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    writer = o.repartition(4).write.mode("overwrite")
    if fmt == "csv":
        writer.option("header", "true").csv(src)
        df = spark.read.option("header", "true").option("inferSchema", "true").csv(src)
    elif fmt == "json":
        writer.json(src)
        df = spark.read.json(src)
    elif fmt == "orc":
        writer.orc(src)
        df = spark.read.orc(src)
    else:  # text: the source exposes ONE string column (value); index it
        # directly — createIndex correctly rejects derived-column frames
        # (same plain-source-scan restriction as the reference).
        o.selectExpr(
            "concat_ws(',', o_custkey, o_orderkey, o_totalprice) AS value"
        ).repartition(4).write.mode("overwrite").text(src)
        df = spark.read.text(src)

    hs = Hyperspace(spark, system_path=str(tmp_path / "idx"))
    if fmt == "text":
        probe = df.first()["value"]
        hs.create_index(df, CoveringIndexConfig(f"{fmt}_idx", ["value"], []))
        q = df.filter(F.col("value") == probe)
    else:
        hs.create_index(df, CoveringIndexConfig(f"{fmt}_idx", ["o_custkey"], ["o_orderkey"]))
        q = df.filter(F.col("o_custkey") == 42).select("o_orderkey")
    fast, used = hs._apply_with_info(q)
    assert used == [f"{fmt}_idx"], hs.why_not(q)
    # executedPlan().toString() truncates long Location paths; inputFiles
    # gives the full scan locations.
    assert all(f"{fmt}_idx" in f for f in fast.inputFiles())
    assert rows_equal(q, fast)


def _avro_available(spark) -> bool:
    try:
        spark.range(1).write.mode("overwrite").format("avro").save("/tmp/_hs_avro_probe")
        return True
    except Exception:
        return False


def test_avro_source_index(spark, tmp_path):
    """r7: S1 avro parity (reference lists avro as a default supported
    format, util/HyperspaceConf.scala:110-115).  The external spark-avro
    module isn't deployed in this container, so this test self-skips;
    it lights up and runs the full create->apply->compare cycle the
    moment the jar is on the classpath (the registry-level unit coverage
    of the avro mapping lives in the sources registry tests)."""
    if not _avro_available(spark):
        pytest.skip("spark-avro module not on the classpath in this environment")
    src = str(tmp_path / "orders_avro")
    o = table(spark, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    o.repartition(4).write.mode("overwrite").format("avro").save(src)
    df = spark.read.format("avro").load(src)
    hs = Hyperspace(spark, system_path=str(tmp_path / "idx_avro"))
    hs.create_index(df, CoveringIndexConfig("avro_idx", ["o_custkey"], ["o_orderkey"]))
    q = df.filter(F.col("o_custkey") == 42).select("o_orderkey")
    fast, used = hs._apply_with_info(q)
    assert used == ["avro_idx"], hs.why_not(q)
    assert all("avro_idx" in f for f in fast.inputFiles())
    assert rows_equal(q, fast)


def test_pure_python_avro_read_write_roundtrip(spark, tmp_path):
    """r10: avro ingestion parity WITHOUT the spark-avro module —
    write_avro encodes one container per partition (deflate codec,
    deterministic sync marker), read_avro fans the files out via a
    binaryFile scan and decodes them in mapInPandas (distributed by
    file).  Values, nulls, arrays and empty partitions roundtrip
    exactly; indexing over format('avro') scans stays jar-gated and
    self-skips above."""
    from hyperspace_spark.sources import avro_io as av

    df = spark.range(0, 1000).selectExpr(
        "id AS a",
        "CASE WHEN id % 7 = 0 THEN NULL ELSE concat('s', id) END AS b",
        "CAST(id * 0.25 AS DOUBLE) AS c",
        "id % 2 = 0 AS d",
        "array(CAST(id AS INT), CAST(id + 1 AS INT)) AS e",
    ).repartition(5)
    path = str(tmp_path / "avro_out")
    av.write_avro(df, path)
    import os

    files = [f for f in os.listdir(path) if f.endswith(".avro")]
    assert len(files) == 5, files

    back = av.read_avro(spark, path)
    assert back.schema.simpleString() == (
        "struct<a:bigint,b:string,c:double,d:boolean,e:array<int>>"
    )
    got = sorted(
        (r.a, r.b, round(r.c, 6), r.d, tuple(r.e)) for r in back.collect()
    )
    want = sorted(
        (r.a, r.b, round(r.c, 6), r.d, tuple(r.e)) for r in df.collect()
    )
    assert got == want and len(got) == 1000
    # distributed: the decode plan reads one row per FILE from the
    # binaryFile scan (file = split unit)
    assert len(back.inputFiles()) == 5
    # an empty partition writes a valid, readable, zero-row container
    empty = spark.range(0).selectExpr("id AS a").repartition(1)
    av.write_avro(empty, str(tmp_path / "avro_empty"))
    assert av.read_avro(spark, str(tmp_path / "avro_empty")).count() == 0


def test_stream_stream_interval_join(spark, tmp_path, sf_dir):
    """streaming/join.py interval_join_streams: the emitted pair set
    equals the batch interval join (availableNow => one batch holds all
    rows), and both sides carry watermarks in the analyzed plan (the
    state-eviction contract — without them Spark would either reject the
    join or buffer unbounded state)."""
    from pyspark.sql import functions as F

    from hyperspace_spark.streaming.join import interval_join_streams

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    sv = stream.filter("event_type = 'view'").select("event_id", "ts", "user_id")
    sp = stream.filter("event_type = 'purchase'").select("event_id", "ts", "user_id")
    joined = interval_join_streams(sv, sp, key="user_id", window="12 hours", watermark="1 day")
    assert joined.isStreaming
    # watermark on both sides of the logical plan
    lp = joined._jdf.queryExecution().analyzed().toString()
    assert lp.count("EventTimeWatermark") == 2, lp
    q = (
        joined.select(
            F.col("l_event_id").alias("v"), F.col("r_event_id").alias("p")
        )
        .writeStream.format("memory")
        .queryName("t_ivjoin")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {(r.v, r.p) for r in spark.table("t_ivjoin").collect()}
    bv = ev.filter("event_type = 'view'").select(
        F.col("event_id").alias("v"), "ts", "user_id"
    )
    bp = ev.filter("event_type = 'purchase'").select(
        F.col("event_id").alias("p"), F.col("ts").alias("pts"), F.col("user_id").alias("pu")
    )
    want = {
        (r.v, r.p)
        for r in bv.join(
            bp,
            (bv.user_id == bp.pu)
            & (bp.pts >= bv.ts)
            & (bp.pts <= bv.ts + F.expr("INTERVAL 12 hours")),
        ).collect()
    }
    assert got == want and len(want) > 0


def test_stream_stream_interval_join_left_outer(spark, sf_dir):
    """leftOuter interval join: views that never converted emit with a
    NULL right side once the watermark passes their window."""
    from pyspark.sql import functions as F

    from hyperspace_spark.streaming.join import interval_join_streams

    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    sv = stream.filter("event_type = 'view'").select("event_id", "ts", "user_id")
    sp = stream.filter("event_type = 'purchase'").select("event_id", "ts", "user_id")
    joined = interval_join_streams(
        sv, sp, key="user_id", window="4 hours", watermark="6 hours", how="leftOuter"
    )
    q = (
        joined.select(
            F.col("l_event_id").alias("v"), F.col("r_event_id").alias("p")
        )
        .writeStream.format("memory")
        .queryName("t_ivjoin_outer")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("t_ivjoin_outer").collect()
    matched = {(r.v, r.p) for r in rows if r.p is not None}
    unmatched = {r.v for r in rows if r.p is None}
    # batch truth
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    bv = ev.filter("event_type = 'view'").select(
        F.col("event_id").alias("v"), "ts", "user_id"
    )
    bp = ev.filter("event_type = 'purchase'").select(
        F.col("event_id").alias("p"), F.col("ts").alias("pts"), F.col("user_id").alias("pu")
    )
    want_matched = {
        (r.v, r.p)
        for r in bv.join(
            bp,
            (bv.user_id == bp.pu) & (bp.pts >= bv.ts)
            & (bp.pts <= bv.ts + F.expr("INTERVAL 4 hours")),
        ).collect()
    }
    assert matched == want_matched
    # every matched view is not in unmatched; most views never convert
    assert unmatched.isdisjoint({v for v, _ in matched})
    n_views = bv.count()
    # outer rows for non-converting views whose window closed under the
    # final watermark (events near the stream's end may stay buffered —
    # that is the documented outer-join semantics, not data loss)
    assert len(unmatched) > 0.5 * (n_views - len({v for v, _ in matched}))


# ---------------------------------------------------------------------------
# scale-adaptive state partitions (r14, streaming/state.py)
# ---------------------------------------------------------------------------
def test_scaled_state_partitions_derivation_and_restore(spark, tmp_path):
    from hyperspace_spark.streaming.state import (
        _parse_bytes,
        derive_state_partitions,
        scaled_state_partitions,
    )

    assert _parse_bytes("64m") == 64 << 20
    assert _parse_bytes("256MB") == 256 << 20
    assert _parse_bytes("1g") == 1 << 30
    assert _parse_bytes("1024") == 1024

    old = spark.conf.get("spark.sql.shuffle.partitions")
    session_default = int(old)
    advisory = 64 << 20
    # tiny input -> floor of 1; huge input -> clamped at session default
    assert derive_state_partitions(spark, 10) == 1
    assert derive_state_partitions(spark, advisory * (session_default + 50)) == session_default
    # mid-size: ceil(bytes/advisory), below the session default
    if session_default >= 3:
        assert derive_state_partitions(spark, advisory * 2 + 1) == 3
    assert derive_state_partitions(spark, None) is None

    p = tmp_path / "part.bin"
    p.write_bytes(b"x" * 1000)
    with scaled_state_partitions(spark, str(p)) as target:
        assert target == 1
        assert spark.conf.get("spark.sql.shuffle.partitions") == "1"
    assert spark.conf.get("spark.sql.shuffle.partitions") == old

    # unsized (remote scheme) input: no-op, conf untouched
    with scaled_state_partitions(spark, "s3://bucket/path") as target:
        assert target is None
        assert spark.conf.get("spark.sql.shuffle.partitions") == old
