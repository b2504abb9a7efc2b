"""Stateful streaming sessionization + streaming windowed aggregation.

Drives real micro-batch execution (file source, availableNow trigger),
not just batch equivalents.
"""

import os
import time

from pyspark.sql import functions as F


def test_sessionize_stream(spark, tmp_path):
    src = str(tmp_path / "events_in")
    out = str(tmp_path / "sessions_out")
    os.makedirs(src)

    # Two users; user 1 has two sessions separated by a > gap pause.
    base = 1_700_000_000
    rows = (
        [(1, base + i * 60, 1.0) for i in range(5)]                # session A: 5 events, 1 min apart
        + [(1, base + 10_000 + i * 60, 2.0) for i in range(3)]     # session B after ~2.7h gap
        + [(2, base + i * 30, 5.0) for i in range(4)]              # user 2: one session
    )
    df = spark.createDataFrame(rows, "user_id long, epoch long, value double").withColumn(
        "event_ts", F.timestamp_seconds("epoch")
    ).drop("epoch")
    df.coalesce(1).write.mode("overwrite").parquet(src)

    from hyperspace_spark.streaming.sessionize import sessionize

    stream = spark.readStream.schema(
        "user_id long, value double, event_ts timestamp"
    ).parquet(src)
    q = (
        sessionize(stream, gap_seconds=1800)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = spark.read.parquet(out)
    # availableNow closes the stream after one pass; only sessions whose
    # timeout fired emit.  Session A of user 1 must be among them (the
    # 2.7h gap inside the data advances the watermark past its timeout).
    sessions = {(r.user_id, r.n_events, r.total_value) for r in got.collect()}
    assert (1, 5, 5.0) in sessions, sessions


def test_sessionize_survives_dst_fall_back(spark, tmp_path):
    """r7 review fix: in a non-UTC session zone the fall-back hour
    repeats on the naive wall clock Arrow hands the state function —
    pandas' default tz_localize(ambiguous='raise') killed the streaming
    query twice a year.  Events spanning the 2024-11-03 America/New_York
    transition must sessionize without error and in true event order."""
    src = str(tmp_path / "dst_in")
    out = str(tmp_path / "dst_out")
    os.makedirs(src)

    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        # UTC instants: 05:30 and 06:30 UTC both render as 01:30 on the
        # NY wall clock that day (EDT then EST) — the ambiguous hour.
        # The first two events straddle the ENTRY to that hour 2 real
        # minutes apart (00:59 / 01:01 EDT): any wall-clock-based
        # resolution injects a false ~1h gap there and splits the
        # session; the JVM-side epoch column must keep them together.
        base = 1730611800  # 2024-11-03 05:30:00 UTC == 01:30 EDT
        rows = [
            (1, base - 1860, 1.0),       # 00:59:00 EDT
            (1, base - 1740, 2.0),       # 01:01:00 EDT — 2 min later
            (1, base, 3.0),              # 01:30 EDT — 29 min later, same session
            (1, base + 3600, 4.0),       # 01:30 EST (same wall clock!) — 60 min gap: NEW session
            (1, base + 3600 + 600, 5.0),
            (1, base + 20_000, 9.0),     # later event closes both via watermark
        ]
        df = (
            spark.createDataFrame(rows, "user_id long, epoch long, value double")
            .withColumn("event_ts", F.timestamp_seconds("epoch"))
            .drop("epoch")
        )
        df.coalesce(1).write.mode("overwrite").parquet(src)

        from hyperspace_spark.streaming.sessionize import sessionize

        stream = spark.readStream.schema(
            "user_id long, value double, event_ts timestamp"
        ).parquet(src)
        q = (
            sessionize(stream, gap_seconds=1800)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "dst_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert q.exception() is None, q.exception()
        got = {
            (r.user_id, r.n_events, r.total_value)
            for r in spark.read.parquet(out).collect()
        }
        # session 1: 00:59 EDT + 01:01 EDT + 01:30 EDT (true gaps 2 and
        # 29 min) — NOT split by the DST transition; session 2: the two
        # EST-side events an hour later
        assert (1, 3, 6.0) in got, got
        assert (1, 2, 9.0) in got, got
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)


def test_streaming_windowed_agg(spark, tmp_path):
    """Tumbling-window aggregation with watermark over a file stream."""
    src = str(tmp_path / "ev_in")
    out = str(tmp_path / "win_out")
    os.makedirs(src)
    base = 1_700_000_000
    rows = [(i % 3, base + i * 10, float(i)) for i in range(360)]
    df = spark.createDataFrame(rows, "k long, epoch long, v double").withColumn(
        "ts", F.timestamp_seconds("epoch")
    ).drop("epoch")
    df.coalesce(2).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema("k long, v double, ts timestamp").parquet(src)
    agg = (
        stream.withWatermark("ts", "1 minute")
        .groupBy(F.window("ts", "10 minutes"), F.col("k"))
        .agg(F.count("*").alias("n"), F.round(F.sum("v"), 2).alias("sv"))
    )
    q = (
        agg.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    # Batch equivalent over the same data for closed windows.
    batch = (
        df.groupBy(F.window("ts", "10 minutes"), F.col("k"))
        .agg(F.count("*").alias("n"), F.round(F.sum("v"), 2).alias("sv"))
    )
    got_set = {(r.window.start, r.k, r.n, r.sv) for r in got.collect()}
    batch_set = {(r.window.start, r.k, r.n, r.sv) for r in batch.collect()}
    # Streaming emits only watermark-closed windows -> subset, non-empty.
    assert got_set and got_set.issubset(batch_set)


def test_sessionize_string_key_and_late_isolated_event(spark, tmp_path):
    """Schema derivation: a string key column must work (the schemas were
    previously hardcoded to user_id:long).  Late-event semantics: an
    admitted event older than the open session by more than the gap
    emits as its own single-event session instead of being glued onto
    the current one."""
    src = str(tmp_path / "ev_str")
    out = str(tmp_path / "sess_str")
    os.makedirs(src)
    base = 1_700_000_000
    rows = (
        # device A: an early isolated event, then (after > gap) a 3-event
        # session, then a > gap pause inside the data so the watermark
        # closes the 3-event session too.
        [("devA", base, 1.0)]
        + [("devA", base + 7200 + i * 60, 2.0) for i in range(3)]
        + [("devA", base + 20000, 9.0)]
        + [("devB", base + i * 30, 5.0) for i in range(2)]
    )
    df = spark.createDataFrame(rows, "device string, epoch long, value double").withColumn(
        "event_ts", F.timestamp_seconds("epoch")
    ).drop("epoch")
    df.coalesce(1).write.mode("overwrite").parquet(src)

    from hyperspace_spark.streaming.sessionize import sessionize

    stream = spark.readStream.schema(
        "device string, value double, event_ts timestamp"
    ).parquet(src)
    q = (
        sessionize(stream, gap_seconds=1800, key_col="device")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt_str"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert "device" in got.columns
    sessions = {(r.device, r.n_events, r.total_value) for r in got.collect()}
    # the isolated early event and the 3-event session both closed
    assert ("devA", 1, 1.0) in sessions, sessions
    assert ("devA", 3, 6.0) in sessions, sessions


def test_sessionize_late_event_unit():
    """Pure-logic checks of the late-event branches via the extracted
    state machine (sessionize._advance)."""
    from hyperspace_spark.streaming.sessionize import _advance

    gap_ms = 1800 * 1000
    S = 10_000_000

    # Two late events within gap of EACH OTHER, the newer one within gap
    # of the open session: the whole chain is ONE session — the run
    # bridges backwards, nothing closes.  (Pre-r5 the older event was
    # wrongly emitted as an isolated single-event session: the gap check
    # only ever compared each late event against the session start.)
    (start, last, n, total), closed = _advance(
        S, S, 3, 3.0, [S - gap_ms - 1, S - 60_000], [9.0, 1.0], gap_ms
    )
    assert closed == []
    assert (start, last, n, total) == (S - gap_ms - 1, S, 5, 13.0)

    # Two late events within gap of each other but the run NOT within gap
    # of the open session: one merged 2-event closed session (the r4
    # defect emitted two isolated 1-event sessions here).
    (start, last, n, total), closed = _advance(
        S, S, 3, 3.0,
        [S - 3 * gap_ms, S - 3 * gap_ms + 60_000], [9.0, 1.0], gap_ms,
    )
    assert closed == [(S - 3 * gap_ms, S - 3 * gap_ms + 60_000, 2, 10.0)]
    assert (start, last, n, total) == (S, S, 3, 3.0)

    # Two late RUNS separated by > gap: older run closes, newer bridges.
    (start, last, n, total), closed = _advance(
        S, S, 2, 2.0,
        [S - 3 * gap_ms, S - gap_ms + 1, S - 60_000], [9.0, 4.0, 1.0], gap_ms,
    )
    assert closed == [(S - 3 * gap_ms, S - 3 * gap_ms, 1, 9.0)]
    assert (start, last, n, total) == (S - gap_ms + 1, S, 4, 7.0)

    # Forward path unchanged: a > gap jump closes the open session.
    (start, last, n, total), closed = _advance(
        S, S, 2, 2.0, [S + 2 * gap_ms], [5.0], gap_ms
    )
    assert closed == [(S, S, 2, 2.0)]
    assert (start, last, n, total) == (S + 2 * gap_ms, S + 2 * gap_ms, 1, 5.0)


def test_streaming_ingest_dedup(spark, tmp_path):
    """Duplicate keys and duplicate CONTENT arriving within the watermark
    delay collapse to one row; distinct rows all pass."""
    import os

    src = str(tmp_path / "ingest_src")
    os.makedirs(src)
    base = 1_700_000_000
    rows = [
        (1, "hello  world", base),
        (1, "hello  world", base + 5),      # same id: retry/replay
        (2, "Hello world", base + 10),      # different id, same normalized text
        (3, "something else", base + 20),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, epoch long").withColumn(
        "event_ts", F.timestamp_seconds("epoch")
    ).drop("epoch")
    df.coalesce(1).write.mode("overwrite").parquet(src)

    from hyperspace_spark.streaming.dedup import dedup_stream, dedup_stream_by_content

    stream = spark.readStream.schema("doc_id long, text string, event_ts timestamp").parquet(src)

    out1 = str(tmp_path / "by_key")
    q = (
        dedup_stream(stream, ["doc_id"], delay="1 minute")
        .writeStream.format("parquet")
        .option("path", out1)
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    by_key = spark.read.parquet(out1)
    assert by_key.count() == 3  # ids 1 (once), 2, 3
    assert sorted(r.doc_id for r in by_key.collect()) == [1, 2, 3]

    out2 = str(tmp_path / "by_content")
    q2 = (
        dedup_stream_by_content(stream, delay="1 minute")
        .writeStream.format("parquet")
        .option("path", out2)
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    by_content = spark.read.parquet(out2)
    # "hello  world" x2 and "Hello world" all share one fingerprint
    assert by_content.count() == 2
    assert "_hs_fp" not in by_content.columns


def test_ingest_dedup_null_text_passthrough(spark, tmp_path):
    """NULL-text records are not duplicates of anything: content dedup
    must pass them ALL through (fingerprint(NULL) is NULL and
    dropDuplicatesWithinWatermark treats NULL keys as equal — without the
    per-row fallback key they'd collapse to one)."""
    import os

    src = str(tmp_path / "null_src")
    os.makedirs(src)
    base = 1_700_000_000
    rows = [
        (10, None, base),
        (11, None, base + 5),
        (12, None, base + 9),
        (13, "real text", base + 12),
        (14, "real text", base + 15),  # genuine duplicate content
    ]
    df = (
        spark.createDataFrame(rows, "doc_id long, text string, epoch long")
        .withColumn("event_ts", F.timestamp_seconds("epoch"))
        .drop("epoch")
    )
    df.coalesce(1).write.mode("overwrite").parquet(src)

    from hyperspace_spark.streaming.dedup import dedup_stream_by_content

    stream = spark.readStream.schema("doc_id long, text string, event_ts timestamp").parquet(src)
    out = str(tmp_path / "null_out")
    q = (
        dedup_stream_by_content(stream, delay="1 minute")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "null_ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    ids = sorted(r.doc_id for r in got.collect())
    # all three NULL-text docs survive; the real duplicate still collapses
    assert 10 in ids and 11 in ids and 12 in ids
    assert len([i for i in ids if i >= 13]) == 1
    assert got.count() == 4
