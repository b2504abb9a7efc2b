"""Streaming ingest deduplication: drop duplicate records as they arrive,
with state that expires at the watermark.

The batch dedup operators (llm/dedup.py) are corpus-wide passes; THIS is
the ingest-time gate a streaming training-data pipeline puts in front of
them — exact duplicates (retries, replays, multi-source crawls) never
land in the lake, so the expensive near-dup passes run over less data.

Built on Structured Streaming's own stateful operators — no custom
state:

- ``dedup_stream``: ``dropDuplicatesWithinWatermark`` over key columns —
  duplicates arriving within the watermark delay of each other collapse
  to the first arrival, and the dedup state for a key is dropped once
  the watermark passes it.  State size is bounded by (unique keys per
  delay window), never by stream history — the property that keeps this
  viable on an unbounded 100 TB/day feed.  Exactly-once de-dup across
  ARBITRARY time distances would need unbounded state; that is the
  batch layer's job.
- ``dedup_stream_by_content``: same gate keyed on the whole-document
  content fingerprint (llm/text.py), so re-crawled documents with
  different ids but identical text collapse too.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from pyspark.sql import DataFrame


def dedup_stream(
    df: "DataFrame",
    key_cols: list[str],
    ts_col: str = "event_ts",
    delay: str = "10 minutes",
) -> "DataFrame":
    """Streaming frame -> frame with duplicates (same key within the
    watermark delay) dropped; first arrival wins."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    return df.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(key_cols)


def dedup_stream_by_content(
    df: "DataFrame",
    text_col: str = "text",
    ts_col: str = "event_ts",
    delay: str = "10 minutes",
) -> "DataFrame":
    """Content-keyed ingest dedup: identical text (after whitespace/case
    normalization) collapses regardless of id.  The fingerprint column
    (``_hs_fp``) is dropped on the way out.

    NULL-text records (media-only / not-yet-fetched docs) are NOT
    duplicates of each other: ``fingerprint(NULL)`` is NULL and
    ``dropDuplicatesWithinWatermark`` treats NULL keys as equal, which
    would silently collapse every such record within the delay window to
    one — the same trap llm/dedup.py's exact_dedup documents.  They get
    a per-row unique fingerprint instead, so they always pass through."""
    from pyspark.sql import functions as F

    from hyperspace_spark.llm.text import fingerprint

    with_fp = df.withColumn(
        "_hs_fp",
        F.coalesce(
            fingerprint(F.col(text_col)),
            F.concat(F.lit("__hs_null__:"), F.expr("uuid()")),
        ),
    )
    return dedup_stream(with_fp, ["_hs_fp"], ts_col, delay).drop("_hs_fp")


def dedup_stream_against_ledger(
    df: "DataFrame",
    ledger_path: str,
    output_path: str,
    checkpoint_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "event_ts",
    delay: str = "10 minutes",
    num_buckets: int = 64,
):
    """Ingest dedup with UNBOUNDED history: the watermark gate handles
    retries/replays in-stream, then every micro-batch anti-joins the
    PERSISTED fingerprint ledger (llm/dedup.py) — documents seen in any
    prior batch, or any prior RUN of the pipeline, are dropped even
    though no streaming state remembers them.  Survivors append to
    ``output_path`` and their fingerprints fold into the ledger
    (per-bucket append, no rewrite).

    This is the missing half of dedup_stream_by_content's documented
    boundary ("exactly-once dedup across arbitrary time distances needs
    unbounded state — the batch layer's job"): corpus history lives as
    md5 hashes ON THE LAKE, bucketed by fingerprint, so each micro-batch
    pays one small shuffle of its own rows and zero shuffle on the
    ledger side — state size in the STREAM stays watermark-bounded
    regardless of corpus age.

    Failure semantics: output is written before the ledger append, so a
    crash between the two re-emits that batch's survivors on restart
    (at-least-once into ``output_path``); a downstream exact_dedup — or
    an idempotent consumer — absorbs it.  The opposite order would
    silently DROP documents instead.  Returns the started
    StreamingQuery (caller awaits termination)."""
    import os

    from hyperspace_spark.llm import dedup as batch_dedup

    # Local ledgers get their directory (and later the num_buckets
    # sidecar) up front; remote ledgers skip both — Spark writers create
    # remote dirs themselves, and the sidecar is best-effort-local
    # (callers then pass a consistent num_buckets, see
    # write_fingerprint_ledger).
    try:
        os.makedirs(batch_dedup._ledger_local(ledger_path), exist_ok=True)
    except NotImplementedError:
        pass
    gated = dedup_stream_by_content(df, text_col, ts_col, delay)

    def _sink(batch_df, _batch_id):
        spark = batch_df.sparkSession
        ledger = batch_dedup.read_fingerprint_ledger(spark, ledger_path, num_buckets)
        fresh = batch_dedup.incremental_dedup(batch_df, ledger, text_col, id_col)
        fresh = fresh.persist()
        try:
            fresh.write.mode("append").parquet(output_path)
            batch_dedup.append_fingerprint_ledger(
                spark, fresh, ledger_path, num_buckets, text_col
            )
        finally:
            fresh.unpersist()

    return (
        gated.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
