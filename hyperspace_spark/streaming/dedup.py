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
