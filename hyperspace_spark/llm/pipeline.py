"""Composable corpus-cleaning pipeline — the C4/Gopher-style filter
chain a pretraining pipeline runs as its FIRST pass, composed from the
operators this package already verifies individually (llm/text.py
quality heuristics, llm/repetition.py repetition metrics).

``clean_corpus`` tags every document with its first failing rule (or
NULL when it survives) instead of silently dropping rows: the census of
drop reasons is the artifact data teams actually review before
committing a corpus, and keeping rejects queryable makes the filter
auditable and re-runnable with different thresholds.

Rule order (first hit wins — deliberately from cheapest/most-decisive
to most expensive to EXPLAIN, though all are computed in one pass):

1. ``null_text``    text IS NULL (not certifiably clean)
2. ``too_short``    trimmed length < min_chars
3. ``too_long``     trimmed length > max_chars
4. ``bad_lang``     language_id not in allowed_langs (only if given)
5. ``repetitive``   dup_line_frac or top_2gram_frac over threshold
6. ``low_quality``  quality_score < min_quality

Scale shape: the length/lang/quality rules are pure JVM expressions on
the scan; the repetition metrics are one zero-shuffle Arrow kernel run
ONLY over rows surviving the cheap gates; the only shuffles are the
per-id metric aggregate (which also makes duplicate ids safe — the
join side is unique, so rows can't multiply) and the doc_id equi-join
stitching the two back together (broadcastable when few rows survive
the cheap gates; AQE picks).  Nothing iterates, nothing collects.

Reference note: microsoft/hyperspace has no document operators; this is
part of the LLM-training extension surface (SURVEY §2 extensions).
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Sequence

if TYPE_CHECKING:
    from pyspark.sql import DataFrame


def clean_corpus(
    df: "DataFrame",
    min_chars: int = 100,
    max_chars: int = 20000,
    allowed_langs: Sequence[str] | None = None,
    max_dup_line_frac: float = 0.3,
    max_top_2gram_frac: float = 0.2,
    min_quality: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "DataFrame":
    """df + ``drop_reason`` column (NULL = kept).  Filter with
    ``.filter("drop_reason IS NULL")``; census with
    ``.groupBy("drop_reason").count()``."""
    from pyspark.sql import functions as F

    from hyperspace_spark.llm.repetition import repetition_stats
    from hyperspace_spark.llm.text import language_id, quality_score

    reserved = {"_hs_cheap", "_hs_dlf", "_hs_t2f"}
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(
            f"clean_corpus reserves column names {sorted(clash)}; rename them"
        )

    t = F.col(text_col)
    n = F.length(F.trim(t))

    # Cheap JVM gates first; the repetition kernel then runs ONLY over
    # rows that survive them — their metrics are never consulted for
    # already-rejected rows, which shrinks the kernel input and the
    # join.  (With DUPLICATE ids this is also a semantic choice, not
    # just an optimization: a twin row rejected for length does not feed
    # the shared per-id max, so it can't drag its sibling into
    # 'repetitive'.)
    cheap = F.when(t.isNull(), "null_text").when(n < min_chars, "too_short").when(
        n > max_chars, "too_long"
    )
    if allowed_langs is not None:
        cheap = cheap.when(~language_id(t).isin(list(allowed_langs)), "bad_lang")
    cheap = cheap.otherwise(F.lit(None).cast("string"))
    with_cheap = df.withColumn("_hs_cheap", cheap)

    # Internal aliases (validated against the input above); max per id
    # (worst-case repetition) so duplicate ids — clean_corpus runs
    # BEFORE dedup — can't multiply rows through the join.
    rep = (
        repetition_stats(
            with_cheap.filter(F.col("_hs_cheap").isNull()), text_col, id_col
        )
        .groupBy("doc_id")
        .agg(
            F.max("dup_line_frac").alias("_hs_dlf"),
            F.max("top_2gram_frac").alias("_hs_t2f"),
        )
        .withColumnRenamed("doc_id", id_col)
    )
    joined = with_cheap.join(rep, id_col, "left")

    reason = F.coalesce(
        F.col("_hs_cheap"),
        F.when(
            (F.coalesce(F.col("_hs_dlf"), F.lit(0.0)) > max_dup_line_frac)
            | (F.coalesce(F.col("_hs_t2f"), F.lit(0.0)) > max_top_2gram_frac),
            "repetitive",
        ).when(quality_score(t) < min_quality, "low_quality"),
    )
    return joined.withColumn("drop_reason", reason).drop(
        "_hs_cheap", "_hs_dlf", "_hs_t2f"
    )
