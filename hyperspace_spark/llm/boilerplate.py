"""Corpus-level line-frequency boilerplate removal — the CCNet
(Wenzek et al., LREC'20 §3 "deduplicating lines") / RefinedWeb
(Penedo et al., NeurIPS'23 "line-wise corrections") cleaning stage a
pretraining pipeline runs between per-document quality filters and
document-level dedup: a LINE whose normalized form occurs in many
DISTINCT documents is navigation chrome, cookie banners, share buttons,
or license boilerplate — it is removed from every document while the
documents themselves survive.

This is the cross-document complement of ``llm/repetition.py`` (which
scores repetition WITHIN one document) and differs from
``dedup.paragraph_dedup`` (which keeps the globally FIRST occurrence of
every paragraph): here a line above the document-frequency threshold is
removed from ALL documents including the first, and lines below it are
kept everywhere.

Scale shape (the canonical 100 TB layout):

1. posexplode lines — narrow, scan-speed.
2. document frequency = distinct-(doc,key) then key-keyed count — two
   keyed shuffles with map-side partials; the (doc,key) distinct is the
   same cost class as the shingle pass in ``dedup.ngram_jaccard_pairs``.
3. anti-join lines against the hot-key set — key-keyed equi join; the
   hot set is the OUTPUT of an aggregate with a HAVING-style filter, so
   AQE broadcasts it when small, and a mega-hot line (a cookie banner in
   10^9 docs) is linear work in its partition (rows are only dropped,
   never pair-joined — no quadratic blowup, unlike LSH buckets which
   need ``max_bucket_size`` caps).
4. per-document reassembly — one doc-keyed shuffle, same as
   ``paragraph_dedup``.

Normalization before hashing (lowercase, trim, collapse internal
whitespace) is exactly re-playable in DuckDB for the oracle; keys are
md5 of the normalized line so the frequency shuffle carries 32-byte
keys, not full lines.

Reference note: microsoft/hyperspace has no document operators; this is
part of the LLM-training extension surface (SURVEY §2 extensions).
"""

from __future__ import annotations

import re
from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from pyspark.sql import DataFrame


def _norm_line(line_col):
    """lower(trim(collapse-whitespace)) — the normalized form whose md5
    is the line's corpus-frequency key.  '\\s+' means the same thing in
    Java regex (Spark) and RE2 (DuckDB), which is what keeps the oracle
    bit-identical."""
    from pyspark.sql import functions as F

    return F.lower(F.trim(F.regexp_replace(line_col, r"\s+", " ")))


def line_doc_freq(
    df: "DataFrame",
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    min_norm_chars: int = 1,
) -> "DataFrame":
    """-> (line_key, line_norm, doc_freq): corpus-wide document
    frequency of every distinct normalized line (lines whose normalized
    form is shorter than ``min_norm_chars`` — e.g. blank lines — are
    structural, not content, and are excluded).  ``doc_freq`` counts
    DISTINCT documents, so a document repeating its own footer 50 times
    contributes 1 — the metric a removal threshold should be judged
    against (within-document repetition is llm/repetition.py's job).

    This is the inspection half of the operator: run it first, look at
    the top of the distribution, pick ``min_doc_freq`` for
    :func:`remove_boilerplate_lines`.  At scale, persist it — it is the
    expensive pass, and the removal join can reuse it via the
    ``freq_df`` parameter."""
    from pyspark.sql import functions as F

    lines = df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("_hs_doc"),
        F.explode(F.split(F.col(text_col), re.escape(sep), -1)).alias("_hs_line"),
    )
    normed = lines.select(
        "_hs_doc", _norm_line(F.col("_hs_line")).alias("line_norm")
    ).where(F.length("line_norm") >= min_norm_chars)
    return (
        normed.select("_hs_doc", F.md5("line_norm").alias("line_key"), "line_norm")
        .dropDuplicates(["_hs_doc", "line_key"])
        .groupBy("line_key")
        .agg(
            F.first("line_norm").alias("line_norm"),
            F.count("*").alias("doc_freq"),
        )
    )


def remove_boilerplate_lines(
    df: "DataFrame",
    min_doc_freq: int | None = None,
    min_doc_frac: float | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    min_norm_chars: int = 1,
    freq_df: "DataFrame | None" = None,
) -> "DataFrame":
    """-> (id_col, text_col) with every line whose normalized form
    appears in ``>= min_doc_freq`` distinct documents removed from ALL
    documents; surviving lines keep their order and original (un-
    normalized) spelling.  NULL text stays NULL (same contract as
    ``paragraph_dedup`` — a missing document must not become a mutual
    exact duplicate of every other missing document); a document whose
    every line was boilerplate becomes ''.

    Exactly one of ``min_doc_freq`` / ``min_doc_frac`` is required.
    ``min_doc_frac`` expresses the threshold as a fraction of the
    corpus's non-null document count — the scale-free form (0.5 means
    "appears in at least half of all documents"), computed as a 1-row
    aggregate that rides the plan as a broadcast, never a driver
    collect, so the same pipeline definition is correct at sf0.001 and
    at 100 TB without retuning.

    Pass ``freq_df`` (a persisted :func:`line_doc_freq` result) to skip
    recomputing the frequency pass — the production shape when the same
    frequency table drives both inspection and removal.
    """
    from pyspark.sql import functions as F

    if (min_doc_freq is None) == (min_doc_frac is None):
        raise ValueError("exactly one of min_doc_freq / min_doc_frac is required")
    if min_doc_freq is not None and min_doc_freq < 2:
        raise ValueError("min_doc_freq must be >= 2 (1 would remove every line)")
    if min_doc_frac is not None and not (0.0 < min_doc_frac <= 1.0):
        raise ValueError("min_doc_frac must be in (0, 1]")

    if freq_df is None:
        freq_df = line_doc_freq(
            df,
            text_col=text_col,
            id_col=id_col,
            sep=sep,
            min_norm_chars=min_norm_chars,
        )

    if min_doc_freq is not None:
        hot = freq_df.where(F.col("doc_freq") >= min_doc_freq)
    else:
        ndocs = (
            df.where(F.col(text_col).isNotNull())
            .agg(F.count("*").alias("_hs_ndocs"))
        )
        # Same >=2 floor the absolute path validates: on a tiny corpus
        # ndocs * frac can drop to <=1, and doc_freq >= 1 holds for
        # EVERY line — the scale-free threshold must never blank the
        # whole corpus just because it is small.
        hot = (
            freq_df.crossJoin(F.broadcast(ndocs))
            .where(
                F.col("doc_freq")
                >= F.greatest(
                    F.lit(2.0), F.col("_hs_ndocs") * F.lit(min_doc_frac)
                )
            )
        )
    hot = hot.select("line_key")

    lines = df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("_hs_doc"),
        F.posexplode(F.split(F.col(text_col), re.escape(sep), -1)).alias(
            "_hs_pos", "_hs_line"
        ),
    )
    # Lines below min_norm_chars are never in `hot` (line_doc_freq
    # filtered them), and an md5 collision between a short and a hot
    # line would require equal normalized text — impossible at different
    # lengths — so a plain anti-join on the key is exact.
    kept = lines.withColumn(
        "line_key", F.md5(_norm_line(F.col("_hs_line")))
    ).join(hot, "line_key", "left_anti")

    rebuilt = kept.groupBy(F.col("_hs_doc").alias(id_col)).agg(
        F.concat_ws(
            sep,
            F.transform(
                F.array_sort(F.collect_list(F.struct("_hs_pos", "_hs_line"))),
                lambda x: x["_hs_line"],
            ),
        ).alias(text_col)
    )
    from hyperspace_spark.llm.dedup import rejoin_text_preserving_null

    return rejoin_text_preserving_null(df, rebuilt, id_col, text_col)
