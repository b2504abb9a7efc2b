"""Sequence packing: lay documents out as fixed-token-budget training
sequences (the standard "concatenate and chunk" LLM-pretraining layout).

Semantics — deterministic and engine-portable, so the placement is
reproducible run-to-run AND verifiable against a SQL oracle:

1. each document is assigned to a SHARD by a stable md5 hash of its id
   (llm/sampling.py's bucket hash — same value in Spark, DuckDB, Trino);
2. within a shard, documents are ordered by id and conceptually
   concatenated into one token stream (token count = the whitespace
   tokenizer from llm/text.py);
3. the stream is cut every ``budget_tokens``: a document starting at
   stream offset o lands in pack ``o // budget`` at offset
   ``o % budget``.  A document may STRADDLE a boundary (its tail spills
   into the next pack) — exactly how pretraining data loaders chunk a
   concatenated corpus; no padding, no partial-fill loss.

Scale shape: one shuffle (hash by shard), one window cumsum per shard —
no driver state, no iteration.  Shards bound the window's partition
size: at 100 TB pick shards so a shard's documents fit a task
(~shards >= corpus_tokens / 10^9); the cumsum is a single sequential
pass per shard either way.  Greedy first-fit packing (no straddling,
bin-packing style) intentionally NOT offered: it needs a sequential
scan with reset state per shard — expressible with applyInPandas but
non-verifiable in portable SQL and rarely what pretraining uses.

Reference note: microsoft/hyperspace has no pipeline operators; this is
part of the LLM-training extension surface (SURVEY §2 extensions).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from pyspark.sql import DataFrame


def pack_sequences(
    df: "DataFrame",
    budget_tokens: int = 2048,
    shards: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "DataFrame":
    """-> (doc_id, shard, n_tokens, pack_id, pack_offset).

    ``pack_id`` is shard-local (global pack identity = (shard, pack_id)).
    Empty/whitespace-only documents count 0 tokens and occupy no room;
    they are still placed (offset of the stream where they sit) so
    lineage joins keep working."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from hyperspace_spark.llm.sampling import hash_bucket
    from hyperspace_spark.llm.text import token_count

    if budget_tokens < 1:
        raise ValueError(f"budget_tokens must be >= 1, got {budget_tokens}")
    if shards < 1:
        raise ValueError(f"shards must be >= 1, got {shards}")

    # token_count(NULL) is NULL (or -1 under legacy sizeOfNull) — either
    # would poison the cumsum and produce NULL/negative placements.  A
    # NULL-text doc packs exactly like an empty one: 0 tokens, still
    # placed (the docstring's lineage invariant).
    n_tokens = F.greatest(
        F.lit(0).cast("long"),
        F.coalesce(token_count(F.col(text_col)).cast("long"), F.lit(0).cast("long")),
    )
    with_counts = df.select(
        F.col(id_col),
        hash_bucket(F.col(id_col), shards).alias("shard"),
        n_tokens.alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    stream_end = F.sum("n_tokens").over(w)
    offset = (stream_end - F.col("n_tokens")).alias("_off")
    return (
        with_counts.select(id_col, "shard", "n_tokens", offset)
        .select(
            id_col,
            "shard",
            "n_tokens",
            # SQL DIV: exact integral division — `/` on longs routes
            # through double and goes wrong past 2^53 total tokens,
            # breaking pack_id*budget+pack_offset == offset silently.
            F.expr(f"_off DIV {int(budget_tokens)}").alias("pack_id"),
            (F.col("_off") % budget_tokens).alias("pack_offset"),
        )
    )


def pack_stats(packed: "DataFrame", budget_tokens: int) -> "DataFrame":
    """Per-(shard, pack) fill statistics: documents touching the pack and
    tokens inside its window (straddling docs credited to EVERY pack they
    span, pro-rated).  In a chunked stream every pack except each shard's
    last is exactly full — this frame is the cheap audit of that
    invariant.  One explode over each doc's pack span (≥1 row, more only
    for docs longer than the budget), then a group-by."""
    from pyspark.sql import functions as F

    b = int(budget_tokens)
    doc_start = F.col("pack_id") * budget_tokens + F.col("pack_offset")
    doc_end = doc_start + F.col("n_tokens")  # exclusive
    last_pack = F.when(
        F.col("n_tokens") > 0,
        # integral DIV for the same 2^53 exactness reason as pack_sequences
        F.expr(f"(pack_id * {b} + pack_offset + n_tokens - 1) DIV {b}"),
    ).otherwise(F.col("pack_id"))
    spanned = packed.select(
        "shard",
        doc_start.alias("_ds"),
        doc_end.alias("_de"),
        F.explode(F.sequence(F.col("pack_id"), last_pack)).alias("pack_id"),
    )
    win_start = F.col("pack_id") * budget_tokens
    win_end = win_start + budget_tokens
    in_window = F.greatest(
        F.lit(0), F.least(F.col("_de"), win_end) - F.greatest(F.col("_ds"), win_start)
    )
    return (
        spanned.groupBy("shard", "pack_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(in_window).alias("tokens_in_pack"),
        )
        .withColumn("fill", F.round(F.col("tokens_in_pack") / budget_tokens, 6))
    )
