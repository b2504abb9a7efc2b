"""Deterministic training-shard export — the last stage of the
pipeline this package builds (dedup → clean_corpus → mixture/quota →
pack_sequences → EXPORT): write the corpus as content-addressed shards
whose membership is a pure function of each document's id, with a
manifest frame for the training loader.

Why not `df.write.parquet(out)` directly:

- shard membership must survive re-partitioning, engine migrations and
  incremental re-exports (a doc re-exported tomorrow lands in the SAME
  shard — loaders resume, caches stay valid).  `hash_bucket` (md5) is
  that function; Spark's task split is not.
- training loaders want a MANIFEST (shard → docs, tokens, bytes) to
  plan epochs and balance workers without listing/opening files.

Scale shape: one hash repartition by shard (the unavoidable shuffle —
it IS the layout), `partitionBy` write so each shard is its own
directory, manifest as one group-by over the already-sharded frame.
Shard count controls file sizes exactly like bucket counts do for
indexes: pick shards ≈ corpus_bytes / 1 GB.

Reference note: microsoft/hyperspace has no export operators; this is
part of the LLM-training extension surface (SURVEY §2 extensions).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from pyspark.sql import DataFrame


def write_training_shards(
    df: "DataFrame",
    out_dir: str,
    shards: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "error",
) -> "DataFrame":
    """Write df as ``out_dir/shard=N/*.parquet`` (one file per shard)
    and return the manifest frame (shard, n_docs, n_tokens, n_chars).

    The manifest is aggregated from the WRITTEN shard directories (a
    re-read of the output, which is cheap columnar metadata + the text
    column), never from the input lineage: recomputing the lineage
    would re-run the whole upstream pipeline — hashing + tokenization
    over the full corpus a second time at the largest-data stage — and
    could even disagree with what was written if any upstream stage is
    nondeterministic.  Shard assignment is engine-portable md5 —
    re-running the export over the same corpus reproduces both layout
    and manifest bit-for-bit."""
    from pyspark.sql import functions as F

    from hyperspace_spark.llm.sampling import hash_bucket
    from hyperspace_spark.llm.text import token_count

    if shards < 1:
        raise ValueError(f"shards must be >= 1, got {shards}")
    if "shard" in df.columns:
        raise ValueError("write_training_shards reserves the 'shard' column")

    sharded = df.withColumn("shard", hash_bucket(F.col(id_col), shards))
    # one file per shard: repartition BY the shard column so each task
    # owns whole shards, then partitionBy splits directories
    sharded.repartition(shards, "shard").write.partitionBy("shard").mode(
        mode
    ).parquet(out_dir)
    written = df.sparkSession.read.parquet(out_dir)
    n_tokens = F.coalesce(token_count(F.col(text_col)).cast("long"), F.lit(0))
    return (
        written.groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(n_tokens).alias("n_tokens"),
            F.sum(F.coalesce(F.length(text_col), F.lit(0))).alias("n_chars"),
        )
        .orderBy("shard")
    )
