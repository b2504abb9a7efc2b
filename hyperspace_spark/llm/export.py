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

    The manifest is aggregated from the files THIS CALL wrote (a
    re-read of just those paths, which is cheap columnar metadata + the
    text column), never from the input lineage: recomputing the lineage
    would re-run the whole upstream pipeline — hashing + tokenization
    over the full corpus a second time at the largest-data stage — and
    could even disagree with what was written if any upstream stage is
    nondeterministic.  Under ``mode='append'`` the manifest therefore
    describes ONLY this batch (sum manifests across calls for the
    directory total); under overwrite/error it equals the directory.
    Caveats to both claims: the batch is identified by a before/after
    listing diff, so it assumes a SINGLE writer per out_dir (a
    concurrent appender's files landing mid-write would be attributed
    to this manifest), and under
    ``spark.sql.sources.partitionOverwriteMode=dynamic`` an overwrite
    only replaces the shard directories this batch touches — the
    manifest then describes the rewritten shards, not untouched stale
    ones.  Shard assignment is engine-portable md5 — re-running the
    export over the same corpus reproduces both layout and manifest
    bit-for-bit."""
    from pyspark.sql import functions as F

    from hyperspace_spark.llm.sampling import hash_bucket
    from hyperspace_spark.llm.text import token_count

    if shards < 1:
        raise ValueError(f"shards must be >= 1, got {shards}")
    if "shard" in df.columns:
        raise ValueError("write_training_shards reserves the 'shard' column")

    spark = df.sparkSession

    def _data_files() -> set[str]:
        # The shared FS abstraction (fs.py): local fast path when
        # out_dir is a local dir, Hadoop FileSystem RPC sweep for
        # object-store URIs — one driver-side metadata listing, the
        # same class of op Spark performs at planning.
        from hyperspace_spark.fs import filesystem_for

        return {
            st.path
            for st in filesystem_for(out_dir, spark).list_files_recursive(out_dir)
        }

    before = _data_files()
    sharded = df.withColumn("shard", hash_bucket(F.col(id_col), shards))
    # one file per shard: repartition BY the shard column so each task
    # owns whole shards, then partitionBy splits directories
    sharded.repartition(shards, "shard").write.partitionBy("shard").mode(
        mode
    ).parquet(out_dir)
    # Subtracting `before` is correct for every mode: append keeps old
    # files (manifest = this batch), overwrite deletes them and part
    # names are job-unique (manifest = everything), error implies an
    # empty dir, and ignore-with-existing-dir writes nothing (manifest
    # = explicitly empty, not a description of old data).
    new_files = sorted(_data_files() - before)
    if not new_files:
        # Nothing was written (mode='ignore' on an existing dir, or an
        # empty input batch): an explicitly EMPTY manifest with the
        # contract schema — never a read of the (possibly file-less)
        # directory, which would raise UNABLE_TO_INFER_SCHEMA.
        return spark.createDataFrame(
            [], "shard int, n_docs long, n_tokens long, n_chars long"
        )
    written = spark.read.option("basePath", out_dir).parquet(*new_files)
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
