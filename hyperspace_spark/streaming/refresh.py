"""Structured-Streaming index maintenance (extension beyond the reference).

The reference has no streaming support at all (SURVEY §1.1); this module
adds the natural Spark-first extension: a `foreachBatch` sink that lands
each micro-batch into the indexed source directory and then runs an
incremental refresh, so indexes track a streaming ingest with cost
proportional to the delta (RefreshIncrementalAction semantics per batch).

Usage:

    writer = attach_index_maintenance(
        stream_df.writeStream, hs, source_dir, index_names=["my_idx"])
    q = writer.start()

At 100 TB-scale ingest rates, batch the refresh: `refresh_every` batches
skips log churn between refreshes (hybrid scan covers the gap — appended
files below the 0.3 byte-ratio threshold are compensated at query time).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from pyspark.sql.streaming import DataStreamWriter

    from hyperspace_spark.hyperspace import Hyperspace


def attach_index_maintenance(
    writer: "DataStreamWriter",
    hs: "Hyperspace",
    source_dir: str,
    index_names: list[str],
    refresh_every: int = 1,
    output_format: str = "parquet",
):
    """Wrap a streaming writer: land each micro-batch under source_dir,
    then incrementally refresh the given indexes every N batches."""
    state = {"batches": 0}

    def handle(batch_df, batch_id: int) -> None:
        batch_df.write.mode("append").format(output_format).save(source_dir)
        state["batches"] += 1
        if state["batches"] % refresh_every == 0:
            for name in index_names:
                try:
                    hs.refresh_index(name, "incremental")
                except Exception:
                    # A failed refresh must not kill the stream; the index
                    # stays queryable via hybrid scan and the next batch
                    # retries (same swallow-and-fall-back stance as the
                    # query planner).
                    pass

    return writer.foreachBatch(handle)
