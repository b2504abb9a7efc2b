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


def ensure_stable(hs: "Hyperspace", name: str) -> None:
    """If a failure stranded the index in a transient state (REFRESHING /
    OPTIMIZING / ...), cancel back to the last stable log entry so the next
    refresh_index's ACTIVE requirement passes.  Without this, one mid-refresh
    crash would permanently stop index maintenance: every later
    refresh_index raises at the ACTIVE check and gets swallowed."""
    from hyperspace_spark.metadata.entry import States

    mgr = hs._log_mgr(name, hs.conf())
    latest = mgr.get_latest_log()
    if latest is not None and latest.state not in States.STABLE:
        hs.cancel(name)


def make_maintenance_handler(
    hs: "Hyperspace",
    source_dir: str,
    index_names: list[str],
    refresh_every: int = 1,
    output_format: str = "parquet",
):
    """Build the foreachBatch handler (exposed separately for testability)."""
    state = {"batches": 0}

    def handle(batch_df, batch_id: int) -> None:
        batch_df.write.mode("append").format(output_format).save(source_dir)
        state["batches"] += 1
        if state["batches"] % refresh_every == 0:
            for name in index_names:
                try:
                    ensure_stable(hs, name)
                    hs.refresh_index(name, "incremental")
                except Exception:
                    # A failed refresh must not kill the stream; the index
                    # stays queryable via hybrid scan.  Roll back any
                    # transient state the failure left behind so the next
                    # batch's retry can actually proceed.
                    try:
                        ensure_stable(hs, name)
                    except Exception:
                        pass

    return handle


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
    return writer.foreachBatch(
        make_maintenance_handler(hs, source_dir, index_names, refresh_every, output_format)
    )
