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


def ensure_stable(hs: "Hyperspace", name: str, stale_after_sec: float | None = None) -> None:
    """If a failure stranded the index in a transient state (REFRESHING /
    OPTIMIZING / ...), cancel back to the last stable log entry so the next
    refresh_index's ACTIVE requirement passes.  Without this, one mid-refresh
    crash would permanently stop index maintenance: every later
    refresh_index raises at the ACTIVE check and gets swallowed.

    Only entries older than ``stale_after_sec`` are cancelled: a FRESH
    transient entry is very likely a legitimate concurrent maintenance op
    (a user's optimize/refresh racing the stream) — cancelling it would
    consume the next log id and make the racer's completing write fail
    with ConcurrentModificationError, discarding its work.  A crashed
    op's entry, by contrast, only grows older.  Pass 0 to cancel
    unconditionally (the crash-recovery path in the batch handler's
    except clause, where the failed op is provably OURS).

    ``None`` (default) reads spark.hyperspace.maintenance.staleAfterSeconds
    (default 600) — deployments whose maintenance ops can legitimately run
    longer than 10 minutes MUST raise it above the worst-case op duration
    (or have long ops heartbeat their transient log file's mtime)."""
    import os
    import time

    from hyperspace_spark.metadata.entry import States

    conf = hs.conf()  # from_session re-reads every conf key: bind once
    if stale_after_sec is None:
        stale_after_sec = conf.maintenance_stale_after_sec
    mgr = hs._log_mgr(name, conf)
    latest = mgr.get_latest_log()
    if latest is None or latest.state in States.STABLE:
        return
    if stale_after_sec > 0:
        try:
            path = mgr.log_path(latest.id)
            age = time.time() - os.path.getmtime(path)
        except Exception:
            age = float("inf")  # can't date it: treat as stale (old behavior)
        if age < stale_after_sec:
            return  # fresh transient state: assume a live op, leave it alone
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
        # foreachBatch is AT-LEAST-ONCE: a crash between the write and the
        # stream's checkpoint commit re-delivers the same batch_id on
        # restart.  A plain mode("append") would then land the same rows
        # twice and every downstream query silently double-counts.  Make
        # redelivery idempotent: write to a hidden staging dir (the "_"
        # prefix keeps Spark listings away from partial output), delete
        # any files a previous delivery of THIS batch_id left behind,
        # then move the new files in under deterministic
        # batch<id>-<n>-... names.  os-level ops suffice for the local
        # filesystems this repo targets; an object-store deployment would
        # route the same delete+rename through a FileSystem shim.
        import glob
        import os
        import shutil

        staging = os.path.join(source_dir, f"_hs_stage_{batch_id}")
        batch_df.write.mode("overwrite").format(output_format).save(staging)
        # glob.escape: a '[', '?' or '*' in source_dir would otherwise be
        # treated as a pattern, silently matching nothing and leaving a
        # prior partial delivery's files to double-count downstream.
        for old in glob.glob(
            os.path.join(glob.escape(source_dir), f"batch{batch_id:010d}-*")
        ):
            os.remove(old)
        moved = 0
        for f in sorted(os.listdir(staging)):
            if f.startswith(("_", ".")):
                continue
            os.replace(
                os.path.join(staging, f),
                os.path.join(source_dir, f"batch{batch_id:010d}-{moved:04d}-{f}"),
            )
            moved += 1
        shutil.rmtree(staging, ignore_errors=True)
        state["batches"] += 1
        if state["batches"] % refresh_every == 0:
            for name in index_names:
                try:
                    ensure_stable(hs, name)
                    hs.refresh_index(name, "incremental")
                except Exception:
                    # A failed refresh must not kill the stream; the
                    # index stays queryable via hybrid scan.  Roll the
                    # transient state back UNCONDITIONALLY and retry once
                    # in this batch: a maintenance stream owns its
                    # indexes' lifecycle, so a non-ACTIVE state at this
                    # point is either our own crash leftover or a
                    # colliding manual op — self-healing in one batch is
                    # the contract (the staleness guard above still stops
                    # the COMMON case of cancelling a live op when no
                    # refresh failure occurred).
                    try:
                        ensure_stable(hs, name, stale_after_sec=0)
                        hs.refresh_index(name, "incremental")
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


# ---------------------------------------------------------------------------
# enable()-routed writeStream: automatic index maintenance (r9).
#
# A session-enabled user who writeStream.start(path)s into a directory
# that IS the source of active indexes used to get only a one-time
# "unrouted" telemetry breadcrumb — the indexes silently staled (hybrid
# scan compensated until the 0.3 appended-byte threshold, then queries
# lost acceleration entirely).  Now Hyperspace.enable() patches
# DataStreamWriter.start to look the sink path up against every active
# index's source roots and, on a match, registers the query with a
# StreamingQueryListener that runs an incremental refresh after each
# micro-batch that moved rows — the same self-healing discipline as the
# foreachBatch handler above, without the user wiring anything.
# ---------------------------------------------------------------------------

_AUTO_MAINT: dict = {}  # streaming query id (str) -> (hs, [index names])


def _norm_sink_path(p: str) -> str:
    import os

    # ONE copy of the file:-scheme contract (sources/registry.py owns
    # it) — a scheme-handling fix applied to a private duplicate would
    # desync sink matching from source listing.
    from hyperspace_spark.sources.registry import _strip_file_scheme

    return os.path.abspath(_strip_file_scheme(p)).rstrip("/")


def indexes_rooted_at(hs: "Hyperspace", sink_path: str) -> list[str]:
    """Names of ACTIVE indexes whose source root is ``sink_path``."""
    target = _norm_sink_path(sink_path)
    names = []
    for entry in hs._active_entries(hs.conf()):
        try:
            roots = entry.relations[0].root_paths
        except Exception:
            continue
        if any(_norm_sink_path(r) == target for r in roots):
            names.append(entry.name)
    return names


def _make_listener():
    from pyspark.sql.streaming.listener import StreamingQueryListener

    class _AutoMaintenanceListener(StreamingQueryListener):
        def onQueryStarted(self, event):
            pass

        def onQueryIdle(self, event):
            pass

        def onQueryProgress(self, event):
            reg = _AUTO_MAINT.get(str(event.progress.id))
            if not reg:
                return
            if not event.progress.numInputRows:
                return  # empty trigger: nothing landed, nothing to refresh
            hs, names = reg
            for name in names:
                try:
                    ensure_stable(hs, name)
                    hs.refresh_index(name, "incremental")
                except Exception:
                    # Same self-heal contract as make_maintenance_handler:
                    # a failed refresh must neither kill the stream nor
                    # permanently strand the index in a transient state.
                    try:
                        ensure_stable(hs, name, stale_after_sec=0)
                        hs.refresh_index(name, "incremental")
                    except Exception:
                        pass

        def onQueryTerminated(self, event):
            _AUTO_MAINT.pop(str(event.id), None)

    return _AutoMaintenanceListener()


def register_auto_maintenance(spark, query, hs: "Hyperspace", index_names: list[str]) -> None:
    """Attach the per-session listener (once) and enrol ``query``."""
    if getattr(spark, "_hs_maint_listener", None) is None:
        listener = _make_listener()
        spark.streams.addListener(listener)
        spark._hs_maint_listener = listener
    _AUTO_MAINT[str(query.id)] = (hs, list(index_names))


def unregister_session(spark) -> None:
    """disable() hook: detach the listener and forget its queries.

    The enrolment entries MUST go too: with the listener gone,
    onQueryTerminated never fires for in-flight queries, so their
    entries would leak forever — and a later enable() with a DIFFERENT
    Hyperspace instance would resume maintenance through the stale hs
    the user thought was disabled."""
    listener = getattr(spark, "_hs_maint_listener", None)
    if listener is not None:
        try:
            spark.streams.removeListener(listener)
        except Exception:
            pass
        spark._hs_maint_listener = None
    for qid, (hs, _names) in list(_AUTO_MAINT.items()):
        if getattr(hs, "spark", None) is spark:
            _AUTO_MAINT.pop(qid, None)
