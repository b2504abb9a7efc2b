"""Pluggable source providers (chain of responsibility).

Reference: FileBasedSourceProviderManager
(index/sources/FileBasedSourceProviderManager.scala:1-174, config
`spark.hyperspace.index.sources.fileBasedBuilders`) with Default, Delta
and Iceberg builders.  The provider owns source-specific behavior:

- which relations it supports,
- how to enumerate the live data files backing a scan,
- how to fingerprint the source (default: md5 over per-file metadata;
  Delta: table version + path; Iceberg: snapshot id + location).

The default file-based provider covers parquet/csv/json/orc/text/avro.
Delta/Iceberg providers follow the documented snapshot-signature
contracts but raise at use unless their libraries are installed (not
present in this environment).
"""

from __future__ import annotations

import os
from typing import TYPE_CHECKING

from hyperspace_spark.metadata.entry import FileInfo
from hyperspace_spark.metadata.signature import file_based_signature

if TYPE_CHECKING:
    from hyperspace_spark.fs import FileSystem
    from hyperspace_spark.planner import ir


def _strip_file_scheme(p: str) -> str:
    if p.startswith("file://"):
        return p[len("file://"):]
    if p.startswith("file:"):
        return p[len("file:"):]
    return p


def _stream_sink_manifest_files(root: str) -> "list[FileInfo] | None":
    """Committed files of a Structured-Streaming FileStreamSink dir, or
    None when ``root`` is a plain directory (no ``_spark_metadata``).

    Replays the sink's own log the way Spark's FileStreamSinkLog does:
    start from the latest ``.compact`` snapshot (if any), then apply the
    later per-batch files in id order; each non-header line is one JSON
    SinkFileStatus whose ``action`` is add (or delete, from compaction
    retention).  Size/modificationTime come from the MANIFEST, not a
    stat — the same values every other live_files call sees, so file
    keys (path, size, mtime) stay stable across create/refresh/query.

    Local-filesystem implementation (this repo's FileSystem targets);
    any parse failure falls back to plain listing via None... except a
    present-but-unreadable log, where returning None would silently
    widen the file set beyond what Spark reads — raise instead."""
    meta = os.path.join(_strip_file_scheme(root), "_spark_metadata")
    if not os.path.isdir(meta):
        return None
    import json

    batches = []
    for name in os.listdir(meta):
        if name.startswith((".", "_")):
            continue
        base = name[:-len(".compact")] if name.endswith(".compact") else name
        try:
            bid = int(base)
        except ValueError:
            continue
        batches.append((bid, name.endswith(".compact"), name))
    if not batches:
        return []
    compacts = [b for b in batches if b[1]]
    latest_compact = max(compacts) if compacts else None
    start = latest_compact[0] if latest_compact else -1
    selected = ([latest_compact] if latest_compact else []) + sorted(
        b for b in batches if not b[1] and b[0] > start
    )
    files: dict[str, FileInfo] = {}
    for _bid, _isc, name in selected:
        with open(os.path.join(meta, name)) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("v"):
                    continue
                d = json.loads(line)
                p = _strip_file_scheme(d["path"])
                if d.get("action") == "delete":
                    files.pop(p, None)
                else:
                    files[p] = FileInfo(
                        p, int(d.get("size", 0)), int(d.get("modificationTime", 0))
                    )
    return sorted(files.values(), key=lambda f: f.path)


class SourceProvider:
    """One source family's behavior; chain order decides precedence."""

    name = "abstract"

    def supports(self, scan: "ir.Scan") -> bool:
        raise NotImplementedError

    def live_files(self, scan: "ir.Scan", fs: "FileSystem") -> list[FileInfo]:
        raise NotImplementedError

    def signature(self, scan: "ir.Scan", files: list[FileInfo]) -> str:
        raise NotImplementedError


class FileBasedSourceProvider(SourceProvider):
    """Default lake formats (reference: DefaultFileBasedSource.scala,
    formats list util/HyperspaceConf.scala:110-115)."""

    name = "default"
    FORMATS = {"parquet", "csv", "json", "orc", "text", "avro"}

    def supports(self, scan: "ir.Scan") -> bool:
        return scan.file_format in self.FORMATS

    def live_files(self, scan: "ir.Scan", fs: "FileSystem") -> list[FileInfo]:
        out: list[FileInfo] = []
        for p in scan.normalized_paths():
            manifest = _stream_sink_manifest_files(p)
            if manifest is not None:
                # FileStreamSink output dir: Spark's own reads are
                # manifest-scoped (only files the sink COMMITTED exist;
                # pre-existing files and orphans from failed tasks are
                # invisible).  The index must adopt the same view or its
                # scan returns rows the raw plan would never produce.
                out.extend(manifest)
                continue
            for st in fs.list_files_recursive(p):
                out.append(FileInfo(st.path, st.size, st.mtime))
        return out

    def signature(self, scan: "ir.Scan", files: list[FileInfo]) -> str:
        return file_based_signature(files)


class DeltaLakeSourceProvider(SourceProvider):
    """Delta tables, via the open `_delta_log` protocol (sources/delta.py
    — no delta-spark needed).  Signature = table path + version so time
    travel maps index versions to table versions (reference:
    DeltaLakeRelation.scala:40-43, closestIndex :179-215).

    A scan qualifies when its paths live under a `_delta_log` table root
    (the parser marks `scan.delta_root`).  Live files come from the scan's
    own pinned file list when the scan reads explicit files (query time,
    possibly time-traveled), or from the latest snapshot's replay when the
    scan is the table root (index create/refresh) — never from a directory
    listing, so dead files are invisible and at scale enumeration is
    O(log), not O(list calls)."""

    name = "delta"

    def supports(self, scan: "ir.Scan") -> bool:
        return bool(getattr(scan, "delta_root", None))

    def live_files(self, scan: "ir.Scan", fs: "FileSystem") -> list[FileInfo]:
        """FileInfo straight from the LOG's add actions — zero per-file
        filesystem calls on either the create path (table-root scan →
        current snapshot) or the query path (pinned file list → size/mtime
        looked up in the one-pass all-adds map)."""
        from hyperspace_spark.sources.delta import DeltaLog, strip_scheme

        root = strip_scheme(scan.delta_root)
        log = DeltaLog(root)
        paths = [strip_scheme(p) for p in scan.root_paths]
        if paths == [root]:
            snap = log.snapshot()
            return [
                FileInfo(os.path.join(root, rel), size, mtime)
                for rel, (size, mtime) in sorted(snap.adds.items())
            ]
        meta = log.all_adds()
        by_abs = {os.path.join(root, rel): sm for rel, sm in meta.items()}
        out: list[FileInfo] = []
        for p in paths:
            sm = by_abs.get(p)
            if sm is not None:
                out.append(FileInfo(p, sm[0], sm[1]))
            else:  # not log-tracked (shouldn't happen): stat as fallback
                for st in fs.list_files_recursive(p):
                    out.append(FileInfo(st.path, st.size, st.mtime))
        return out

    def signature(self, scan: "ir.Scan", files: list[FileInfo]) -> str:
        """md5(root + version-whose-file-set-matches), resolved from ONE
        forward log replay (version_file_sets); falls back to the per-file
        signature for a file set no single version produced."""
        import hashlib

        from hyperspace_spark.sources.delta import DeltaLog, strip_scheme

        root = strip_scheme(scan.delta_root)
        got = frozenset(strip_scheme(f.path) for f in files)
        for v, fileset in reversed(DeltaLog(root).version_file_sets()):
            if fileset == got:
                return hashlib.md5(f"delta:{root}@{v}".encode()).hexdigest()
        return file_based_signature(files)


class IcebergSourceProvider(SourceProvider):
    """Iceberg tables via the open table spec (sources/iceberg.py — no
    iceberg runtime needed).  Signature = table location + snapshot id
    (reference: IcebergRelation.scala:65-74); live files come from the
    scan's pinned list (query time) or the current snapshot's manifests
    (create/refresh) — never a directory listing."""

    name = "iceberg"

    def supports(self, scan: "ir.Scan") -> bool:
        return bool(getattr(scan, "iceberg_root", None))

    def live_files(self, scan: "ir.Scan", fs: "FileSystem") -> list[FileInfo]:
        """FileInfo from the manifests (file_size_in_bytes; mtime pinned
        to 0 on BOTH build and query paths — manifests carry no mtime, and
        identity only needs build/query consistency) — zero per-file
        filesystem calls.  Manifest avro reads are cached per path
        (immutable files), so repeated planning is O(new manifests)."""
        from hyperspace_spark.sources.delta import strip_scheme
        from hyperspace_spark.sources.iceberg import IcebergTable

        root = strip_scheme(scan.iceberg_root)
        tbl = IcebergTable(root)
        paths = [strip_scheme(p) for p in scan.root_paths]
        if paths == [root]:
            snap = tbl.snapshot()
            return [FileInfo(p, snap.files[p], 0) for p in snap.file_paths()]
        sizes = tbl.all_file_sizes()
        out: list[FileInfo] = []
        for p in paths:
            size = sizes.get(p)
            if size is not None:
                out.append(FileInfo(p, size, 0))
            else:  # not manifest-tracked (shouldn't happen): stat fallback
                for st in fs.list_files_recursive(p):
                    out.append(FileInfo(st.path, st.size, 0))
        return out

    def signature(self, scan: "ir.Scan", files: list[FileInfo]) -> str:
        import hashlib

        from hyperspace_spark.sources.delta import strip_scheme
        from hyperspace_spark.sources.iceberg import IcebergTable

        root = strip_scheme(scan.iceberg_root)
        tbl = IcebergTable(root)
        got = {strip_scheme(f.path) for f in files}
        md = tbl.metadata()
        ordered = sorted(
            md.get("snapshots", []), key=lambda s: s.get("timestamp-ms", 0), reverse=True
        )
        # Manifest reads are cached, so walking snapshots newest-first is
        # O(total distinct manifests), not O(snapshots × manifests).
        for s in ordered:
            snap = tbl.snapshot(int(s["snapshot-id"]))
            if set(snap.file_paths()) == got:
                return hashlib.md5(f"iceberg:{root}@{snap.snapshot_id}".encode()).hexdigest()
        return file_based_signature(files)


_PROVIDERS: list[SourceProvider] = [
    DeltaLakeSourceProvider(),
    IcebergSourceProvider(),
    FileBasedSourceProvider(),
]


def register_provider(provider: SourceProvider, front: bool = True) -> None:
    if front:
        _PROVIDERS.insert(0, provider)
    else:
        _PROVIDERS.append(provider)


def provider_for(scan: "ir.Scan") -> SourceProvider:
    for p in _PROVIDERS:
        if p.supports(scan):
            return p
    raise ValueError(f"no source provider supports format {scan.file_format!r}")
