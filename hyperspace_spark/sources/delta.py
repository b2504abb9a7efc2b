"""Delta Lake source support via the PUBLIC Delta transaction-log protocol.

`delta-spark` is not installed in this environment, so instead of binding
to the library this module reads the open on-disk protocol directly
(https://github.com/delta-io/delta/blob/master/PROTOCOL.md): a Delta
table is a directory of parquet data files plus `_delta_log/` holding
one JSON action file per commit (`%020d.json`) and optional parquet
checkpoints advertised by `_last_checkpoint`.  Replaying `add` / `remove`
/ `metaData` actions up to a version yields that version's snapshot —
exactly what DeltaLog.snapshot gives delta-spark users.

Reference parity (index/sources/delta/DeltaLakeRelation.scala:40-215):

- snapshot file enumeration comes from the LOG, never a directory
  listing — dead (removed / compacted-away) files still present on disk
  are invisible, and at 100 TB the log replay is O(log size), not
  O(file count) of remote list calls;
- the source signature is (table path + version), so an unchanged
  version short-circuits candidate checks without any file listing;
- time travel: `read_delta(spark, path, version=N)` pins the scan to an
  older snapshot; the planner's hybrid-scan machinery compensates the
  diff between the indexed version and the queried version (files added
  since N are excluded via the lineage anti-filter, files removed since
  N are unioned back from a direct scan).  Beyond the hybrid byte-ratio
  thresholds, candidate collection falls back to the RETAINED older
  index versions and picks the one closest to the queried snapshot —
  the reference's `closestIndex` selection
  (DeltaLakeRelation.scala:179-215; planner/candidates.py
  `_closest_history_candidate`).

Write support (`write_delta`, `remove_files`, `write_checkpoint`) covers
what tests and local pipelines need — single-writer, protocol version
(1, 2), hive-layout partition directories.  It is NOT a full multi-writer
commit protocol (no LogStore atomic-rename guarantees beyond O_EXCL).
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass, field
from typing import TYPE_CHECKING
from urllib.parse import quote

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession

LOG_DIR = "_delta_log"


def encode_path(rel: str) -> str:
    """URL-encode a relative file path for a Delta action, per the
    protocol's RFC 2396 rule ("/" and partition "=" stay literal).
    EVERY action writer (add, remove, checkpoint re-add) must go through
    this one helper: a single raw-path emitter desynchronizes from the
    encoded adds on replay and leaves files live forever — the exact bug
    a missed remove-site once had."""
    return quote(rel, safe="/=")


def strip_scheme(p: str) -> str:
    if p.startswith("file://"):
        return p[len("file://"):]
    if p.startswith("file:"):
        return p[len("file:"):]
    return p


def is_delta_root(path: str) -> bool:
    return os.path.isdir(os.path.join(strip_scheme(path), LOG_DIR))


_ROOT_CACHE: dict[str, str | None] = {}


def find_delta_root(path: str, max_up: int = 6) -> str | None:
    """Nearest ancestor (or the path itself) holding `_delta_log`.

    Bounded walk: scan paths are either the table root or data files at
    most a few partition directories below it.  ``max_up`` counts
    ancestors of the DATA FILE's directory — the walk burns one check on
    the file path itself, so the bound must cover partition depth + 1
    (a y=/m=/d=/h= layout needs 5 checks above the file; the old bound
    of 4 stopped one short of the root and silently disabled the
    table's index acceleration)."""
    p = strip_scheme(path).rstrip("/")
    start = p
    hit = _ROOT_CACHE.get(start)
    if hit is not None and is_delta_root(hit):
        return hit
    for _ in range(max_up + 2):
        if is_delta_root(p):
            # Only positive hits are cached: a plain directory can BECOME
            # a Delta table later in the session.
            _ROOT_CACHE[start] = p
            return p
        parent = os.path.dirname(p)
        if parent == p:
            break
        p = parent
    return None


@dataclass
class DeltaSnapshot:
    root: str
    version: int
    schema_json: str = ""
    partition_columns: list[str] = field(default_factory=list)
    # DECODED relative path -> (size, modificationTime ms).  The protocol
    # stores add.path URL-encoded; keys here are real filesystem paths.
    adds: dict[str, tuple[int, int]] = field(default_factory=dict)
    # DECODED relative path -> partitionValues (map<string,string>);
    # retained so checkpoints round-trip partition metadata for
    # protocol-compliant external readers (delta-spark takes partition
    # column values from the checkpoint, not from directory names).
    part_values: dict[str, dict] = field(default_factory=dict)

    def file_paths(self) -> list[str]:
        return sorted(os.path.join(self.root, p) for p in self.adds)


# Full-log replay results keyed by (root, log tip): every query-planning
# pass calls all_adds()/version_file_sets() on Delta scans, and without a
# cache each call re-parsed the checkpoint + every commit JSON (O(total
# log size) IO per PLANNING pass — the Iceberg provider already cached
# its manifest reads).  The tip (newest commit name + mtime + checkpoint
# marker mtime) changes whenever the table changes, so stale entries can
# never serve.
_REPLAY_CACHE: dict = {}
_REPLAY_CACHE_MAX = 64


class DeltaLog:
    """Reader for one table's `_delta_log`; instances are cheap, state is
    re-read per call (commits are immutable; only the tip moves)."""

    def __init__(self, root: str):
        self.root = strip_scheme(root).rstrip("/")
        self.log_dir = os.path.join(self.root, LOG_DIR)
        if not os.path.isdir(self.log_dir):
            raise FileNotFoundError(f"not a Delta table (no {LOG_DIR}): {root}")

    # -- log file enumeration ------------------------------------------
    def _commit_versions(self) -> list[int]:
        out = []
        for n in os.listdir(self.log_dir):
            if n.endswith(".json") and n[:-5].isdigit():
                out.append(int(n[:-5]))
        return sorted(out)

    def latest_version(self) -> int:
        versions = self._commit_versions()
        cp = self._last_checkpoint()
        best = versions[-1] if versions else -1
        if cp is not None:
            best = max(best, int(cp["version"]))
        if best < 0:
            raise FileNotFoundError(f"empty Delta log at {self.log_dir}")
        return best

    def _last_checkpoint(self) -> dict | None:
        p = os.path.join(self.log_dir, "_last_checkpoint")
        if not os.path.isfile(p):
            return None
        with open(p) as f:
            return json.load(f)

    def _checkpoint_paths(self, cp: dict) -> list[str]:
        v = int(cp["version"])
        parts = cp.get("parts")
        if parts:
            return [
                os.path.join(
                    self.log_dir, f"{v:020d}.checkpoint.{i + 1:010d}.{int(parts):010d}.parquet"
                )
                for i in range(int(parts))
            ]
        return [os.path.join(self.log_dir, f"{v:020d}.checkpoint.parquet")]

    # -- snapshot replay ----------------------------------------------
    def snapshot(self, version: int | None = None) -> DeltaSnapshot:
        target = self.latest_version() if version is None else int(version)
        snap = DeltaSnapshot(root=self.root, version=target)
        start = 0
        cp = self._last_checkpoint()
        if cp is not None and int(cp["version"]) <= target:
            self._apply_checkpoint(snap, cp)
            start = int(cp["version"]) + 1
        for v in range(start, target + 1):
            p = os.path.join(self.log_dir, f"{v:020d}.json")
            if not os.path.isfile(p):
                # A gap is tolerable ONLY below an APPLIED checkpoint
                # (commit expired after compaction).  Asking for a
                # version below an unapplied (newer) checkpoint whose
                # early commits expired must raise, not return a
                # partial snapshot.
                raise FileNotFoundError(
                    f"missing Delta commit {v} at {self.log_dir} "
                    f"(target version {target} is not reconstructible)"
                )
            with open(p) as f:
                for line in f:
                    line = line.strip()
                    if line:
                        self._apply_action(snap, json.loads(line))
        return snap

    def _tip(self) -> tuple:
        """Identity of the log's current state for replay caching."""
        try:
            names = sorted(n for n in os.listdir(self.log_dir) if n.endswith(".json"))
            last = names[-1] if names else ""
            last_mt = os.path.getmtime(os.path.join(self.log_dir, last)) if last else 0.0
            cp = os.path.join(self.log_dir, "_last_checkpoint")
            cp_mt = os.path.getmtime(cp) if os.path.isfile(cp) else 0.0
            return (last, last_mt, cp_mt)
        except OSError:
            return (None,)

    def _replay_cached(self, kind: str, compute):
        key = (self.root, kind, self._tip())
        hit = _REPLAY_CACHE.get(key)
        if hit is not None:
            return hit
        out = compute()
        while len(_REPLAY_CACHE) >= _REPLAY_CACHE_MAX:
            _REPLAY_CACHE.pop(next(iter(_REPLAY_CACHE)))
        _REPLAY_CACHE[key] = out
        return out

    def all_adds(self) -> dict[str, tuple[int, int]]:
        """Every data file EVER added, path -> (size, modificationTime ms),
        from one forward pass (checkpoint + all commits; removes ignored —
        data files are immutable, so the metadata of a path never changes).
        Used to build FileInfo for pinned file lists without per-file
        filesystem calls.  Replay-cached per log tip."""
        return self._replay_cached("all_adds", self._all_adds_uncached)

    def _all_adds_uncached(self) -> dict[str, tuple[int, int]]:
        snap = DeltaSnapshot(root=self.root, version=-1)
        seen: dict[str, tuple[int, int]] = {}
        cp = self._last_checkpoint()
        if cp is not None:
            self._apply_checkpoint(snap, cp)
            seen.update(snap.adds)
        for v in self._commit_versions():
            p = os.path.join(self.log_dir, f"{v:020d}.json")
            with open(p) as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    action = json.loads(line)
                    a = action.get("add")
                    if a:
                        from urllib.parse import unquote

                        seen[unquote(a["path"])] = (
                            int(a.get("size", 0)),
                            int(a.get("modificationTime", 0)),
                        )
        return seen

    def version_file_sets(self) -> list[tuple[int, frozenset]]:
        """(version, live absolute-path set) for every reconstructible
        version, from ONE forward replay — O(total log size), not
        O(versions²) like per-version snapshot() calls.  Replay-cached
        per log tip."""
        return self._replay_cached("vfs", self._version_file_sets_uncached)

    def _version_file_sets_uncached(self) -> list[tuple[int, frozenset]]:
        out: list[tuple[int, frozenset]] = []
        snap = DeltaSnapshot(root=self.root, version=-1)
        start = 0
        cp = self._last_checkpoint()
        if cp is not None:
            self._apply_checkpoint(snap, cp)
            start = int(cp["version"])
            out.append((start, frozenset(snap.file_paths())))
            start += 1
        v = start
        while True:
            p = os.path.join(self.log_dir, f"{v:020d}.json")
            if not os.path.isfile(p):
                break
            with open(p) as f:
                for line in f:
                    line = line.strip()
                    if line:
                        self._apply_action(snap, json.loads(line))
            out.append((v, frozenset(snap.file_paths())))
            v += 1
        return out

    def _apply_checkpoint(self, snap: DeltaSnapshot, cp: dict) -> None:
        import pyarrow.parquet as pq

        for path in self._checkpoint_paths(cp):
            tbl = pq.read_table(path)
            cols = set(tbl.column_names)
            for row in tbl.to_pylist():
                for kind in ("metaData", "add", "remove"):
                    if kind in cols and row.get(kind) is not None:
                        self._apply_action(snap, {kind: row[kind]})

    def _apply_action(self, snap: DeltaSnapshot, action: dict) -> None:
        from urllib.parse import unquote

        if "metaData" in action and action["metaData"]:
            md = action["metaData"]
            snap.schema_json = md.get("schemaString", snap.schema_json)
            snap.partition_columns = list(md.get("partitionColumns") or [])
        elif "add" in action and action["add"]:
            a = action["add"]
            # add.path is URL-encoded per the protocol (delta-spark writes
            # x=a%20b/part-... for a partition value with a space); decode
            # to the real filesystem path or reads of such tables fail
            # with file-not-found.
            rel = unquote(a["path"])
            snap.adds[rel] = (int(a.get("size", 0)), int(a.get("modificationTime", 0)))
            pv = a.get("partitionValues")
            if pv:
                snap.part_values[rel] = dict(pv)
        elif "remove" in action and action["remove"]:
            rel = unquote(action["remove"]["path"])
            snap.adds.pop(rel, None)
            snap.part_values.pop(rel, None)


def read_delta(spark: "SparkSession", path: str, version: int | None = None) -> "DataFrame":
    """Snapshot-pinned DataFrame over a Delta table (time travel via
    ``version``).  The scan lists EXACTLY the snapshot's live files; the
    schema comes from the log's metaData (no footer inference)."""
    from pyspark.sql.types import StructType

    log = DeltaLog(path)
    snap = log.snapshot(version)
    schema = StructType.fromJson(json.loads(snap.schema_json)) if snap.schema_json else None
    files = snap.file_paths()
    if not files:
        if schema is None:
            raise ValueError(f"empty Delta table with no schema at {path}")
        return spark.createDataFrame([], schema)
    reader = spark.read
    if schema is not None:
        # The full log schema covers partition columns too: with a user
        # schema Spark takes partition-column TYPES from it instead of
        # re-inferring them from directory names.
        reader = reader.schema(schema)
    if snap.partition_columns:
        reader = reader.option("basePath", log.root)
    return reader.parquet(*files)


def table_version(path: str) -> int:
    return DeltaLog(path).latest_version()


# ---------------------------------------------------------------------------
# Minimal single-writer commit support (tests / local pipelines).
# ---------------------------------------------------------------------------
def _commit(log_dir: str, version: int, actions: list[dict]) -> None:
    os.makedirs(log_dir, exist_ok=True)
    path = os.path.join(log_dir, f"{version:020d}.json")
    # O_EXCL: two racing writers of the same version -> one loses loudly
    # (the open protocol requires atomic put-if-absent from the LogStore).
    fd = os.open(path, os.O_WRONLY | os.O_CREAT | os.O_EXCL)
    with os.fdopen(fd, "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")


def write_delta(
    df: "DataFrame",
    path: str,
    mode: str = "append",
    partition_by: list[str] | None = None,
) -> int:
    """Write ``df`` as a Delta commit; returns the committed version.

    mode='append' adds files; mode='overwrite' additionally removes every
    previously-live file.  Data files are staged with Spark's parquet
    writer, then moved into the table (hive layout for partitions) and
    committed as `add` actions."""
    root = strip_scheme(path).rstrip("/")
    log_dir = os.path.join(root, LOG_DIR)
    exists = os.path.isdir(log_dir) and any(
        n.endswith(".json") or n.endswith(".parquet") for n in os.listdir(log_dir)
    )
    if mode not in ("append", "overwrite"):
        raise ValueError("mode must be 'append' or 'overwrite'")

    staging = os.path.join(root, f".staging-{uuid.uuid4().hex}")
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(staging)

    adds = []
    for dirpath, dirs, files in os.walk(staging):
        dirs[:] = [d for d in dirs if not d.startswith((".", "_"))]
        for name in files:
            if name.startswith((".", "_")) or not name.endswith(".parquet"):
                continue
            src = os.path.join(dirpath, name)
            rel_dir = os.path.relpath(dirpath, staging)
            rel = name if rel_dir == "." else os.path.join(rel_dir, name)
            dst = os.path.join(root, rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            os.rename(src, dst)
            st = os.stat(dst)
            part_vals = {}
            if rel_dir != ".":
                for seg in rel_dir.split(os.sep):
                    k, _, v = seg.partition("=")
                    part_vals[k] = v
            adds.append(
                {
                    "add": {
                        # URL-encoded per the protocol ("/" and "=" stay)
                        "path": encode_path(rel),
                        "partitionValues": part_vals,
                        "size": st.st_size,
                        "modificationTime": int(st.st_mtime * 1000),
                        "dataChange": True,
                    }
                }
            )
    import shutil

    shutil.rmtree(staging, ignore_errors=True)

    now_ms = int(time.time() * 1000)
    actions: list[dict] = []
    if not exists:
        version = 0
        actions.append({"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}})
        actions.append(_metadata_action(df, partition_by))
    else:
        log = DeltaLog(root)
        version = log.latest_version() + 1
        if mode == "overwrite":
            prev = log.snapshot()
            # snapshot keys are DECODED; the log stores URL-encoded paths
            # (same encoding the add writer uses) — a raw remove would
            # fail to match its add on replay for any '%' in a partition
            # value and leave the overwritten file live forever.
            actions.extend(
                {"remove": {"path": encode_path(p), "deletionTimestamp": now_ms, "dataChange": True}}
                for p in sorted(prev.adds)
            )
            actions.append(_metadata_action(df, partition_by))
    actions.extend(adds)
    actions.append({"commitInfo": {"timestamp": now_ms, "operation": "WRITE", "operationParameters": {"mode": mode}}})
    _commit(log_dir, version, actions)
    return version


def _metadata_action(df: "DataFrame", partition_by: list[str] | None) -> dict:
    return {
        "metaData": {
            "id": str(uuid.uuid4()),
            "format": {"provider": "parquet", "options": {}},
            "schemaString": df.schema.json(),
            "partitionColumns": list(partition_by or []),
            "configuration": {},
            "createdTime": int(time.time() * 1000),
        }
    }


def remove_files(path: str, rel_paths: list[str]) -> int:
    """Commit `remove` tombstones for the given relative paths (file-level
    delete, e.g. after a compaction decided the files are dead)."""
    root = strip_scheme(path).rstrip("/")
    log = DeltaLog(root)
    snap = log.snapshot()
    missing = [p for p in rel_paths if p not in snap.adds]
    if missing:
        raise ValueError(f"not live in version {snap.version}: {missing}")
    now_ms = int(time.time() * 1000)
    version = snap.version + 1
    _commit(
        log.log_dir,
        version,
        [
            {"remove": {"path": encode_path(p), "deletionTimestamp": now_ms, "dataChange": True}}
            for p in rel_paths
        ],
    )
    return version


def write_checkpoint(path: str) -> int:
    """Materialize the current snapshot as a parquet checkpoint and point
    `_last_checkpoint` at it (readers then replay only later commits)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = strip_scheme(path).rstrip("/")
    log = DeltaLog(root)
    snap = log.snapshot()
    # Explicit Arrow schema: parquet cannot hold child-less structs, and
    # the protocol models partitionValues as map<string,string>.
    cp_schema = pa.schema(
        [
            (
                "protocol",
                pa.struct(
                    [("minReaderVersion", pa.int32()), ("minWriterVersion", pa.int32())]
                ),
            ),
            (
                "metaData",
                pa.struct(
                    [
                        ("id", pa.string()),
                        ("format", pa.struct([("provider", pa.string())])),
                        ("schemaString", pa.string()),
                        ("partitionColumns", pa.list_(pa.string())),
                    ]
                ),
            ),
            (
                "add",
                pa.struct(
                    [
                        ("path", pa.string()),
                        ("partitionValues", pa.map_(pa.string(), pa.string())),
                        ("size", pa.int64()),
                        ("modificationTime", pa.int64()),
                        ("dataChange", pa.bool_()),
                    ]
                ),
            ),
        ]
    )
    rows: list[dict] = [
        {
            "protocol": {"minReaderVersion": 1, "minWriterVersion": 2},
            "metaData": None,
            "add": None,
        },
        {
            "protocol": None,
            "metaData": {
                "id": str(uuid.uuid4()),
                "format": {"provider": "parquet"},
                "schemaString": snap.schema_json,
                "partitionColumns": snap.partition_columns,
            },
            "add": None,
        },
    ]
    for rel, (size, mtime) in sorted(snap.adds.items()):
        rows.append(
            {
                "protocol": None,
                "metaData": None,
                "add": {
                    # re-encode: snapshot keys are decoded fs paths, the
                    # protocol stores URL-encoded ("/" and "=" stay).
                    "path": encode_path(rel),
                    "partitionValues": sorted(
                        snap.part_values.get(rel, {}).items()
                    ),
                    "size": size,
                    "modificationTime": mtime,
                    "dataChange": False,
                },
            }
        )
    tbl = pa.Table.from_pylist(rows, schema=cp_schema)
    cp_path = os.path.join(log.log_dir, f"{snap.version:020d}.checkpoint.parquet")
    pq.write_table(tbl, cp_path)
    with open(os.path.join(log.log_dir, "_last_checkpoint"), "w") as f:
        json.dump({"version": snap.version, "size": len(rows)}, f)
    return snap.version
