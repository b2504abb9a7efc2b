"""Apache Iceberg source support via the PUBLIC Iceberg table spec.

No iceberg-spark runtime is installed, so this module reads the open
on-disk format directly (https://iceberg.apache.org/spec/): a table
directory holds `metadata/v<N>.metadata.json` (current version in
`version-hint.text`), each snapshot points at an avro *manifest list*,
whose entries point at avro *manifests*, whose entries carry the data
files (path, size, status).  Avro IO goes through the JVM's bundled
org.apache.avro library via py4j — manifests are metadata-scale, so
driver-side reading matches how Iceberg's own planning works.

Reference parity (index/sources/iceberg/IcebergRelation.scala:65-223):
snapshot-pinned file enumeration (no directory listing — dead files are
invisible and enumeration is O(metadata)); signature = table location +
snapshot id; time travel by snapshot id with the planner's hybrid-scan
machinery compensating the diff between the indexed and queried
snapshots, replacing retained-index-version selection.

Write support (`write_iceberg`) emits format-version-1 tables with the
spec's field-ids for the subset of manifest fields it writes —
single-writer, unpartitioned, enough for tests and local pipelines.
Reading handles any table whose manifests carry the standard
`status` / `data_file.file_path` / `file_size_in_bytes` fields.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass, field
from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession

from hyperspace_spark.sources.delta import strip_scheme

METADATA_DIR = "metadata"

MANIFEST_FILE_SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "manifest_file",
        "fields": [
            {"name": "manifest_path", "type": "string", "field-id": 500},
            {"name": "manifest_length", "type": "long", "field-id": 501},
            {"name": "partition_spec_id", "type": "int", "field-id": 502},
            {"name": "added_snapshot_id", "type": ["null", "long"], "default": None, "field-id": 503},
        ],
    }
)

MANIFEST_ENTRY_SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int", "field-id": 0},
            {"name": "snapshot_id", "type": ["null", "long"], "default": None, "field-id": 1},
            {
                "name": "data_file",
                "field-id": 2,
                "type": {
                    "type": "record",
                    "name": "r2",
                    "fields": [
                        {"name": "file_path", "type": "string", "field-id": 100},
                        {"name": "file_format", "type": "string", "field-id": 101},
                        {"name": "record_count", "type": "long", "field-id": 103},
                        {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
                    ],
                },
            },
        ],
    }
)

_STATUS_DELETED = 2


def is_iceberg_root(path: str) -> bool:
    md = os.path.join(strip_scheme(path), METADATA_DIR)
    if not os.path.isdir(md):
        return False
    return any(n.endswith(".metadata.json") for n in os.listdir(md))


def find_iceberg_root(path: str, max_up: int = 6) -> str | None:
    # max_up counts ancestors of the data file's directory; +2 covers
    # the file-path check itself (see find_delta_root).
    p = strip_scheme(path).rstrip("/")
    for _ in range(max_up + 2):
        if is_iceberg_root(p):
            return p
        parent = os.path.dirname(p)
        if parent == p:
            break
        p = parent
    return None


# ---------------------------------------------------------------------------
# Avro IO via the JVM's org.apache.avro (bundled with Spark)
# ---------------------------------------------------------------------------
def _jvm():
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError("an active SparkSession is required for avro IO")
    return spark._jvm


from collections import OrderedDict

_AVRO_CACHE: "OrderedDict[str, list]" = OrderedDict()
_AVRO_CACHE_MAX = 4096
_META_CACHE: dict = {}
_SNAP_CACHE: dict = {}


def _avro_value_to_py(v):
    """GenericRecord field value -> plain Python.  Converting at read
    time (instead of caching py4j handles) removes every per-field JVM
    round-trip from manifest walks AND makes cache entries independent
    of the SparkSession gateway that produced them — cached handles
    from a stopped session raised py4j errors on reuse."""
    if v is None or isinstance(v, (bool, int, float, str, bytes, bytearray)):
        return v
    try:
        cls = v.getClass().getName()
    except Exception:
        return v
    if cls == "org.apache.avro.util.Utf8":
        return str(v)
    if cls.endswith("GenericData$Record"):
        return _avro_record_to_dict(v)
    try:  # avro arrays / java lists iterate via py4j
        return [_avro_value_to_py(x) for x in v]
    except Exception:
        pass
    try:  # java maps
        return {
            str(e.getKey()): _avro_value_to_py(e.getValue())
            for e in v.entrySet().toArray()
        }
    except Exception:
        return str(v)  # ByteBuffer/fixed etc. — unused by consumers


def _avro_record_to_dict(rec) -> dict:
    out = {}
    for f in rec.getSchema().getFields():
        name = str(f.name())
        out[name] = _avro_value_to_py(rec.get(name))
    return out


def read_avro_records(path: str) -> list:
    """Records from one avro file as plain dicts (use .get(name)).
    Cached per path with LRU eviction — Iceberg metadata files are
    immutable, and snapshots share manifests, so planning-time walks
    stay O(distinct manifests)."""
    hit = _AVRO_CACHE.get(path)
    if hit is not None:
        _AVRO_CACHE.move_to_end(path)
        return hit
    jvm = _jvm()
    reader = jvm.org.apache.avro.generic.GenericDatumReader()
    dfr = jvm.org.apache.avro.file.DataFileReader(jvm.java.io.File(path), reader)
    out = []
    while dfr.hasNext():
        out.append(_avro_record_to_dict(dfr.next()))
    dfr.close()
    while len(_AVRO_CACHE) >= _AVRO_CACHE_MAX:
        _AVRO_CACHE.popitem(last=False)  # LRU, not clear-all
    _AVRO_CACHE[path] = out
    return out


def write_avro_records(path: str, schema_json: str, rows: list[dict]) -> None:
    jvm = _jvm()
    schema = jvm.org.apache.avro.Schema.Parser().parse(schema_json)
    writer = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(schema)
    )
    writer.create(schema, jvm.java.io.File(path))

    def build(rec_schema, d: dict):
        rec = jvm.org.apache.avro.generic.GenericData.Record(rec_schema)
        for k, v in d.items():
            if isinstance(v, dict):
                fs = rec_schema.getField(k).schema()
                rec.put(k, build(fs, v))
            else:
                rec.put(k, v)
        return rec

    for row in rows:
        writer.append(build(schema, row))
    writer.close()


# ---------------------------------------------------------------------------
# Table metadata
# ---------------------------------------------------------------------------
@dataclass
class IcebergSnapshot:
    root: str
    snapshot_id: int
    schema_json: str = ""  # Spark StructType json ('' = infer from footers)
    partition_columns: list[str] = field(default_factory=list)
    files: dict[str, int] = field(default_factory=dict)  # abs path -> size

    def file_paths(self) -> list[str]:
        return sorted(self.files)


class IcebergTable:
    def __init__(self, root: str):
        self.root = strip_scheme(root).rstrip("/")
        self.md_dir = os.path.join(self.root, METADATA_DIR)
        if not is_iceberg_root(self.root):
            raise FileNotFoundError(f"not an Iceberg table (no metadata/*.metadata.json): {root}")

    def _current_metadata_path(self) -> str:
        hint = os.path.join(self.md_dir, "version-hint.text")
        if os.path.isfile(hint):
            with open(hint) as f:
                v = f.read().strip()
            p = os.path.join(self.md_dir, f"v{v}.metadata.json")
            if os.path.isfile(p):
                return p
        cands = sorted(n for n in os.listdir(self.md_dir) if n.endswith(".metadata.json"))
        if not cands:
            raise FileNotFoundError(f"no metadata.json under {self.md_dir}")
        # v<N>.metadata.json sorts textually wrong for N>9 — sort numerically
        # when the vN pattern holds, else fall back to name order.
        def key(n):
            stem = n.split(".", 1)[0]
            return (0, int(stem[1:])) if stem[1:].isdigit() and stem.startswith("v") else (1, n)

        return os.path.join(self.md_dir, sorted(cands, key=key)[-1])

    def metadata(self) -> dict:
        # (path, mtime)-keyed cache: the signature walk and per-snapshot
        # reconstruction call metadata() repeatedly on every planning
        # pass; metadata files are immutable (a new table version writes
        # a NEW vN.metadata.json), so mtime only guards replacement.
        path = self._current_metadata_path()
        try:
            mtime = os.path.getmtime(path)
        except OSError:
            mtime = 0.0
        key = (path, mtime)
        hit = _META_CACHE.get(key)
        if hit is not None:
            return hit
        with open(path) as f:
            md = json.load(f)
        if len(_META_CACHE) > 64:
            _META_CACHE.clear()
        _META_CACHE[key] = md
        return md

    def current_snapshot_id(self) -> int:
        md = self.metadata()
        sid = md.get("current-snapshot-id")
        if sid is None or sid == -1:
            raise FileNotFoundError(f"Iceberg table has no current snapshot: {self.root}")
        return int(sid)

    def snapshot_ids(self) -> list[int]:
        return [int(s["snapshot-id"]) for s in self.metadata().get("snapshots", [])]

    def snapshot(self, snapshot_id: int | None = None) -> IcebergSnapshot:
        md = self.metadata()
        sid = int(snapshot_id) if snapshot_id is not None else self.current_snapshot_id()
        snaps = {int(s["snapshot-id"]): s for s in md.get("snapshots", [])}
        if sid not in snaps:
            raise FileNotFoundError(f"snapshot {sid} not in {sorted(snaps)} at {self.root}")
        # A snapshot's manifest list is immutable once recorded; key on
        # the current metadata identity so schema evolution invalidates.
        cache_key = (self._current_metadata_path(), sid)
        hit = _SNAP_CACHE.get(cache_key)
        if hit is not None:
            return hit
        snap = IcebergSnapshot(root=self.root, snapshot_id=sid)
        snap.schema_json = _spark_schema_json(md)
        snap.partition_columns = _identity_partition_columns(md)
        ml = self._abs(snaps[sid]["manifest-list"])
        for mf in read_avro_records(ml):
            mpath = self._abs(str(mf.get("manifest_path")))
            for entry in read_avro_records(mpath):
                status = int(str(entry.get("status")))
                data_file = entry.get("data_file")
                fpath = self._abs(str(data_file.get("file_path")))
                if status == _STATUS_DELETED:
                    snap.files.pop(fpath, None)
                else:
                    try:
                        size = int(str(data_file.get("file_size_in_bytes")))
                    except Exception:
                        size = 0
                    snap.files[fpath] = size
        if len(_SNAP_CACHE) > 256:
            _SNAP_CACHE.clear()
        _SNAP_CACHE[cache_key] = snap
        return snap

    def _abs(self, p: str) -> str:
        p = strip_scheme(p)
        return p if os.path.isabs(p) else os.path.join(self.root, p)

    def all_file_sizes(self) -> dict[str, int]:
        """Every data file referenced by ANY snapshot's manifests,
        absolute path -> size — one pass over distinct manifests (cached
        avro reads), removes ignored (data files are immutable)."""
        md = self.metadata()
        manifests: set[str] = set()
        for s in md.get("snapshots", []):
            for mf in read_avro_records(self._abs(s["manifest-list"])):
                manifests.add(self._abs(str(mf.get("manifest_path"))))
        out: dict[str, int] = {}
        for m in sorted(manifests):
            for entry in read_avro_records(m):
                data_file = entry.get("data_file")
                if data_file is None:
                    continue
                try:
                    size = int(str(data_file.get("file_size_in_bytes")))
                except Exception:
                    size = 0
                out[self._abs(str(data_file.get("file_path")))] = size
        return out


_ICEBERG_TO_SPARK = {
    "boolean": "boolean",
    "int": "integer",
    "long": "long",
    "float": "float",
    "double": "double",
    "date": "date",
    "time": "string",
    "timestamp": "timestamp_ntz",
    "timestamptz": "timestamp",
    "string": "string",
    "uuid": "string",
    "binary": "binary",
}


def _identity_partition_columns(md: dict) -> list[str]:
    """Identity-transform partition field names of the default spec.
    (Bucket/truncate/temporal transforms are not supported by this subset
    reader — tables using them read as unpartitioned file lists, which is
    still correct when the data files carry the source columns.)"""
    specs = {s.get("spec-id"): s for s in md.get("partition-specs", [])}
    spec = specs.get(md.get("default-spec-id", 0)) or {"fields": md.get("partition-spec", [])}
    out = []
    for f in spec.get("fields", []):
        if f.get("transform", "identity") == "identity":
            out.append(f["name"])
    return out


def _spark_schema_json(md: dict) -> str:
    """Iceberg schema -> Spark StructType json; '' when the table uses
    types this subset reader does not map (caller infers from footers)."""
    schema = md.get("schema")
    if schema is None:
        for s in md.get("schemas", []):
            if s.get("schema-id") == md.get("current-schema-id"):
                schema = s
                break
    if not schema:
        return ""
    fields = []
    for f in schema.get("fields", []):
        t = f.get("type")
        if not isinstance(t, str):
            return ""  # nested/parameterized: infer instead
        if t.startswith("decimal"):
            spark_t = t
        else:
            spark_t = _ICEBERG_TO_SPARK.get(t)
        if spark_t is None:
            return ""
        fields.append(
            {"name": f["name"], "type": spark_t, "nullable": not f.get("required", False), "metadata": {}}
        )
    return json.dumps({"type": "struct", "fields": fields})


def read_iceberg(spark: "SparkSession", path: str, snapshot_id: int | None = None) -> "DataFrame":
    """Snapshot-pinned DataFrame over an Iceberg table (time travel via
    ``snapshot_id``)."""
    from pyspark.sql.types import StructType

    tbl = IcebergTable(path)
    snap = tbl.snapshot(snapshot_id)
    files = snap.file_paths()
    schema = (
        StructType.fromJson(json.loads(snap.schema_json)) if snap.schema_json else None
    )
    if not files:
        if schema is None:
            raise ValueError(f"empty Iceberg table with no mappable schema at {path}")
        return spark.createDataFrame([], schema)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if snap.partition_columns:
        # Hive-layout partition directories; types come from the schema.
        reader = reader.option("basePath", tbl.root)
    return reader.parquet(*files)


def table_snapshot_id(path: str) -> int:
    return IcebergTable(path).current_snapshot_id()


# ---------------------------------------------------------------------------
# Minimal single-writer commit support (format-version 1, unpartitioned)
# ---------------------------------------------------------------------------
_SIMPLE_TO_ICEBERG = {
    "bigint": "long",
    "int": "int",
    "smallint": "int",
    "tinyint": "int",
    "string": "string",
    "double": "double",
    "float": "float",
    "boolean": "boolean",
    "date": "date",
    "timestamp": "timestamptz",
    "timestamp_ntz": "timestamp",
    "binary": "binary",
}


def _iceberg_type(spark_type: str) -> str:
    if spark_type.startswith("decimal"):
        return spark_type
    t = _SIMPLE_TO_ICEBERG.get(spark_type)
    if t is None:
        raise ValueError(f"unsupported column type for the Iceberg writer: {spark_type}")
    return t


def write_iceberg(
    df: "DataFrame", path: str, mode: str = "append", partition_by: list[str] | None = None
) -> int:
    """Commit ``df`` as a new snapshot; returns the snapshot id.

    mode='append' keeps previous data files; mode='overwrite' drops them
    (previous manifests are simply not carried into the new manifest
    list — Iceberg's snapshot isolation makes that a complete replace).
    ``partition_by`` writes identity-partitioned hive-layout directories
    under data/ and records the matching identity partition spec."""
    if mode not in ("append", "overwrite"):
        raise ValueError("mode must be 'append' or 'overwrite'")
    root = strip_scheme(path).rstrip("/")
    md_dir = os.path.join(root, METADATA_DIR)
    data_dir = os.path.join(root, "data")
    os.makedirs(md_dir, exist_ok=True)
    os.makedirs(data_dir, exist_ok=True)
    exists = is_iceberg_root(root)
    prev_md = IcebergTable(root).metadata() if exists else None

    staging = os.path.join(root, f".staging-{uuid.uuid4().hex}")
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(staging)
    adds = []
    for dirpath, dirs, names in os.walk(staging):
        dirs[:] = [d for d in dirs if not d.startswith((".", "_"))]
        for name in sorted(names):
            if name.startswith((".", "_")) or not name.endswith(".parquet"):
                continue
            rel_dir = os.path.relpath(dirpath, staging)
            out_dir = data_dir if rel_dir == "." else os.path.join(data_dir, rel_dir)
            os.makedirs(out_dir, exist_ok=True)
            dst = os.path.join(out_dir, f"{uuid.uuid4().hex}-{name}")
            os.rename(os.path.join(dirpath, name), dst)
            adds.append((dst, os.stat(dst).st_size))
    import shutil

    shutil.rmtree(staging, ignore_errors=True)

    now_ms = int(time.time() * 1000)
    # Spec-style random 63-bit snapshot id; retry on the (astronomically
    # unlikely) collision with an existing snapshot — a same-millisecond
    # arithmetic id collided in practice and shadowed a snapshot.
    existing = {int(s["snapshot-id"]) for s in (prev_md or {}).get("snapshots", [])}
    snapshot_id = uuid.uuid4().int >> 65
    while snapshot_id in existing:
        snapshot_id = uuid.uuid4().int >> 65
    seq = (prev_md.get("last-sequence-number", 0) + 1) if prev_md else 1

    manifest_path = os.path.join(md_dir, f"{uuid.uuid4().hex}-m0.avro")
    write_avro_records(
        manifest_path,
        MANIFEST_ENTRY_SCHEMA,
        [
            {
                "status": 1,  # ADDED
                "snapshot_id": snapshot_id,
                "data_file": {
                    "file_path": p,
                    "file_format": "PARQUET",
                    "record_count": 0,
                    "file_size_in_bytes": size,
                },
            }
            for p, size in adds
        ],
    )
    manifests = [manifest_path]
    if mode == "append" and prev_md and prev_md.get("current-snapshot-id", -1) != -1:
        prev_snaps = {int(s["snapshot-id"]): s for s in prev_md.get("snapshots", [])}
        prev = prev_snaps[int(prev_md["current-snapshot-id"])]
        for mf in read_avro_records(strip_scheme(prev["manifest-list"])):
            manifests.append(str(mf.get("manifest_path")))

    ml_path = os.path.join(md_dir, f"snap-{snapshot_id}-1-{uuid.uuid4().hex}.avro")
    write_avro_records(
        ml_path,
        MANIFEST_FILE_SCHEMA,
        [
            {
                "manifest_path": m,
                "manifest_length": os.stat(strip_scheme(m)).st_size if os.path.isfile(strip_scheme(m)) else 0,
                "partition_spec_id": 0,
                "added_snapshot_id": snapshot_id,
            }
            for m in manifests
        ],
    )

    fields = [
        {
            "id": i + 1,
            "name": f.name,
            "required": not f.nullable,
            "type": _iceberg_type(f.dataType.simpleString()),
        }
        for i, f in enumerate(df.schema.fields)
    ]
    field_ids = {f["name"]: f["id"] for f in fields}
    spec_fields = [
        {
            "name": c,
            "transform": "identity",
            "source-id": field_ids[c],
            "field-id": 1000 + i,
        }
        for i, c in enumerate(partition_by or [])
    ]
    new_snapshot = {
        "snapshot-id": snapshot_id,
        "timestamp-ms": now_ms,
        "sequence-number": seq,
        "manifest-list": ml_path,
        "summary": {"operation": "append" if mode == "append" else "overwrite"},
    }
    # Snapshot HISTORY is retained in both modes (overwrite replaces the
    # live file set, not time travel — Iceberg semantics).
    snapshots = list(prev_md.get("snapshots", [])) if prev_md else []
    snapshots.append(new_snapshot)
    version = (int(prev_md["_hs_version"]) + 1) if prev_md and "_hs_version" in prev_md else 1
    md = {
        "format-version": 1,
        "table-uuid": prev_md.get("table-uuid") if prev_md else str(uuid.uuid4()),
        "location": root,
        "last-updated-ms": now_ms,
        "last-column-id": len(fields),
        "last-sequence-number": seq,
        "schema": {"type": "struct", "schema-id": 0, "fields": fields},
        "schemas": [{"type": "struct", "schema-id": 0, "fields": fields}],
        "current-schema-id": 0,
        "partition-spec": spec_fields,
        "partition-specs": [{"spec-id": 0, "fields": spec_fields}],
        "default-spec-id": 0,
        "properties": {},
        "current-snapshot-id": snapshot_id,
        "snapshots": snapshots,
        "_hs_version": version,
    }
    with open(os.path.join(md_dir, f"v{version}.metadata.json"), "w") as f:
        json.dump(md, f)
    with open(os.path.join(md_dir, "version-hint.text"), "w") as f:
        f.write(str(version))
    return snapshot_id
