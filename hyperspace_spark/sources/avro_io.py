"""Avro object-container IO without the spark-avro module.

The reference lists avro among its default file formats
(util/HyperspaceConf.scala:110-115); this container ships only the core
``org.apache.avro`` jars, so ``spark.read.format("avro")`` is
unavailable.  This module restores INGESTION parity with a pure-Python
implementation of the Avro 1.x object container spec (magic ``Obj\\x01``,
metadata map with ``avro.schema``/``avro.codec``, 16-byte sync marker,
blocks of zigzag-varint-encoded records, ``null``/``deflate`` codecs):

- ``read_avro(spark, path)``: DISTRIBUTED decode — a ``binaryFile``
  scan fans the container files out to executors and an Arrow-batched
  ``mapInPandas`` decodes each file's blocks into typed columns, so
  ingest scales with the file count exactly like any other file source
  (one file is the split unit; avro blocks inside a file decode
  sequentially, the same granularity spark-avro uses for non-splittable
  codecs).  The Spark schema derives from the writer schema embedded in
  the first file's header (a driver-side header-only read).
- ``write_avro(df, path)``: fixture/export writer — each partition
  encodes its rows into one container file.  Used by tests and small
  exports; at warehouse scale parquet remains the native format.

Supported schema surface: top-level ``record`` of primitives (boolean,
int, long, float, double, string, bytes), nullable unions
(``["null", T]`` in either order), and arrays of primitives.  Anything
else raises NotImplementedError loudly.
"""

from __future__ import annotations

import json
import struct
import zlib
from typing import TYPE_CHECKING, Iterator

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession

_MAGIC = b"Obj\x01"

_PRIMITIVE_SPARK = {
    "boolean": "boolean",
    "int": "int",
    "long": "long",
    "float": "float",
    "double": "double",
    "string": "string",
    "bytes": "binary",
}


# ---------------------------------------------------------------------------
# varint / zigzag primitives (Avro spec: signed numbers are zigzag-mapped
# then written as little-endian base-128 varints)
# ---------------------------------------------------------------------------


def _zigzag_encode(n: int) -> int:
    return (n << 1) ^ (n >> 63) if n < 0 else n << 1


def _write_long(out: bytearray, n: int) -> None:
    z = _zigzag_encode(n) & 0xFFFFFFFFFFFFFFFF
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


class _Reader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def read_long(self) -> int:
        shift = 0
        acc = 0
        while True:
            b = self.data[self.pos]
            self.pos += 1
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)  # zigzag decode

    def read_bytes(self) -> bytes:
        n = self.read_long()
        out = self.data[self.pos : self.pos + n]
        self.pos += n
        return out

    def read_fixed(self, n: int) -> bytes:
        out = self.data[self.pos : self.pos + n]
        self.pos += n
        return out


# ---------------------------------------------------------------------------
# schema-driven record coding
# ---------------------------------------------------------------------------


def _normalize_type(t):
    """A field type as (base_type_str_or_dict, nullable)."""
    if isinstance(t, list):  # union
        non_null = [x for x in t if x != "null"]
        if len(non_null) != 1 or len(t) > 2:
            raise NotImplementedError(f"only [null, T] unions are supported, got {t}")
        return non_null[0], True
    return t, False


def _decode_value(r: _Reader, t):
    if isinstance(t, dict):
        if t.get("type") == "array":
            items, _ = _normalize_type(t["items"])
            out = []
            while True:
                n = r.read_long()
                if n == 0:
                    break
                if n < 0:  # block with byte size prefix
                    n = -n
                    r.read_long()
                for _ in range(n):
                    out.append(_decode_value(r, items))
            return out
        # logical types ride on a primitive base ("type": "long", ...)
        base = t.get("type")
        if base in _PRIMITIVE_SPARK:
            return _decode_value(r, base)
        raise NotImplementedError(f"unsupported avro type {t}")
    if t == "boolean":
        v = r.data[r.pos]
        r.pos += 1
        return v == 1
    if t in ("int", "long"):
        return r.read_long()
    if t == "float":
        (v,) = struct.unpack_from("<f", r.data, r.pos)
        r.pos += 4
        return v
    if t == "double":
        (v,) = struct.unpack_from("<d", r.data, r.pos)
        r.pos += 8
        return v
    if t == "string":
        return r.read_bytes().decode("utf-8")
    if t == "bytes":
        return bytes(r.read_bytes())
    raise NotImplementedError(f"unsupported avro type {t!r}")


def _encode_value(out: bytearray, t, v) -> None:
    if isinstance(t, dict):
        if t.get("type") == "array":
            items, _ = _normalize_type(t["items"])
            vals = list(v)
            if vals:
                _write_long(out, len(vals))
                for x in vals:
                    _encode_value(out, items, x)
            _write_long(out, 0)
            return
        base = t.get("type")
        if base in _PRIMITIVE_SPARK:
            return _encode_value(out, base, v)
        raise NotImplementedError(f"unsupported avro type {t}")
    if t == "boolean":
        out.append(1 if v else 0)
    elif t in ("int", "long"):
        _write_long(out, int(v))
    elif t == "float":
        out += struct.pack("<f", float(v))
    elif t == "double":
        out += struct.pack("<d", float(v))
    elif t == "string":
        b = str(v).encode("utf-8")
        _write_long(out, len(b))
        out += b
    elif t == "bytes":
        b = bytes(v)
        _write_long(out, len(b))
        out += b
    else:
        raise NotImplementedError(f"unsupported avro type {t!r}")


def _record_fields(schema: dict):
    if schema.get("type") != "record":
        raise NotImplementedError("only top-level record schemas are supported")
    return [(f["name"], *_normalize_type(f["type"])) for f in schema["fields"]]


# ---------------------------------------------------------------------------
# columnar fast paths (r14): the per-row encode/decode loops above are the
# general (and fixture) surface; the hot mapInPandas sites move whole Arrow
# batches through these vectorized twins instead.  Byte-identity with the
# row loops is load-bearing and tested (tests/test_codec_properties.py):
# the encode path must produce the IDENTICAL container (zigzag varints are
# canonical minimal-length, field order fixed, deflate level pinned), and
# the decode path the identical column values.  Supported surface: flat
# records of primitives and [null, T] unions — exactly the schema class
# the contract query and the warehouse fixtures use; arrays or nested
# records fall back to the row loops.
# ---------------------------------------------------------------------------


def _columnar_fields(schema: dict):
    """Field spec [(name, type_str, nullable)] when every field is a flat
    primitive (optionally nullable), else None -> caller falls back."""
    try:
        fields = _record_fields(schema)
    except NotImplementedError:
        return None
    for _name, t, _nullable in fields:
        if not isinstance(t, str) or t not in _PRIMITIVE_SPARK:
            return None
    return fields


def _varint_matrix(values):
    """int64 ndarray -> (bytes_matrix (n,10) uint8, nbytes (n) int64) of
    the zigzag base-128 varint encoding — identical bytes to _write_long."""
    import numpy as np

    v = np.asarray(values, dtype=np.int64)
    z = ((v << np.int64(1)) ^ (v >> np.int64(63))).view(np.uint64)
    nb = np.ones(len(v), dtype=np.int64)
    for k in range(1, 10):
        nb += (z >= np.uint64(1) << np.uint64(7 * k)).astype(np.int64)
    mat = np.zeros((len(v), 10), dtype=np.uint8)
    for k in range(10):
        byte_k = ((z >> np.uint64(7 * k)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (k < nb - 1).astype(np.uint8) << 7
        mat[:, k] = byte_k | cont
    return mat, nb


def _encode_container_columnar(arrays, n, fields, schema, codec):
    """pyarrow arrays (one per field, length n) -> container bytes.
    Exactly write_container's output for the same logical rows."""
    import numpy as np
    import pyarrow as pa

    # Per-field piece plan: [(dst_extra?), lengths, scatter closures].
    # Assembly: per row, fields concatenate in declaration order; a
    # nullable field contributes 1 tag byte (zigzag(0)=0x00/zigzag(1)=
    # 0x02) plus, when present, its value bytes.
    piece_lens = []   # list of (n,) int64 arrays, row-major piece order
    scatters = []     # list of (piece_index, fn(out, dst)) applied later
    pieces = 0

    def add_piece(lens, fn):
        nonlocal pieces
        piece_lens.append(lens)
        scatters.append((pieces, fn))
        pieces += 1

    zeros = np.zeros(n, dtype=np.int64)
    for (name, t, nullable), arr in zip(fields, arrays):
        if arr.null_count and not nullable:
            raise ValueError(f"null in non-nullable field {name!r}")
        valid = (
            np.ones(n, dtype=bool)
            if arr.null_count == 0
            else np.asarray(arr.is_valid())
        )
        if nullable:
            tags = np.where(valid, np.uint8(2), np.uint8(0))
            add_piece(
                zeros + 1,
                lambda out, dst, tags=tags: out.__setitem__(dst, tags),
            )
        if t in ("int", "long"):
            vals = arr.fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
            mat, nb = _varint_matrix(vals)
            lens = np.where(valid, nb, 0)

            def scat(out, dst, mat=mat, nb=nb, valid=valid):
                for k in range(10):
                    m = valid & (nb > k)
                    out[dst[m] + k] = mat[m, k]

            add_piece(lens, scat)
        elif t in ("double", "float"):
            width = 8 if t == "double" else 4
            dt = "<f8" if t == "double" else "<f4"
            vals = arr.fill_null(0).to_numpy(zero_copy_only=False).astype(dt)
            raw = vals.view(np.uint8).reshape(n, width)

            def scat(out, dst, raw=raw, valid=valid, width=width):
                for k in range(width):
                    out[dst[valid] + k] = raw[valid, k]

            add_piece(np.where(valid, width, 0), scat)
        elif t == "boolean":
            vals = np.asarray(arr.fill_null(False)).astype(np.uint8)

            def scat(out, dst, vals=vals, valid=valid):
                out[dst[valid]] = vals[valid]

            add_piece(np.where(valid, 1, 0), scat)
        elif t in ("string", "bytes"):
            sarr = arr.cast(pa.large_binary())
            buffers = sarr.buffers()
            offsets = np.frombuffer(buffers[1], dtype=np.int64)[
                sarr.offset : sarr.offset + n + 1
            ]
            data = np.frombuffer(buffers[2], dtype=np.uint8) if buffers[2] else np.zeros(0, np.uint8)
            slens = np.diff(offsets)
            lmat, lnb = _varint_matrix(slens)
            llens = np.where(valid, lnb, 0)

            def scat_len(out, dst, lmat=lmat, lnb=lnb, valid=valid):
                for k in range(10):
                    m = valid & (lnb > k)
                    out[dst[m] + k] = lmat[m, k]

            add_piece(llens, scat_len)
            plens = np.where(valid, slens, 0)

            def scat_pay(out, dst, data=data, offsets=offsets, plens=plens):
                total = int(plens.sum())
                if not total:
                    return
                src = np.repeat(offsets[:-1], plens) + _ramp(plens)
                dpos = np.repeat(dst, plens) + _ramp(plens)
                out[dpos] = data[src]

            add_piece(plens, scat_pay)
        else:  # pragma: no cover — guarded by _columnar_fields
            raise NotImplementedError(t)

    L = np.stack(piece_lens, axis=1) if pieces else np.zeros((n, 0), np.int64)
    row_lens = L.sum(axis=1)
    rec_off = np.zeros(n, dtype=np.int64)
    np.cumsum(row_lens[:-1], out=rec_off[1:])
    body = np.zeros(int(row_lens.sum()), dtype=np.uint8)
    running = rec_off.copy()
    for idx, fn in scatters:
        fn(body, running)
        running = running + L[:, idx]
    payload = body.tobytes()
    if codec == "deflate":
        co = zlib.compressobj(level=6, wbits=-15)
        payload = co.compress(payload) + co.flush()
    import hashlib

    sync = hashlib.md5(json.dumps(schema, sort_keys=True).encode()).digest()
    out = bytearray(_MAGIC)
    meta = {
        "avro.schema": json.dumps(schema).encode(),
        "avro.codec": codec.encode(),
    }
    _write_long(out, len(meta))
    for k, v in meta.items():
        kb = k.encode()
        _write_long(out, len(kb))
        out += kb
        _write_long(out, len(v))
        out += v
    _write_long(out, 0)
    out += sync
    if n:
        _write_long(out, n)
        _write_long(out, len(payload))
        out += payload
        out += sync
    return bytes(out)


def _ramp(lens):
    """Concatenated [0..l) ranges for a length array — the standard
    ragged-copy index: arange(total) - repeat(exclusive_cumsum, lens)."""
    import numpy as np

    total = int(lens.sum())
    if not total:
        return np.zeros(0, dtype=np.int64)
    starts = np.zeros(len(lens), dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    return np.arange(total, dtype=np.int64) - np.repeat(starts, lens)


def write_container_from_pandas(pdf, schema: dict, codec: str = "deflate") -> bytes:
    """pandas DataFrame -> container bytes, vectorized when the schema is
    flat; identical bytes to write_container(pdf.to_dict('records'), ...)."""
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"unsupported avro codec {codec!r}")
    fields = _columnar_fields(schema)
    if fields is None:
        return write_container(pdf.to_dict("records"), schema, codec=codec)
    import pyarrow as pa

    _PA = {
        "boolean": pa.bool_(),
        "int": pa.int64(),
        "long": pa.int64(),
        "float": pa.float32(),
        "double": pa.float64(),
        "string": pa.string(),
        "bytes": pa.binary(),
    }
    arrays = [
        pa.array(pdf[name], type=_PA[t], from_pandas=True)
        for name, t, _nullable in fields
    ]
    return _encode_container_columnar(arrays, len(pdf), fields, schema, codec)


def read_container_to_pandas(blob: bytes):
    """Container bytes -> (schema dict, pandas DataFrame) with the same
    column values as read_container + the old per-row DataFrame build."""
    import pandas as pd

    if blob[:4] != _MAGIC:
        raise ValueError("not an avro object container")
    r = _Reader(blob, 4)
    meta = {}
    while True:
        n = r.read_long()
        if n == 0:
            break
        if n < 0:
            n = -n
            r.read_long()
        for _ in range(n):
            k = r.read_bytes().decode("utf-8")
            meta[k] = r.read_bytes()
    sync = r.read_fixed(16)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"unsupported avro codec {codec!r}")
    fields = _columnar_fields(schema)
    names_all = [f["name"] for f in schema["fields"]]
    if fields is None:
        _, rows = read_container(blob)
        return schema, pd.DataFrame(
            {n: [row[n] for row in rows] for n in names_all}
            if rows
            else {n: [] for n in names_all}
        )
    parts = {name: [] for name, _t, _n in fields}
    while r.pos < len(r.data):
        count = r.read_long()
        size = r.read_long()
        payload = r.read_fixed(size)
        if codec == "deflate":
            payload = zlib.decompress(payload, -15)
        cols, consumed = _decode_block_fast(bytes(payload), count, fields)
        if consumed != len(payload):
            raise ValueError("avro block decode length mismatch")
        for name in parts:
            parts[name].extend(cols[name])
        if r.read_fixed(16) != sync:
            raise ValueError("avro sync marker mismatch (corrupt block)")
    return schema, pd.DataFrame(parts if any(parts.values()) else {n: [] for n in names_all})


def _decode_block_fast(data: bytes, count: int, fields):
    """One block payload -> ({name: list}, consumed_bytes); values match
    the per-row walk exactly.  Fixed-width numerics record (slot, pos)
    during the walk and are gathered with one vectorized read."""
    import numpy as np

    cols = {name: [None] * count for name, _t, _n in fields}
    fixed = {name: ([], []) for name, t, _n in fields if t in ("double", "float")}
    spec = [(name, t, nullable, cols[name], fixed.get(name)) for name, t, nullable in fields]
    pos = 0
    for row in range(count):
        for name, t, nullable, col, fx in spec:
            if nullable:
                b = data[pos]
                pos += 1
                if b & 0x80:  # non-canonical multi-byte tag (never ours)
                    acc = b & 0x7F
                    shift = 7
                    while True:
                        b = data[pos]
                        pos += 1
                        acc |= (b & 0x7F) << shift
                        if not b & 0x80:
                            break
                        shift += 7
                    branch = (acc >> 1) ^ -(acc & 1)
                else:
                    branch = (b >> 1) ^ -(b & 1)
                if branch == 0:
                    continue  # col[row] stays None
            if t in ("int", "long"):
                b = data[pos]
                pos += 1
                if b & 0x80:
                    acc = b & 0x7F
                    shift = 7
                    while True:
                        b = data[pos]
                        pos += 1
                        acc |= (b & 0x7F) << shift
                        if not b & 0x80:
                            break
                        shift += 7
                else:
                    acc = b
                col[row] = (acc >> 1) ^ -(acc & 1)
            elif t == "double":
                fx[0].append(row)
                fx[1].append(pos)
                pos += 8
            elif t == "float":
                fx[0].append(row)
                fx[1].append(pos)
                pos += 4
            elif t in ("string", "bytes"):
                b = data[pos]
                pos += 1
                if b & 0x80:
                    acc = b & 0x7F
                    shift = 7
                    while True:
                        b = data[pos]
                        pos += 1
                        acc |= (b & 0x7F) << shift
                        if not b & 0x80:
                            break
                        shift += 7
                else:
                    acc = b
                ln = (acc >> 1) ^ -(acc & 1)
                raw = data[pos : pos + ln]
                pos += ln
                col[row] = raw.decode("utf-8") if t == "string" else bytes(raw)
            elif t == "boolean":
                col[row] = data[pos] == 1
                pos += 1
            else:  # pragma: no cover — guarded by _columnar_fields
                raise NotImplementedError(t)
    if fixed:
        arr = np.frombuffer(data, dtype=np.uint8)
        for name, t, _n in fields:
            fx = fixed.get(name)
            if not fx or not fx[0]:
                continue
            width = 8 if t == "double" else 4
            dt = "<f8" if t == "double" else "<f4"
            idx = np.asarray(fx[1], dtype=np.int64)[:, None] + np.arange(width)
            vals = arr[idx].copy().view(dt).ravel()
            col = cols[name]
            for slot, v in zip(fx[0], vals.tolist()):
                col[slot] = v
    return cols, pos


# ---------------------------------------------------------------------------
# container coding
# ---------------------------------------------------------------------------


def read_container(data: bytes):
    """Avro object container bytes -> (schema dict, list of row dicts)."""
    if data[:4] != _MAGIC:
        raise ValueError("not an avro object container")
    r = _Reader(data, 4)
    meta = {}
    while True:
        n = r.read_long()
        if n == 0:
            break
        if n < 0:
            n = -n
            r.read_long()
        for _ in range(n):
            k = r.read_bytes().decode("utf-8")
            meta[k] = r.read_bytes()
    sync = r.read_fixed(16)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"unsupported avro codec {codec!r}")
    fields = _record_fields(schema)
    rows = []
    while r.pos < len(r.data):
        count = r.read_long()
        size = r.read_long()
        payload = r.read_fixed(size)
        if codec == "deflate":
            payload = zlib.decompress(payload, -15)  # raw deflate per spec
        br = _Reader(payload)
        for _ in range(count):
            row = {}
            for name, t, nullable in fields:
                if nullable:
                    branch = br.read_long()
                    row[name] = None if branch == 0 else _decode_value(br, t)
                else:
                    row[name] = _decode_value(br, t)
            rows.append(row)
        if r.read_fixed(16) != sync:
            raise ValueError("avro sync marker mismatch (corrupt block)")
    return schema, rows


def write_container(rows, schema: dict, codec: str = "deflate") -> bytes:
    """Row dicts + schema dict -> avro object container bytes.  The sync
    marker derives deterministically from the schema (no randomness:
    repeatable fixtures, stable hashes)."""
    import hashlib

    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"unsupported avro codec {codec!r}")
    fields = _record_fields(schema)
    sync = hashlib.md5(json.dumps(schema, sort_keys=True).encode()).digest()
    out = bytearray(_MAGIC)
    meta = {
        "avro.schema": json.dumps(schema).encode(),
        "avro.codec": codec.encode(),
    }
    _write_long(out, len(meta))
    for k, v in meta.items():
        kb = k.encode()
        _write_long(out, len(kb))
        out += kb
        _write_long(out, len(v))
        out += v
    _write_long(out, 0)
    out += sync
    body = bytearray()
    for row in rows:
        for name, t, nullable in fields:
            v = row.get(name)
            if nullable:
                if v is None:
                    _write_long(body, 0)
                    continue
                _write_long(body, 1)
            elif v is None:
                raise ValueError(f"null in non-nullable field {name!r}")
            _encode_value(body, t, v)
    payload = bytes(body)
    if codec == "deflate":
        co = zlib.compressobj(level=6, wbits=-15)
        payload = co.compress(payload) + co.flush()
    if rows:
        _write_long(out, len(rows))
        _write_long(out, len(payload))
        out += payload
        out += sync
    return bytes(out)


# ---------------------------------------------------------------------------
# Spark integration
# ---------------------------------------------------------------------------


def avro_to_spark_schema(schema: dict) -> str:
    cols = []
    for name, t, _nullable in _record_fields(schema):
        if isinstance(t, dict):
            if t.get("type") == "array":
                items, _ = _normalize_type(t["items"])
                cols.append(f"{name} array<{_PRIMITIVE_SPARK[items]}>")
                continue
            t = t.get("type")
        cols.append(f"{name} {_PRIMITIVE_SPARK[t]}")
    return ", ".join(cols)


def spark_to_avro_schema(df: "DataFrame", name: str = "row") -> dict:
    # keyed by simpleString() spellings (bigint, not the DDL alias long)
    rev = {
        "boolean": "boolean",
        "int": "int",
        "bigint": "long",
        "float": "float",
        "double": "double",
        "string": "string",
        "binary": "bytes",
    }
    fields = []
    for f in df.schema.fields:
        simple = f.dataType.simpleString()
        if simple.startswith("array<") and simple[6:-1] in rev:
            t = {"type": "array", "items": rev[simple[6:-1]]}
        elif simple in rev:
            t = rev[simple]
        else:
            raise NotImplementedError(f"cannot map Spark type {simple} to avro")
        fields.append({"name": f.name, "type": ["null", t] if f.nullable else t})
    return {"type": "record", "name": name, "fields": fields}


def read_avro(spark: "SparkSession", path: str) -> "DataFrame":
    """Distributed avro ingest without spark-avro: ``binaryFile`` scans
    fan the container files out to executors; each file's blocks decode
    in an Arrow-batched ``mapInPandas``.  The schema comes from the
    first file's header (driver reads one header, not the data)."""
    import glob as _glob
    import os as _os

    if _os.path.isdir(path):
        first = sorted(_glob.glob(_os.path.join(path, "*.avro")))
        if not first:
            raise ValueError(f"no .avro files under {path}")
        first = first[0]
    else:
        first = path
    with open(first, "rb") as f:
        head = f.read(1 << 20)  # header + metadata comfortably fit
    r = _Reader(head, 4)
    meta = {}
    while True:
        n = r.read_long()
        if n == 0:
            break
        if n < 0:
            n = -n
            r.read_long()
        for _ in range(n):
            k = r.read_bytes().decode("utf-8")
            meta[k] = r.read_bytes()
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    ddl = avro_to_spark_schema(schema)
    names = [f["name"] for f in schema["fields"]]

    def _decode_files(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        for pdf in batches:
            for content in pdf["content"]:
                _, rows = read_container(bytes(content))
                yield pd.DataFrame(
                    {n: [row[n] for row in rows] for n in names}
                    if rows
                    else {n: [] for n in names}
                )

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.avro")
        .load(path)
        .select("content")
    )
    return files.mapInPandas(_decode_files, ddl)


def write_avro(df: "DataFrame", path: str, codec: str = "deflate") -> None:
    """Each partition encodes into one ``part-N.avro`` container under
    ``path`` — a fixture/export writer (local-filesystem semantics; the
    warehouse-scale format remains parquet)."""
    import os as _os

    schema = spark_to_avro_schema(df)
    _os.makedirs(path, exist_ok=True)
    names = [f.name for f in df.schema.fields]

    def _write(idx, it):
        rows = [dict(zip(names, r)) for r in it]
        blob = write_container(rows, schema, codec=codec)
        with open(_os.path.join(path, f"part-{idx:05d}.avro"), "wb") as f:
            f.write(blob)
        return iter(())

    df.rdd.mapPartitionsWithIndex(_write).count()
