"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schemas, partition-size
control, Arrow-batched `mapInPandas` with bounded batch memory — while
the actual media decoding is STUBBED: the container has no image/audio
libraries, so `decode=real` raises NotImplementedError with a clear
message, and `decode=fake` produces deterministic features derived from
the bytes (stable across runs/engines, good enough to exercise every
downstream operator).

Scale notes: media bytes dominate row size; keep
`spark.sql.files.maxPartitionBytes` at default so a partition holds a
bounded number of blobs, and ALWAYS select the binary column away before
wide shuffles — the feature vectors, not the blobs, are what joins and
dedup run on.
"""

from __future__ import annotations

import hashlib
from typing import TYPE_CHECKING, Iterator

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession

MEDIA_SCHEMA = (
    "media_id long, kind string, data binary, "
    "meta struct<width:int, height:int, sample_rate:int, duration_ms:int, format:string>"
)

FEATURE_DIM = 16

DECODED_SCHEMA = (
    "media_id long, kind string, n_bytes long, width int, height int, "
    f"features array<float>"
)

FRAME_SCHEMA = "media_id long, frame_index int, frame_ms int, frame bytes".replace(
    "bytes", "binary"
)


def synthetic_media_df(spark: "SparkSession", n: int = 64, seed: str = "hs-media") -> "DataFrame":
    """Deterministic fake media table (binary payload = seeded bytes)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(f"{seed}-{i}".encode()).digest() * (4 + i % 5)
        meta = {
            "width": 64 + (i % 8) * 16 if kind != "audio" else None,
            "height": 48 + (i % 8) * 12 if kind != "audio" else None,
            "sample_rate": 16000 if kind == "audio" else None,
            "duration_ms": 1000 * (1 + i % 30) if kind != "image" else None,
            "format": {"image": "png", "audio": "wav", "video": "mp4"}[kind],
        }
        rows.append((i, kind, bytearray(payload), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_features(data: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic unit-norm feature vector from content bytes.

    Hashes the lowercase-hex TEXT of the payload (md5 of "<hex>-<j>"),
    not the raw bytes: every step is then expressible in engines whose
    md5 only takes VARCHAR (DuckDB), so the full feature VALUES are
    cross-engine verifiable — see workload.multimodal_features_query's
    oracle.  Same distribution/determinism as hashing bytes directly."""
    hx = data.hex()
    out = []
    for j in range(dim):
        d = hashlib.md5(f"{hx}-{j}".encode()).digest()
        out.append(int.from_bytes(d[:4], "big") / float(1 << 32) - 0.5)
    norm = sum(x * x for x in out) ** 0.5 or 1.0
    return [float(x / norm) for x in out]


def decode_features(df: "DataFrame", decode: str = "fake") -> "DataFrame":
    """media rows -> per-item feature vectors via Arrow-batched mapInPandas.

    ``decode='real'`` is the integration point for PIL/torchaudio/av —
    not available in this environment, so it raises NotImplementedError.
    """
    if decode == "real":
        raise NotImplementedError(
            "real media decoding requires image/audio libraries not present in "
            "this environment; plug a decoder into _decode_batches and pass "
            "decode='real'"
        )
    if decode != "fake":
        raise ValueError("decode must be 'fake' or 'real'")

    def _decode_batches(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        for pdf in batches:
            feats = [_fake_features(bytes(b)) for b in pdf["data"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["data"].map(len).astype("int64"),
                    "width": pdf["meta"].map(lambda m: m["width"] if m is not None else None),
                    "height": pdf["meta"].map(lambda m: m["height"] if m is not None else None),
                    "features": feats,
                }
            )

    return df.mapInPandas(_decode_batches, DECODED_SCHEMA)


RESIZED_SCHEMA = (
    "media_id long, kind string, width int, height int, data binary, "
    "meta struct<width:int, height:int, sample_rate:int, duration_ms:int, format:string>"
)


def resize_images(df: "DataFrame", width: int = 224, height: int = 224) -> "DataFrame":
    """Image rows -> fixed-size thumbnails; non-image rows pass through
    untouched (width/height echo the metadata).

    The pixel resampling is STUBBED deterministically — output bytes are
    a content-derived fixed-length payload of exactly width*height//64
    bytes, so downstream batch-shape and size accounting behave like a
    real thumbnail column.  The plumbing is the real thing: Arrow-batched
    `mapInPandas`, one output row per input row, binary column replaced
    in place, metadata struct rebuilt with the new dimensions.  A real
    decoder (PIL etc.) plugs into `_resize_one`."""
    target_len = max(16, width * height // 64)

    def _resize_one(data: bytes) -> bytes:
        # Deterministic fake: stretch/shrink the content hash to the
        # target thumbnail byte length (stable across runs/engines).
        seed = hashlib.sha256(data).digest()
        reps = -(-target_len // len(seed))
        return (seed * reps)[:target_len]

    def _batches(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        for pdf in batches:
            out_data, out_w, out_h, out_meta = [], [], [], []
            for kind, data, meta in zip(pdf["kind"], pdf["data"], pdf["meta"]):
                if kind == "image":
                    out_data.append(_resize_one(bytes(data)))
                    out_w.append(width)
                    out_h.append(height)
                    m = dict(meta) if meta is not None else {}
                    m["width"], m["height"] = width, height
                    out_meta.append(m)
                else:
                    out_data.append(bytes(data))
                    out_w.append(meta["width"] if meta is not None else None)
                    out_h.append(meta["height"] if meta is not None else None)
                    out_meta.append(meta)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "width": pd.array(out_w, dtype="Int32"),
                    "height": pd.array(out_h, dtype="Int32"),
                    "data": out_data,
                    "meta": out_meta,
                }
            )

    return df.mapInPandas(_batches, RESIZED_SCHEMA)


def sample_frames(df: "DataFrame", every_ms: int = 1000, max_frames: int = 8) -> "DataFrame":
    """Video rows -> (media_id, frame_index, frame_ms, frame) rows.

    Frame extraction is stubbed deterministically (slices of the payload);
    the plumbing — one-to-many mapInPandas with bounded output batches —
    is the real thing."""

    def _frames(batches):
        import pandas as pd

        for pdf in batches:
            out = {"media_id": [], "frame_index": [], "frame_ms": [], "frame": []}
            vid = pdf[pdf["kind"] == "video"]
            # zip over columns, not iterrows: no per-row Series
            # construction (the slow shape inside mapInPandas).
            for mid, data, meta in zip(vid["media_id"], vid["data"], vid["meta"]):
                raw = meta["duration_ms"] if meta is not None else None
                # Arrow hands nullable ints to pandas as float/NaN.
                dur = 0 if raw is None or raw != raw else int(raw)
                n = int(min(max_frames, max(1, dur // every_ms)))
                data = bytes(data)
                step = max(1, len(data) // max(n, 1))
                for fi in range(n):
                    out["media_id"].append(mid)
                    out["frame_index"].append(fi)
                    out["frame_ms"].append(fi * every_ms)
                    out["frame"].append(data[fi * step : fi * step + 16])
            yield pd.DataFrame(out)

    return df.mapInPandas(_frames, FRAME_SCHEMA)
