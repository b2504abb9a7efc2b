"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schemas, partition-size
control, Arrow-batched `mapInPandas` with bounded batch memory.  Since
r10 the library-free formats decode for real with pure numpy+stdlib
codecs (24-bit BMP, P6 PPM, PCM16 WAV, and 8-bit PNG via stdlib zlib +
scanline unfiltering — `decode_bmp/decode_ppm/decode_wav/decode_png`,
surfaced via `decode_features(decode='real')` as decoded dims +
per-channel means), and baseline JPEG decodes through the pure-numpy
T.81 codec in `llm/jpeg.py` (Huffman + dequant + IDCT, 4:4:4/4:2:0,
restart intervals), animated GIF through the LZW codec in `llm/gif.py`
(real frame sampling: `sample_frames(decode='real')` emits PNG frames
at real animation timestamps), and MP4 gets a real box-tree METADATA
probe (`probe_mp4`).  True video frame decode stays
NotImplementedError — inter-frame codecs genuinely need external
libraries.  `decode='fake'` remains the deterministic byte-derived
feature path (stable across runs/engines, good enough to exercise
every downstream operator regardless of format).

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


# ---------------------------------------------------------------------------
# r10: REAL decoders with no external media library.  BMP (24-bit
# uncompressed), PPM (P6 binary) and WAV (PCM16 RIFF) are pure
# numpy+struct header parses; PNG (8-bit gray/GA/RGB/RGBA,
# non-interlaced) adds stdlib-zlib inflate + per-scanline unfiltering
# (None/Sub/Up/Average/Paeth); baseline JPEG lives in llm/jpeg.py
# (T.81 Huffman + DCT in numpy); animated GIF in llm/gif.py (LZW).
# True video frame decode stays env-blocked and keeps the
# NotImplementedError below.  Encoders exist so tests and contract
# queries can round-trip deterministic fixtures.
# ---------------------------------------------------------------------------

REAL_DECODABLE = ("bmp", "ppm", "png", "jpeg", "jpg", "gif", "wav")


def encode_bmp(pixels) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit uncompressed BMP (BITMAPINFOHEADER,
    bottom-up rows, BGR byte order, rows padded to 4 bytes)."""
    import struct

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    row_bytes = (w * 3 + 3) & ~3
    data_size = row_bytes * h
    header = struct.pack("<2sIHHI", b"BM", 54 + data_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size, 2835, 2835, 0, 0)
    body = np.zeros((h, row_bytes), dtype=np.uint8)
    body[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    return header + info + body.tobytes()


def decode_bmp(data: bytes):
    """24-bit uncompressed BMP -> (h, w, 3) uint8 RGB numpy array."""
    import struct

    import numpy as np

    if data[:2] != b"BM":
        raise ValueError("not a BMP stream")
    offset = struct.unpack_from("<I", data, 10)[0]
    size, w, h, _planes, bpp, compression = struct.unpack_from("<IiiHHI", data, 14)
    if size < 40 or bpp != 24 or compression != 0:
        raise NotImplementedError("only 24-bit uncompressed BMP is supported")
    flip = h > 0  # positive height = bottom-up storage
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3
    body = np.frombuffer(data, dtype=np.uint8, count=row_bytes * h, offset=offset)
    px = body.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR->RGB
    return (px[::-1] if flip else px).copy()


def encode_ppm(pixels) -> bytes:
    """(h, w, 3) uint8 RGB -> binary PPM (P6, maxval 255, top-down)."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    return f"P6\n{w} {h}\n255\n".encode() + px.tobytes()


def decode_ppm(data: bytes):
    """Binary PPM (P6) -> (h, w, 3) uint8 RGB numpy array.  Handles
    whitespace/comment-bearing headers per the netpbm spec."""
    import numpy as np

    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM stream")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":  # comment to end-of-line
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise NotImplementedError("only maxval=255 PPM is supported")
    px = np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=pos)
    return px.reshape(h, w, 3).copy()


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# channels per PNG color type (8-bit depth, non-interlaced)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def encode_png(pixels, filter_type: int = 0) -> bytes:
    """(h, w, c) or (h, w) uint8 -> PNG (8-bit, color type from the
    channel count, non-interlaced).  ``filter_type`` 0-4 applies that
    scanline filter to every row — useful to exercise each unfilter
    path; real encoders pick per row, the format allows any mix."""
    import struct
    import zlib

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    raw = bytearray()
    prev = np.zeros((w, c), dtype=np.int64)
    for y in range(h):
        row = px[y].astype(np.int64)
        left = np.vstack([np.zeros((1, c), dtype=np.int64), row[:-1]])
        ul = np.vstack([np.zeros((1, c), dtype=np.int64), prev[:-1]])
        if filter_type == 0:
            out = row
        elif filter_type == 1:  # Sub
            out = row - left
        elif filter_type == 2:  # Up
            out = row - prev
        elif filter_type == 3:  # Average
            out = row - (left + prev) // 2
        elif filter_type == 4:  # Paeth
            p = left + prev - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul))
            out = row - pred
        else:
            raise ValueError("filter_type must be 0-4")
        raw.append(filter_type)
        raw += (out % 256).astype(np.uint8).tobytes()
        prev = row
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def decode_png(data: bytes):
    """PNG -> (h, w, channels) uint8 numpy array, pure stdlib-zlib +
    numpy: chunk walk, inflate, per-scanline unfiltering (None / Sub /
    Up / Average / Paeth).  Supports 8-bit depth, color types 0/2/4/6
    (grayscale, RGB, gray+alpha, RGBA), non-interlaced — the common
    web-image shapes; anything else raises NotImplementedError."""
    import struct
    import zlib

    import numpy as np

    if data[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG stream")
    pos = len(_PNG_SIG)
    w = h = ctype = None
    idat = bytearray()
    while pos + 8 <= len(data):
        size, tag = struct.unpack_from(">I4s", data, pos)
        body = data[pos + 8 : pos + 8 + size]
        pos += 12 + size  # len + tag + body + crc
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(">IIBBBBB", body)
            if depth != 8 or ctype not in _PNG_CHANNELS or interlace:
                raise NotImplementedError(
                    "only 8-bit non-interlaced grayscale/RGB/GA/RGBA PNG is supported"
                )
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    c = _PNG_CHANNELS[ctype]
    raw = zlib.decompress(bytes(idat))
    stride = w * c
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline payload size mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int64)
        if ft == 0:
            row = line
        elif ft == 2:  # Up
            row = (line + prev) % 256
        elif ft in (1, 3, 4):
            # left-dependent filters are inherently sequential per pixel;
            # prior-row terms are vectorized, the walk is per PIXEL (c
            # lanes at once), fine for thumbnail-scale media
            row = np.empty(stride, dtype=np.int64)
            for x in range(0, stride, c):
                left = row[x - c : x] if x else np.zeros(c, dtype=np.int64)
                up = prev[x : x + c]
                if ft == 1:
                    pred = left
                elif ft == 3:
                    pred = (left + up) // 2
                else:
                    ul = prev[x - c : x] if x else np.zeros(c, dtype=np.int64)
                    p = left + up - ul
                    pa, pb, pc_ = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
                    pred = np.where(
                        (pa <= pb) & (pa <= pc_), left, np.where(pb <= pc_, up, ul)
                    )
                row[x : x + c] = (line[x : x + c] + pred) % 256
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        out[y] = row.astype(np.uint8)
        prev = row
    return out.reshape(h, w, c).copy()


def encode_wav(samples, sample_rate: int = 16000, bits: int = 16) -> bytes:
    """Samples -> canonical 44-byte-header RIFF WAV.  ``bits`` selects
    the encoding: 8 (unsigned PCM), 16/32 (signed PCM), 24 (packed
    signed PCM), or -32 for IEEE float32.  Mono; 2-D input (n, ch)
    interleaves channels."""
    import struct

    import numpy as np

    a = np.asarray(samples)
    channels = a.shape[1] if a.ndim == 2 else 1
    flat = a.reshape(-1)
    if bits == 8:
        body = flat.astype(np.uint8).tobytes()
        fmt_code, bw = 1, 1
    elif bits == 16:
        body = flat.astype("<i2").tobytes()
        fmt_code, bw = 1, 2
    elif bits == 24:
        v = flat.astype(np.int64) & 0xFFFFFF
        b = np.empty((len(v), 3), dtype=np.uint8)
        b[:, 0] = v & 0xFF
        b[:, 1] = (v >> 8) & 0xFF
        b[:, 2] = (v >> 16) & 0xFF
        body = b.tobytes()
        fmt_code, bw = 1, 3
    elif bits == 32:
        body = flat.astype("<i4").tobytes()
        fmt_code, bw = 1, 4
    elif bits == -32:
        body = flat.astype("<f4").tobytes()
        fmt_code, bw = 3, 4
    else:
        raise ValueError("bits must be 8, 16, 24, 32 or -32 (float)")
    block = bw * channels
    return (
        struct.pack("<4sI4s", b"RIFF", 36 + len(body), b"WAVE")
        + struct.pack(
            "<4sIHHIIHH", b"fmt ", 16, fmt_code, channels, sample_rate,
            sample_rate * block, block, abs(bits) if bits != -32 else 32,
        )
        + struct.pack("<4sI", b"data", len(body))
        + body
    )


def decode_wav(data: bytes):
    """RIFF WAV -> ((n, channels) numpy array, sample_rate).  Decodes
    PCM 8 (unsigned, returned as stored 0..255) / 16 / 24 (packed,
    sign-extended) / 32-bit and IEEE float32; walks the chunk list
    (fmt / data may be preceded by LIST etc.)."""
    import struct

    import numpy as np

    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, rate, channels, bits, fmt_code, body = 12, None, None, None, None, None
    while pos + 8 <= len(data):
        cid, size = struct.unpack_from("<4sI", data, pos)
        pos += 8
        if cid == b"fmt ":
            fmt_code, channels, rate = struct.unpack_from("<HHI", data, pos)
            bits = struct.unpack_from("<H", data, pos + 14)[0]
            if (fmt_code, bits) not in (
                (1, 8), (1, 16), (1, 24), (1, 32), (3, 32),
            ):
                raise NotImplementedError(
                    f"unsupported WAV encoding (format {fmt_code}, {bits}-bit);"
                    f" PCM 8/16/24/32 and float32 decode"
                )
        elif cid == b"data":
            body = data[pos : pos + size]
        pos += size + (size & 1)  # chunks are word-aligned
    if rate is None or body is None:
        raise ValueError("missing fmt/data chunk")
    if fmt_code == 3:
        s = np.frombuffer(body, dtype="<f4")
    elif bits == 8:
        s = np.frombuffer(body, dtype=np.uint8).astype(np.int16)
    elif bits == 16:
        s = np.frombuffer(body, dtype="<i2")
    elif bits == 24:
        b = np.frombuffer(body, dtype=np.uint8)
        b = b[: len(b) - len(b) % 3].reshape(-1, 3).astype(np.int64)
        v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        s = np.where(v >= 1 << 23, v - (1 << 24), v)
    else:
        s = np.frombuffer(body, dtype="<i4")
    return s.reshape(-1, channels).copy(), int(rate)


def real_media_stats(data: bytes, fmt: str) -> dict:
    """Decode one blob with the pure-numpy codecs and reduce it to
    deterministic stats: images -> dims + per-channel means (RGB order),
    audio -> sample count/rate + mean sample value.  The reduction is
    what contract queries verify against a DuckDB oracle."""
    import numpy as np

    if fmt in ("bmp", "ppm", "png", "jpeg", "jpg", "gif"):
        if fmt in ("jpeg", "jpg"):
            from hyperspace_spark.llm.jpeg import decode_jpeg

            px = decode_jpeg(data)
        elif fmt == "gif":
            from hyperspace_spark.llm.gif import decode_gif

            px = decode_gif(data)[0][0]  # stats over the FIRST frame
        else:
            px = {"bmp": decode_bmp, "ppm": decode_ppm, "png": decode_png}[fmt](data)
        h, w, c = px.shape
        means = px.reshape(-1, c).astype(np.float64).mean(axis=0)
        return {
            "width": int(w),
            "height": int(h),
            "sample_rate": None,
            "n_samples": int(w * h),
            "channel_means": [float(m) for m in means],
        }
    if fmt == "wav":
        s, rate = decode_wav(data)
        return {
            "width": None,
            "height": None,
            "sample_rate": int(rate),
            "n_samples": int(s.shape[0]),
            "channel_means": [float(s[:, c].astype(np.float64).mean()) for c in range(s.shape[1])],
        }
    raise NotImplementedError(
        f"real decoding of {fmt!r} requires a codec library not present in "
        f"this environment; supported pure-numpy formats: {REAL_DECODABLE}"
    )


def decode_features(df: "DataFrame", decode: str = "fake") -> "DataFrame":
    """media rows -> per-item feature vectors via Arrow-batched mapInPandas.

    ``decode='real'`` decodes BMP / PPM / PNG / JPEG / WAV payloads
    with the pure-numpy codecs (features = per-channel means;
    width/height from the DECODED header, not the metadata); video
    raises NotImplementedError — containers and inter-frame codecs
    genuinely need external libraries.
    """
    if decode not in ("fake", "real"):
        raise ValueError("decode must be 'fake' or 'real'")

    def _decode_batches(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        for pdf in batches:
            if decode == "real":
                stats = [
                    real_media_stats(
                        bytes(b), (m["format"] if m is not None else "") or ""
                    )
                    for b, m in zip(pdf["data"], pdf["meta"])
                ]
                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"],
                        "kind": pdf["kind"],
                        "n_bytes": pdf["data"].map(len).astype("int64"),
                        "width": pd.array([s["width"] for s in stats], dtype="Int32"),
                        "height": pd.array([s["height"] for s in stats], dtype="Int32"),
                        "features": [
                            [float(x) for x in s["channel_means"]] for s in stats
                        ],
                    }
                )
                continue
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


def sample_frames(
    df: "DataFrame",
    every_ms: int = 1000,
    max_frames: int = 8,
    decode: str = "fake",
) -> "DataFrame":
    """Video rows -> (media_id, frame_index, frame_ms, frame) rows.

    ``decode='real'`` (r10) decodes ANIMATED GIF payloads
    (``meta.format = 'gif'``) with the pure-numpy LZW codec
    (llm/gif.py), samples at most one frame per ``every_ms`` of real
    animation time, and emits each sampled frame as PNG bytes — real
    frames for the one video-adjacent format whose coding needs no
    external library; other formats raise NotImplementedError.  The
    default fake path extracts deterministic byte slices, exercising
    the plumbing — one-to-many mapInPandas with bounded output batches
    — for every format."""
    if decode not in ("fake", "real"):
        raise ValueError("decode must be 'fake' or 'real'")

    def _frames(batches):
        import pandas as pd

        for pdf in batches:
            out = {"media_id": [], "frame_index": [], "frame_ms": [], "frame": []}
            vid = pdf[pdf["kind"] == "video"]
            # zip over columns, not iterrows: no per-row Series
            # construction (the slow shape inside mapInPandas).
            for mid, data, meta in zip(vid["media_id"], vid["data"], vid["meta"]):
                data = bytes(data)
                if decode == "real":
                    fmt = (meta["format"] if meta is not None else "") or ""
                    if fmt != "gif":
                        raise NotImplementedError(
                            f"real frame sampling of {fmt!r} requires a video "
                            f"codec library not present in this environment; "
                            f"'gif' decodes via the pure-numpy LZW codec"
                        )
                    from hyperspace_spark.llm.gif import decode_gif

                    frames, delays = decode_gif(data)
                    t = 0
                    next_at = 0
                    emitted = 0
                    for fr, d in zip(frames, delays):
                        if t >= next_at and emitted < max_frames:
                            out["media_id"].append(mid)
                            out["frame_index"].append(emitted)
                            out["frame_ms"].append(int(t))
                            out["frame"].append(encode_png(fr))
                            emitted += 1
                            next_at = t + every_ms
                        t += d
                    continue
                raw = meta["duration_ms"] if meta is not None else None
                # Arrow hands nullable ints to pandas as float/NaN.
                dur = 0 if raw is None or raw != raw else int(raw)
                n = int(min(max_frames, max(1, dur // every_ms)))
                step = max(1, len(data) // max(n, 1))
                for fi in range(n):
                    out["media_id"].append(mid)
                    out["frame_index"].append(fi)
                    out["frame_ms"].append(fi * every_ms)
                    out["frame"].append(data[fi * step : fi * step + 16])
            yield pd.DataFrame(out)

    return df.mapInPandas(_frames, FRAME_SCHEMA)


def probe_mp4(data: bytes) -> dict:
    """REAL MP4/ISO-BMFF metadata probe (r10): walks the box tree
    (ftyp/moov/mvhd/trak/hdlr/stsd) with struct only — no codec — and
    returns container-level truth: brand, duration_ms (mvhd
    duration/timescale), track handler types and sample-entry fourccs.
    FRAME decode stays NotImplementedError (inter-frame codecs genuinely
    need external libraries); this closes the metadata half of the
    video surface for ingestion pipelines that route/filter on it."""
    import struct

    if len(data) < 8 or data[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF (MP4) stream")

    def walk(lo: int, hi: int):
        pos = lo
        while pos + 8 <= hi:
            size, tag = struct.unpack_from(">I4s", data, pos)
            if size == 1:  # 64-bit largesize
                size = struct.unpack_from(">Q", data, pos + 8)[0]
                body = pos + 16
            else:
                body = pos + 8
            if size == 0:
                size = hi - pos
            yield tag, body, pos + size
            pos += max(size, 8)

    out = {"brand": data[8:12].decode("latin1"), "duration_ms": None, "tracks": []}
    for tag, body, end in walk(0, len(data)):
        if tag != b"moov":
            continue
        for t2, b2, e2 in walk(body, end):
            if t2 == b"mvhd":
                version = data[b2]
                if version == 1:
                    ts, dur = struct.unpack_from(">IQ", data, b2 + 20)
                else:
                    ts, dur = struct.unpack_from(">II", data, b2 + 12)
                if ts:
                    out["duration_ms"] = int(dur * 1000 // ts)
            elif t2 == b"trak":
                track = {"handler": None, "fourcc": None}
                stack = [(b2, e2)]
                while stack:
                    lo, hi = stack.pop()
                    for t3, b3, e3 in walk(lo, hi):
                        if t3 in (b"mdia", b"minf", b"stbl"):
                            stack.append((b3, e3))
                        elif t3 == b"hdlr":
                            track["handler"] = data[b3 + 8 : b3 + 12].decode("latin1")
                        elif t3 == b"stsd":
                            n = struct.unpack_from(">I", data, b3 + 4)[0]
                            if n:
                                track["fourcc"] = data[b3 + 12 : b3 + 16].decode(
                                    "latin1"
                                )
                out["tracks"].append(track)
    return out
