"""Property-based (hypothesis) tests for the r10 pure-numpy codecs:
random shapes/contents must roundtrip exactly for the lossless formats
(BMP/PPM/PNG/GIF-palette/WAV/Avro) and within quantization bounds for
JPEG.  Bounded example counts keep the suite fast; these complement the
fixed-vector tests in test_llm_ops.py / test_streaming_and_sources.py.
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from hyperspace_spark.llm import gif, jpeg, multimodal as mm
from hyperspace_spark.sources import avro_io


_dims = st.tuples(st.integers(1, 23), st.integers(1, 23))


@settings(max_examples=25, deadline=None)
@given(dims=_dims, seed=st.integers(0, 2**31 - 1))
def test_bmp_ppm_roundtrip_any_shape(dims, seed):
    h, w = dims
    px = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
    assert (mm.decode_bmp(mm.encode_bmp(px)) == px).all()
    assert (mm.decode_ppm(mm.encode_ppm(px)) == px).all()


@settings(max_examples=25, deadline=None)
@given(
    dims=_dims,
    channels=st.sampled_from([1, 2, 3, 4]),
    filter_type=st.integers(0, 4),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_any_filter_and_colortype(dims, channels, filter_type, seed):
    h, w = dims
    px = np.random.default_rng(seed).integers(
        0, 256, (h, w, channels), dtype=np.uint8
    )
    dec = mm.decode_png(mm.encode_png(px, filter_type=filter_type))
    assert dec.shape == px.shape and (dec == px).all()


@settings(max_examples=15, deadline=None)
@given(
    n_frames=st.integers(1, 4),
    dims=st.tuples(st.integers(1, 16), st.integers(1, 16)),
    seed=st.integers(0, 2**31 - 1),
)
def test_gif_palette_exact_roundtrip(n_frames, dims, seed):
    h, w = dims
    pal = gif._cube_palette()
    rng = np.random.default_rng(seed)
    frames = [pal[rng.integers(0, 252, (h, w))] for _ in range(n_frames)]
    delays = [int(d) * 10 for d in rng.integers(1, 50, n_frames)]
    got, got_delays = gif.decode_gif(gif.encode_gif(frames, delays_ms=delays))
    assert len(got) == n_frames and got_delays == delays
    for a, b in zip(got, frames):
        assert (a == b).all()


@settings(max_examples=10, deadline=None)
@given(
    dims=st.tuples(st.integers(8, 40), st.integers(8, 40)),
    quality=st.integers(70, 95),
    sub=st.sampled_from(["4:4:4", "4:2:0"]),
    seed=st.integers(0, 2**31 - 1),
)
def test_jpeg_bounded_error_smooth_images(dims, quality, sub, seed):
    h, w = dims
    rng = np.random.default_rng(seed)
    # smooth image: random low-frequency gradients (JPEG's design target)
    a, b, c = rng.uniform(0, 3, 3)
    yy, xx = np.mgrid[0:h, 0:w]
    px = np.stack(
        [
            127 + 120 * np.sin(a * xx / w + b),
            127 + 120 * np.cos(b * yy / h + c),
            127 + 120 * np.sin(c * (xx + yy) / (h + w)),
        ],
        axis=2,
    ).clip(0, 255).astype(np.uint8)
    dec = jpeg.decode_jpeg(jpeg.encode_jpeg(px, quality, sub))
    assert dec.shape == px.shape
    err = np.abs(dec.astype(float) - px.astype(float)).mean()
    # 4:2:0 halves chroma resolution; below two MCU blocks the chroma
    # interpolation error concentrates and honest JPEG output exceeds
    # the smooth-image bound (hypothesis found (8,8)/q70/4:2:0 at 9.6;
    # a 1,440-config sweep of dims 8-16 peaks at 11.1).  The looser
    # bound applies ONLY to that regime — quality is unchanged.
    limit = 8 if sub == "4:4:4" or min(h, w) >= 16 else 14
    assert err < limit, (dims, quality, sub, err)


@settings(max_examples=20, deadline=None)
@given(
    n=st.integers(0, 50),
    codec=st.sampled_from(["null", "deflate"]),
    seed=st.integers(0, 2**31 - 1),
)
def test_avro_container_roundtrip_random_rows(n, codec, seed):
    rng = np.random.default_rng(seed)
    schema = {
        "type": "record",
        "name": "t",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": ["null", "string"]},
            {"name": "c", "type": "double"},
            {"name": "d", "type": {"type": "array", "items": "int"}},
            {"name": "e", "type": "boolean"},
        ],
    }
    rows = [
        {
            "a": int(rng.integers(-(2**62), 2**62)),
            "b": None if rng.random() < 0.3 else "s" * int(rng.integers(0, 40)),
            "c": float(rng.normal() * 10**int(rng.integers(0, 12))),
            "d": [int(x) for x in rng.integers(-(2**31), 2**31 - 1, int(rng.integers(0, 5)))],
            "e": bool(rng.random() < 0.5),
        }
        for _ in range(n)
    ]
    s2, got = avro_io.read_container(avro_io.write_container(rows, schema, codec))
    assert s2 == schema and got == rows


@settings(max_examples=20, deadline=None)
@given(
    n=st.integers(0, 120),
    codec=st.sampled_from(["null", "deflate"]),
    seed=st.integers(0, 2**31 - 1),
)
def test_avro_columnar_twins_byte_identical(n, codec, seed):
    """r14: the vectorized container twins must produce the IDENTICAL
    container bytes as the per-row loop (canonical varints, field order,
    deflate level) and decode to the identical column values — the
    avro_roundtrip contract query swaps loops for twins on this proof."""
    import math

    import pandas as pd

    rng = np.random.default_rng(seed)
    schema = {
        "type": "record",
        "name": "t",
        "fields": [
            {"name": "k", "type": "long"},
            {"name": "s", "type": ["null", "string"]},
            {"name": "d", "type": "double"},
            {"name": "f", "type": ["null", "float"]},
            {"name": "i", "type": ["null", "int"]},
            {"name": "e", "type": "boolean"},
            {"name": "y", "type": ["null", "bytes"]},
        ],
    }
    rows = [
        {
            "k": int(rng.integers(-(2**62), 2**62)),
            "s": None if rng.random() < 0.3 else "s✓" * int(rng.integers(0, 40)),
            "d": float(rng.normal() * 10 ** int(rng.integers(0, 12))),
            "f": None if rng.random() < 0.3 else float(np.float32(rng.normal() * 100)),
            "i": None if rng.random() < 0.3 else int(rng.integers(-(2**31), 2**31 - 1)),
            "e": bool(rng.random() < 0.5),
            "y": None if rng.random() < 0.3 else bytes(rng.integers(0, 256, int(rng.integers(0, 9))).astype(np.uint8)),
        }
        for _ in range(n)
    ]
    names = [f["name"] for f in schema["fields"]]
    pdf = pd.DataFrame(rows) if rows else pd.DataFrame({c: [] for c in names})
    blob = avro_io.write_container(rows, schema, codec)
    assert avro_io.write_container_from_pandas(pdf, schema, codec) == blob
    _, back_rows = avro_io.read_container(blob)
    _, back_pdf = avro_io.read_container_to_pandas(blob)
    assert list(back_pdf.columns) == names and len(back_pdf) == n
    # the twins replace the row loop + per-column DataFrame build; the
    # equivalence claim is against THAT frame (pandas' int+None -> float64
    # promotion happens identically on both paths)
    ref = pd.DataFrame(
        {c: [r[c] for r in back_rows] for c in names}
        if back_rows
        else {c: [] for c in names}
    )
    for c in names:
        assert str(ref[c].dtype) == str(back_pdf[c].dtype), c
        for want, got in zip(ref[c].tolist(), back_pdf[c].tolist()):
            if isinstance(want, float) and isinstance(got, float) and math.isnan(want):
                assert math.isnan(got)
            else:
                assert want == got and type(want) is type(got), c


def test_avro_columnar_twins_fall_back_on_nested_schema():
    """Array/record fields are outside the columnar surface: the twins
    must route through the row loops, not mis-encode."""
    import pandas as pd

    schema = {
        "type": "record",
        "name": "t",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "d", "type": {"type": "array", "items": "int"}},
        ],
    }
    rows = [{"a": 1, "d": [1, 2]}, {"a": -7, "d": []}]
    blob = avro_io.write_container(rows, schema)
    assert avro_io.write_container_from_pandas(pd.DataFrame(rows), schema) == blob
    _, back = avro_io.read_container_to_pandas(blob)
    assert back.to_dict("records") == rows


@settings(max_examples=20, deadline=None)
@given(
    n=st.integers(1, 300),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip_random_samples(n, rate, seed):
    s = (
        np.random.default_rng(seed)
        .integers(-32768, 32767, n)
        .astype(np.int16)
    )
    dec, got_rate = mm.decode_wav(mm.encode_wav(s, rate))
    assert got_rate == rate and (dec[:, 0] == s).all()


@settings(max_examples=15, deadline=None)
@given(
    bits=st.sampled_from([8, 16, 24, 32, -32]),
    n=st.integers(1, 200),
    channels=st.sampled_from([1, 2]),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_depth_matrix_roundtrip(bits, n, channels, seed):
    """r10: PCM 8 (unsigned) / 16 / 24 (packed) / 32 and IEEE float32
    all roundtrip exactly, mono and stereo."""
    rng = np.random.default_rng(seed)
    shape = (n,) if channels == 1 else (n, channels)
    if bits == 8:
        s = rng.integers(0, 256, shape).astype(np.uint8)
    elif bits == -32:
        s = rng.normal(size=shape).astype(np.float32)
    else:
        lim = 1 << (bits - 1)
        s = rng.integers(-lim, lim - 1, shape).astype(np.int64)
    dec, rate = mm.decode_wav(mm.encode_wav(s, 12345, bits=bits))
    assert rate == 12345 and dec.shape == (n, channels)
    flat = s.reshape(n, channels)
    if bits == -32:
        assert np.array_equal(dec, flat)
    else:
        assert (dec == flat.astype(np.int64)).all()
