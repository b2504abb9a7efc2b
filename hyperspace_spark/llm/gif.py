"""GIF87a/89a codec in pure numpy — LZW, palettes, animation frames.

Completes the multimodal frame-sampling story: an animated GIF is the
one video-adjacent format whose frames decode with no codec library
(LZW is table-driven), so `multimodal.sample_frames(decode='real')` can
emit REAL frames for it while true video codecs stay env-blocked.

Decoder: header + logical screen, global/local color tables, graphic
control extensions (per-frame delays, transparency index), image
descriptors with x/y offsets and interlacing, LZW decompression with
code growth / clear / EOI, frame compositing onto the logical screen
(disposal 0/1 = leave, 2 = restore background).  Returns RGB frames.

Encoder (fixtures/tests): deterministic 6x7x6 uniform-cube palette
(252 colors) + nearest-cell quantization, LZW compression with code
growth and table resets, optional per-frame delays -> animated GIF89a.
"""

from __future__ import annotations

import struct


def _np():
    import numpy as np

    return np


# ---------------------------------------------------------------------------
# palette: deterministic 6x7x6 uniform cube (252 entries, padded to 256)
# ---------------------------------------------------------------------------

_CUBE = (6, 7, 6)


def _cube_palette():
    np = _np()
    r = np.linspace(0, 255, _CUBE[0]).round()
    g = np.linspace(0, 255, _CUBE[1]).round()
    b = np.linspace(0, 255, _CUBE[2]).round()
    pal = np.zeros((256, 3), dtype=np.uint8)
    i = 0
    for rv in r:
        for gv in g:
            for bv in b:
                pal[i] = (rv, gv, bv)
                i += 1
    return pal


def _quantize(px):
    """(h, w, 3) uint8 -> palette indices into _cube_palette()."""
    np = _np()
    f = px.astype(np.float64)
    ri = np.clip(np.round(f[..., 0] / 255 * (_CUBE[0] - 1)), 0, _CUBE[0] - 1)
    gi = np.clip(np.round(f[..., 1] / 255 * (_CUBE[1] - 1)), 0, _CUBE[1] - 1)
    bi = np.clip(np.round(f[..., 2] / 255 * (_CUBE[2] - 1)), 0, _CUBE[2] - 1)
    return (ri * _CUBE[1] * _CUBE[2] + gi * _CUBE[2] + bi).astype(np.int32)


# ---------------------------------------------------------------------------
# LZW
# ---------------------------------------------------------------------------


def _lzw_encode(indices, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code, width):
        nonlocal acc, nbits
        acc |= code << nbits  # GIF is LSB-first
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    prefix: tuple = ()
    for sym in indices:
        cand = prefix + (int(sym),)
        if cand in table:
            prefix = cand
            continue
        emit(table[prefix], width)
        table[cand] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code >= 4095:  # reset before the table overflows
            emit(clear, width)
            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        prefix = (int(sym),)
    if prefix:
        emit(table[prefix], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int, expected: int):
    np = _np()
    clear = 1 << min_code_size
    eoi = clear + 1
    pos = 0
    acc = 0
    nbits = 0
    width = min_code_size + 1
    table = [(i,) for i in range(clear)] + [(), ()]
    prev = None
    out = []

    def read_code():
        nonlocal acc, nbits, pos
        while nbits < width:
            if pos >= len(data):
                return eoi
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return code

    while len(out) < expected:
        code = read_code()
        if code == clear:
            table = [(i,) for i in range(clear)] + [(), ()]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + (entry[0],))
        elif code == len(table):
            entry = prev + (prev[0],)
            table.append(entry)
        else:
            raise ValueError("corrupt LZW stream (code beyond table)")
        out.extend(entry)
        if prev is not None and len(table) == (1 << width) and width < 12:
            width += 1
        prev = entry
    return np.array(out[:expected], dtype=np.int32)


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------


def encode_gif(frames, delays_ms=None) -> bytes:
    """One (h, w, 3) array or a list of them -> GIF89a (animated when
    several frames; ``delays_ms`` per frame, default 100ms)."""
    np = _np()
    if not isinstance(frames, (list, tuple)):
        frames = [frames]
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    h, w, _ = frames[0].shape
    if any(f.shape != frames[0].shape for f in frames):
        raise ValueError("all frames must share one shape")
    delays_ms = list(delays_ms or [100] * len(frames))
    pal = _cube_palette()
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)  # GCT, 256 entries
    out += pal.tobytes()
    if len(frames) > 1:
        # Netscape looping extension
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for f, delay in zip(frames, delays_ms):
        out += b"\x21\xf9\x04\x04" + struct.pack("<H", max(1, delay // 10)) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)  # no LCT, sequential
        idx = _quantize(f).reshape(-1)
        out.append(8)  # LZW min code size
        payload = _lzw_encode(idx, 8)
        for i in range(0, len(payload), 255):
            block = payload[i : i + 255]
            out.append(len(block))
            out += block
        out.append(0)  # block terminator
    out += b"\x3b"  # trailer
    return bytes(out)


def decode_gif(data: bytes):
    """GIF bytes -> (list of (h, w, 3) uint8 RGB frames, list of
    per-frame delays in ms)."""
    np = _np()
    if data[:4] != b"GIF8" or data[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF stream")
    w, h, flags, bg, _ = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(data, dtype=np.uint8, count=n * 3, offset=pos).reshape(
            n, 3
        )
        pos += n * 3
    screen = np.zeros((h, w, 3), dtype=np.uint8)
    if gct is not None:
        screen[:] = gct[bg % len(gct)]
    frames = []
    delays = []
    delay = 100
    transparent = None
    disposal = 0
    while pos < len(data):
        b = data[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = data[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                size = data[pos]
                gflags = data[pos + 1]
                (d,) = struct.unpack_from("<H", data, pos + 2)
                delay = d * 10 or 100
                disposal = (gflags >> 2) & 7
                transparent = data[pos + 4] if gflags & 1 else None
                pos += size + 1
            # skip remaining sub-blocks of any extension
            while data[pos]:
                pos += data[pos] + 1
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02X}")
        ix, iy, iw, ih, iflags = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        lct = gct
        if iflags & 0x80:
            n = 2 << (iflags & 7)
            lct = np.frombuffer(
                data, dtype=np.uint8, count=n * 3, offset=pos
            ).reshape(n, 3)
            pos += n * 3
        if lct is None:
            raise ValueError("image block with no color table")
        min_code = data[pos]
        pos += 1
        payload = bytearray()
        while data[pos]:
            n = data[pos]
            payload += data[pos + 1 : pos + 1 + n]
            pos += n + 1
        pos += 1
        idx = _lzw_decode(bytes(payload), min_code, iw * ih).reshape(ih, iw)
        if iflags & 0x40:  # interlaced: reorder rows per the 4-pass scheme
            deinter = np.empty_like(idx)
            rows = (
                list(range(0, ih, 8))
                + list(range(4, ih, 8))
                + list(range(2, ih, 4))
                + list(range(1, ih, 2))
            )
            deinter[rows] = idx
            idx = deinter
        region = screen[iy : iy + ih, ix : ix + iw].copy()
        colors = lct[np.clip(idx, 0, len(lct) - 1)]
        if transparent is not None:
            mask = (idx != transparent)[..., None]
            region = np.where(mask, colors, region)
        else:
            region = colors
        prev_region = screen[iy : iy + ih, ix : ix + iw].copy()
        screen[iy : iy + ih, ix : ix + iw] = region
        frames.append(screen.copy())
        delays.append(delay)
        if disposal == 2:  # restore to background
            screen[iy : iy + ih, ix : ix + iw] = (
                gct[bg % len(gct)] if gct is not None else 0
            )
        elif disposal == 3:  # restore to previous
            screen[iy : iy + ih, ix : ix + iw] = prev_region
        transparent = None
        disposal = 0
    return frames, delays
