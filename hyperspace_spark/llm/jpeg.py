"""Baseline JPEG (ITU-T T.81 / JFIF) codec in pure numpy — no codec
library.

Completes the multimodal real-decode surface (llm/multimodal.py r10:
BMP/PPM/PNG/WAV) with the one image format that needs entropy coding:
baseline sequential DCT, 8-bit, Huffman, 4:4:4 or 4:2:0 chroma
subsampling, optional restart intervals on the decode side.  Scope is
the overwhelmingly-common web-JPEG shape; progressive/arithmetic/12-bit
streams raise NotImplementedError loudly.

The ENCODER exists so tests and fixtures can round-trip
deterministically (standard Annex-K quantization and Huffman tables,
quality scaling per the IJG formula); the decoder is the operator.
JPEG is lossy by design — round-trip tests assert bounded mean error,
not byte equality.

Everything is vectorized where the format allows: DCT/IDCT are two
matrix multiplies per 8x8 block batched over ALL blocks of a plane at
once; only the entropy (Huffman) layer walks bit-by-bit, which is the
irreducible sequential core of the format.
"""

from __future__ import annotations

import struct


def _np():
    import numpy as np

    return np


# ---------------------------------------------------------------------------
# constants: zigzag order, Annex-K quantization + Huffman tables
# ---------------------------------------------------------------------------

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

_Q_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
]
_Q_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
]

# Annex K Huffman specs: (bits[1..16], values)
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
        0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
        0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
        0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
        0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
        0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
        0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
        0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
        0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
        0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _dct_matrix():
    np = _np()
    k = np.arange(8)
    m = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    m[0] *= 1 / np.sqrt(2)
    return m * 0.5  # orthonormal DCT-II


def _quality_tables(quality: int):
    np = _np()
    quality = max(1, min(100, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = []
    for base in (_Q_LUMA, _Q_CHROMA):
        q = (np.array(base, dtype=np.int64) * scale + 50) // 100
        out.append(np.clip(q, 1, 255).astype(np.int32))
    return out  # zigzag order, like the spec tables


def _huff_encode_table(spec):
    """(bits, values) -> {symbol: (code, length)} per T.81 C.2."""
    bits, values = spec
    codes = {}
    code = 0
    idx = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[idx]] = (code, length)
            code += 1
            idx += 1
        code <<= 1
    return codes


def _huff_decode_table(spec):
    """(bits, values) -> {(length, code): symbol}."""
    enc = _huff_encode_table(spec)
    return {(ln, cd): sym for sym, (cd, ln) in enc.items()}


# ---------------------------------------------------------------------------
# bit IO with 0xFF byte stuffing
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed byte
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                raise ValueError(f"unexpected marker 0xFF{nxt:02X} in scan")
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if not self.nbits:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_and_skip_restart(self) -> None:
        self.acc = 0
        self.nbits = 0
        # consume the restart marker (0xFF 0xD0-7)
        while self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
            self.pos += 2
            return


class _RestartMarker(Exception):
    def __init__(self, marker):
        self.marker = marker


def _huff_read(br: _BitReader, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in scan")


def _extend(v: int, t: int) -> int:
    # T.81 F.2.2.1: receive/extend — t-bit magnitude to signed value
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def _magnitude(v: int) -> tuple[int, int]:
    # signed value -> (category, t-bit code)
    t = int(v).bit_length() if v > 0 else int(-v).bit_length()
    return t, (v if v >= 0 else v + (1 << t) - 1)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _rgb_to_ycbcr(px):
    np = _np()
    f = px.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return y, cb, cr


def _plane_blocks(plane, bh: int, bw: int):
    """Pad (edge-replicate) to (bh*8, bw*8) and return (n, 8, 8) blocks
    in raster order."""
    np = _np()
    h, w = plane.shape
    out = np.empty((bh * 8, bw * 8), dtype=np.float64)
    out[:h, :w] = plane
    out[h:, :w] = plane[-1:, :]
    out[:h, w:] = plane[:, -1:]
    out[h:, w:] = plane[-1, -1]
    return (
        out.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(bh * bw, 8, 8)
    )


def encode_jpeg(
    pixels, quality: int = 85, subsampling: str = "4:4:4", restart_interval: int = 0
) -> bytes:
    """(h, w, 3) uint8 RGB -> baseline JFIF bytes (standard Annex-K
    tables scaled by ``quality``; ``subsampling`` '4:4:4' or '4:2:0';
    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every
    N MCUs — mainly to exercise the decoder's resync path)."""
    np = _np()
    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    if subsampling not in ("4:4:4", "4:2:0"):
        raise ValueError("subsampling must be '4:4:4' or '4:2:0'")
    sub = 2 if subsampling == "4:2:0" else 1
    qt = _quality_tables(quality)
    qmat = [np.empty(64, dtype=np.float64) for _ in range(2)]
    for i in range(2):
        qmat[i][ZIGZAG] = qt[i].astype(np.float64)
    m = _dct_matrix()

    y, cb, cr = _rgb_to_ycbcr(px)
    if sub == 2:  # average 2x2 for chroma
        ph = (h + 1) & ~1
        pw = (w + 1) & ~1
        padded = []
        for c in (cb, cr):
            p = np.empty((ph, pw), dtype=np.float64)
            p[:h, :w] = c
            p[h:, :w] = c[-1:, :]
            p[:h, w:] = c[:, -1:]
            p[h:, w:] = c[-1, -1]
            padded.append(p.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3)))
        cb, cr = padded

    # MCU geometry: luma blocks per MCU = sub*sub, chroma 1 each
    mcus_x = -(-w // (8 * sub))
    mcus_y = -(-h // (8 * sub))

    def dct_quant(plane, bh, bw, qi):
        blocks = _plane_blocks(plane, bh, bw) - 128.0
        coefs = np.einsum("ij,njk,lk->nil", m, blocks, m)
        flat = coefs.reshape(-1, 64) / qmat[qi].reshape(8, 8).reshape(-1)
        zz = flat.reshape(-1, 8, 8).reshape(-1, 64)[
            :, [z for z in ZIGZAG]
        ]
        return np.round(zz).astype(np.int64).reshape(bh, bw, 64)

    ymat = dct_quant(y, mcus_y * sub, mcus_x * sub, 0)
    cbmat = dct_quant(cb, mcus_y, mcus_x, 1)
    crmat = dct_quant(cr, mcus_y, mcus_x, 1)

    enc_dc = [_huff_encode_table(_DC_LUMA), _huff_encode_table(_DC_CHROMA)]
    enc_ac = [_huff_encode_table(_AC_LUMA), _huff_encode_table(_AC_CHROMA)]
    bw_ = _BitWriter()
    pred = [0, 0, 0]

    def put_block(zz, comp):
        ti = 0 if comp == 0 else 1
        diff = int(zz[0]) - pred[comp]
        pred[comp] = int(zz[0])
        t, bitsv = _magnitude(diff) if diff else (0, 0)
        code, ln = enc_dc[ti][t]
        bw_.write(code, ln)
        if t:
            bw_.write(bitsv, t)
        run = 0
        last_nz = 0
        for i in range(63, 0, -1):
            if zz[i]:
                last_nz = i
                break
        for i in range(1, last_nz + 1):
            v = int(zz[i])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = enc_ac[ti][0xF0]  # ZRL
                bw_.write(code, ln)
                run -= 16
            t, bitsv = _magnitude(v)
            code, ln = enc_ac[ti][(run << 4) | t]
            bw_.write(code, ln)
            bw_.write(bitsv, t)
            run = 0
        if last_nz != 63:
            code, ln = enc_ac[ti][0x00]  # EOB
            bw_.write(code, ln)

    scan_parts = []
    mcu_n = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for by in range(sub):
                for bx in range(sub):
                    put_block(ymat[my * sub + by, mx * sub + bx], 0)
            put_block(cbmat[my, mx], 1)
            put_block(crmat[my, mx], 2)
            mcu_n += 1
            if (
                restart_interval
                and mcu_n % restart_interval == 0
                and mcu_n < mcus_y * mcus_x
            ):
                scan_parts.append(bw_.flush())
                scan_parts.append(bytes([0xFF, 0xD0 + rst]))
                rst = (rst + 1) & 7
                bw_.__init__()
                pred[0] = pred[1] = pred[2] = 0
    scan_parts.append(bw_.flush())
    scan = b"".join(scan_parts)

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for i in range(2):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([i])
        out += bytes(int(x) for x in qt[i])
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    out += bytes([1, (sub << 4) | sub, 0])  # Y
    out += bytes([2, 0x11, 1])  # Cb
    out += bytes([3, 0x11, 1])  # Cr
    for tc_th, spec in (
        (0x00, _DC_LUMA), (0x01, _DC_CHROMA), (0x10, _AC_LUMA), (0x11, _AC_CHROMA)
    ):
        bits, values = spec
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(values)) + bytes([tc_th])
        out += bytes(bits) + bytes(values)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    out += bytes([1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def decode_jpeg(data: bytes):
    """Baseline JFIF bytes -> (h, w, 3) uint8 RGB.  Supports 8-bit
    baseline sequential Huffman streams, 1 or 3 components, sampling
    factors 1 or 2 (4:4:4 / 4:2:2 / 4:2:0), restart intervals."""
    np = _np()
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream")
    pos = 2
    qtables = {}
    htables = {}
    frame = None
    restart_interval = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack_from(">H", data, pos)
        body = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            bpos = 0
            while bpos < len(body):
                pq_tq = body[bpos]
                if pq_tq >> 4:
                    raise NotImplementedError("16-bit quant tables unsupported")
                qtables[pq_tq & 0xF] = np.frombuffer(
                    body, dtype=np.uint8, count=64, offset=bpos + 1
                ).astype(np.float64)
                bpos += 65
        elif marker == 0xC4:  # DHT
            bpos = 0
            while bpos < len(body):
                tc_th = body[bpos]
                bits = list(body[bpos + 1 : bpos + 17])
                n = sum(bits)
                values = list(body[bpos + 17 : bpos + 17 + n])
                htables[tc_th] = _huff_decode_table((bits, values))
                bpos += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            depth, fh, fw, nc = struct.unpack_from(">BHHB", body, 0)
            if depth != 8:
                raise NotImplementedError("only 8-bit JPEG is supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline sequential Huffman JPEG is supported"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan_sel = []
            for i in range(ns):
                cs, td_ta = body[1 + 2 * i : 3 + 2 * i]
                scan_sel.append((cs, td_ta >> 4, td_ta & 0xF))
            pos = pos + seglen
            return _decode_scan(
                np, data, pos, frame, scan_sel, qtables, htables, restart_interval
            )
        pos += seglen
    raise ValueError("no SOS marker found")


def _decode_scan(np, data, pos, frame, scan_sel, qtables, htables, dri):
    if frame is None:
        raise ValueError("SOS before SOF")
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax > 2 or vmax > 2:
        raise NotImplementedError("sampling factors above 2 are unsupported")
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    by_id = {c["id"]: c for c in comps}
    order = []
    for cs, td, ta in scan_sel:
        c = by_id[cs]
        c["td"], c["ta"] = td, ta
        order.append(c)
    for c in comps:
        c["coefs"] = np.zeros(
            (mcus_y * c["v"], mcus_x * c["h"], 64), dtype=np.float64
        )
    br = _BitReader(data, pos)
    pred = {c["id"]: 0 for c in comps}
    mcu = 0
    total = mcus_x * mcus_y
    while mcu < total:
        try:
            my, mx = divmod(mcu, mcus_x)
            for c in order:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.float64)
                        t = _huff_read(br, htables[0x00 | c["td"]])
                        diff = _extend(br.read_bits(t), t) if t else 0
                        pred[c["id"]] += diff
                        zz[0] = pred[c["id"]]
                        k = 1
                        while k < 64:
                            rs = _huff_read(br, htables[0x10 | c["ta"]])
                            r, t = rs >> 4, rs & 0xF
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            zz[k] = _extend(br.read_bits(t), t)
                            k += 1
                        c["coefs"][my * c["v"] + by, mx * c["h"] + bx] = zz
            mcu += 1
            if dri and mcu % dri == 0 and mcu < total:
                br.align_and_skip_restart()
                for cid in pred:
                    pred[cid] = 0
        except _RestartMarker:
            # tolerated mid-MCU restart (corrupt-tolerant resync)
            br.pos += 1
            br.acc = br.nbits = 0
            for cid in pred:
                pred[cid] = 0
    m = _dct_matrix()
    inv = np.zeros(64, dtype=np.int64)
    for i, z in enumerate(ZIGZAG):
        inv[z] = i
    planes = []
    for c in comps:
        q = qtables[c["tq"]]
        bh, bw_ = c["coefs"].shape[:2]
        zz = c["coefs"].reshape(-1, 64) * q[None, :]
        natural = zz[:, inv].reshape(-1, 8, 8)
        blocks = np.einsum("ji,njk,kl->nil", m, natural, m) + 128.0
        plane = (
            blocks.reshape(bh, bw_, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw_ * 8)
        )
        # upsample to the luma grid (nearest)
        plane = np.repeat(np.repeat(plane, vmax // c["v"], 0), hmax // c["h"], 1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        g = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=2)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)
