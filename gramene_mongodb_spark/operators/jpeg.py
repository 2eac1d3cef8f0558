"""Baseline JPEG (ITU-T T.81) entropy codec — pure Python + numpy.

The one capability stub left after round 10 was compressed-image entropy
decode (`multimodal.decode_pixels` covered PNG/BMP/PPM only; real web
image corpora are overwhelmingly JPEG). No imaging library ships in this
sandbox, so this module implements BOTH DCT processes found in the wild
from the public spec: the baseline sequential process AND the full
progressive process (spectral selection + successive approximation +
EOB-run coding, T.81 §G) — the decoder is interop-verified against real
libjpeg-produced files, including a real progressive photograph (see
tests/test_jpeg.py). Shared machinery: Huffman entropy coding (Annex K
tables for the baseline encoder; flat spec-valid tables for the
progressive encoder, since Annex K carries no EOBn symbols; arbitrary
DHT on decode), zigzag + quantization (Annex K base tables scaled by
the libjpeg quality formula), 8×8 DCT/IDCT as an orthonormal matrix
product, JFIF YCbCr colorimetry (ITU-T T.871), 4:4:4 and 4:2:0 chroma
layouts, and restart markers.

Design rules that make it oracle-replayable and test-tight:

* EVERY rounding step is ``floor(x + 0.5)`` on an IEEE double — the
  same expression a SQL oracle can evaluate. Given identical double
  inputs the two engines agree bit-for-bit, so there is no hidden
  "rounding tolerance" between engine and oracle.
* DC-only blocks (all AC quantized to zero — e.g. any solid-color
  block) decode through an EXACT fast path: a constant block whose
  value is ``dc/8`` (a power-of-two division, exact in binary floating
  point). This is the standard reduced-IDCT optimization every real
  decoder has, and it makes solid-color fixtures bit-predictable by
  arithmetic alone: color → YCbCr → quantized DC → reconstructed
  pixel is a closed-form integer/double chain a DuckDB oracle replays.
* The general path is a float64 ``Aᵀ·C·A`` IDCT; the test suite runs a
  naive O(N⁴) spec-literal IDCT beside it as a differential.

The encoder exists to build REAL compressed fixtures worker-side (the
same role ``encode_png``/``make_mp3`` play); the decoder is the
production kernel behind ``multimodal.decode_pixels`` for JPEG
payloads. Reference analog: the reference repo handles packed binary
blobs (`search/genetree_adder.js:25-46`) but has no image pipeline —
this is extension surface for multimodal training-data curation.
"""

from __future__ import annotations

import struct as _struct

import numpy as np

# ---------------------------------------------------------------------------
# spec tables (ITU-T T.81 Annex K)
# ---------------------------------------------------------------------------

#: zigzag scan order: index i in the scan → (row, col) in the 8×8 block
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)

#: Annex K.1 luminance / K.2 chrominance base quantization tables
#: (natural row-major order)
BASE_QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)
BASE_QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)

# Annex K.3 typical Huffman tables: (BITS counts per code length 1..16,
# HUFFVAL symbol list). These feed both the encoder and the DHT
# segments it writes; the decoder reads whatever DHT the stream carries.
HUFF_DC_LUMA = (
    (0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0),
    tuple(range(12)),
)
HUFF_DC_CHROMA = (
    (0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0),
    tuple(range(12)),
)
HUFF_AC_LUMA = (
    (0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D),
    (0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
     0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
     0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
     0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
     0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
     0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
     0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
     0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
     0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
     0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
     0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
     0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
     0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
     0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
     0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
     0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
     0xF9, 0xFA),
)
HUFF_AC_CHROMA = (
    (0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77),
    (0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
     0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
     0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
     0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
     0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
     0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
     0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
     0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
     0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
     0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
     0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
     0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
     0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
     0xF9, 0xFA),
)

#: decode-side dimension ceiling (≈16 Mpixel, 4096×4096): a fuzzed SOF
#: header must not drive a multi-GB coefficient allocation before any
#: entropy data is validated — and a pure-Python entropy decode past
#: this size is outside this codec's performance envelope anyway.
MAX_PIXELS = 1 << 24

# ---------------------------------------------------------------------------
# shared arithmetic
# ---------------------------------------------------------------------------


def quant_scale(quality: int) -> int:
    """libjpeg quality → percent-scale: 5000//q below 50, 200−2q above.
    Integer arithmetic so an oracle replays it with // and CASE."""
    quality = max(1, min(100, int(quality)))
    return 5000 // quality if quality < 50 else 200 - 2 * quality


def quant_table(base: np.ndarray, quality: int) -> np.ndarray:
    """Scaled quantization table: clamp((base·scale + 50) // 100, 1, 255)
    — the exact libjpeg integer formula, SQL-replayable."""
    scale = quant_scale(quality)
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


def _round_half_up(x: np.ndarray) -> np.ndarray:
    # floor(x + 0.5): THE rounding convention of this codec, chosen
    # because a SQL oracle evaluates the identical double expression
    return np.floor(x + 0.5)


#: orthonormal 8×8 DCT matrix: A[u, x] = C(u)/2 · cos((2x+1)uπ/16);
#: forward coefs = A·f·Aᵀ, inverse f = Aᵀ·C·A
_DCT_A = np.zeros((8, 8), dtype=np.float64)
for _u in range(8):
    _c = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _DCT_A[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def idct_2d(coefs: np.ndarray) -> np.ndarray:
    """Float64 inverse DCT of one (or a stack of) 8×8 coefficient
    blocks. DC-only blocks take the exact constant path (dc/8 is a
    power-of-two division — no float fuzz), which is what makes
    solid-color fixtures arithmetic-predictable end to end."""
    coefs = np.asarray(coefs, dtype=np.float64)
    single = coefs.ndim == 2
    c = coefs[None] if single else coefs
    out = np.einsum("ux,nuv,vy->nxy", _DCT_A, c, _DCT_A, optimize=True)
    dc_only = (c.reshape(len(c), 64)[:, 1:] == 0).all(axis=1)
    if dc_only.any():
        out[dc_only] = (c[dc_only, 0, 0] / 8.0)[:, None, None]
    return out[0] if single else out


def fdct_2d(blocks: np.ndarray) -> np.ndarray:
    """Float64 forward DCT of a stack of 8×8 sample blocks. Constant
    (flat) blocks take the exact path — DC = 8·value with zero AC —
    mirroring :func:`idct_2d`'s DC-only shortcut, so a solid-color
    image's whole encode→decode chain stays in exact arithmetic (the
    einsum accumulation would otherwise yield 8v±ε and could flip a
    quantization tie against the closed-form oracle)."""
    blocks = np.asarray(blocks, np.float64)
    out = np.einsum("ux,nxy,vy->nuv", _DCT_A, blocks, _DCT_A, optimize=True)
    r = blocks.reshape(len(blocks), 64)
    flat = (r == r[:, :1]).all(axis=1)
    if flat.any():
        out[flat] = 0.0
        out[flat, 0, 0] = r[flat, 0] * 8.0
    return out


def rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    """JFIF (ITU-T T.871) full-range color transform, rounded
    floor(x+0.5) and clamped — returns int64 (..., 3) YCbCr."""
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    out = np.stack([y, cb, cr], axis=-1)
    return np.clip(_round_half_up(out), 0, 255).astype(np.int64)


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    """Inverse JFIF transform, floor(x+0.5) + clamp — int64 (..., 3)."""
    y = ycc[..., 0].astype(np.float64)
    cb = ycc[..., 1].astype(np.float64) - 128.0
    cr = ycc[..., 2].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    out = np.stack([r, g, b], axis=-1)
    return np.clip(_round_half_up(out), 0, 255).astype(np.int64)


# ---------------------------------------------------------------------------
# Huffman machinery
# ---------------------------------------------------------------------------


def _canonical_codes(bits, values) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) per the spec's canonical assignment
    (Annex C): codes of each length are consecutive, lengths ascending."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def pad_to_byte(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec


def _magnitude(v: int) -> tuple[int, int]:
    """DC/AC coefficient → (SSSS category, appended-bits value)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    ssss = a.bit_length()
    bits = v if v > 0 else v + (1 << ssss) - 1
    return ssss, bits


class _BitReader:
    """Marker-aware entropy-segment bit reader: un-stuffs 0xFF00 and
    stops at any other marker (the caller handles RSTn)."""
    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("JPEG entropy data truncated")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
            if nxt == 0x00:
                self.pos += 2
            else:
                raise ValueError("marker inside entropy segment")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bits(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def align_to_marker(self) -> int:
        """Drop partial byte, expect a marker, return its second byte."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        p = self.pos
        while p + 1 < len(d) and d[p] == 0xFF and d[p + 1] == 0xFF:
            p += 1  # fill bytes before a marker are legal
        if p + 1 >= len(d) or d[p] != 0xFF:
            raise ValueError("expected marker in entropy stream")
        self.pos = p + 2
        return d[p + 1]


class _HuffDecoder:
    """Canonical Huffman decode table: walks first-code/max-code per
    length — O(code length) per symbol, no giant LUT, spec Annex F."""
    __slots__ = ("mincode", "maxcode", "valptr", "values")

    def __init__(self, bits, values) -> None:
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        self.values = list(values)
        code = 0
        k = 0
        for length in range(1, 17):
            n = bits[length - 1]
            if n:
                self.valptr[length] = k
                self.mincode[length] = code
                code += n
                k += n
                self.maxcode[length] = code - 1
            code <<= 1

    def decode(self, reader: _BitReader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | reader.bits(1)
            if self.maxcode[length] >= code >= self.mincode[length]:
                return self.values[self.valptr[length] + code - self.mincode[length]]
        raise ValueError("invalid Huffman code")


def _extend(bits_val: int, ssss: int) -> int:
    """Annex F EXTEND: appended bits → signed coefficient value."""
    if ssss == 0:
        return 0
    if bits_val < (1 << (ssss - 1)):
        return bits_val - (1 << ssss) + 1
    return bits_val


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _component_plane(
    ycc: np.ndarray, comp: int, h_samp: int, v_samp: int, h_max: int, v_max: int
) -> np.ndarray:
    """Extract one component's sample plane at its sampling resolution.
    Chroma downsampling is a floor(mean + 0.5) over each (v_max/v ×
    h_max/h) cell — the box filter, so the oracle can replay it."""
    plane = ycc[..., comp].astype(np.float64)
    fy, fx = v_max // v_samp, h_max // h_samp
    if fy == 1 and fx == 1:
        return plane.astype(np.int64)
    h, w = plane.shape
    ph, pw = -(-h // fy) * fy, -(-w // fx) * fx
    padded = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    cells = padded.reshape(ph // fy, fy, pw // fx, fx)
    return np.clip(
        _round_half_up(cells.mean(axis=(1, 3))), 0, 255
    ).astype(np.int64)


def _blockize(plane: np.ndarray, bw: int, bh: int) -> np.ndarray:
    """Pad a plane (edge replication) to (8·bh, 8·bw) and return the
    (bh·bw, 8, 8) block stack in raster order."""
    h, w = plane.shape
    padded = np.pad(plane, ((0, 8 * bh - h), (0, 8 * bw - w)), mode="edge")
    return (
        padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(bh * bw, 8, 8)
    )


def encode_jpeg_baseline(
    width: int,
    height: int,
    pixels: bytes,
    quality: int = 75,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """REAL baseline JFIF encoder (stdlib + numpy): RGB24 row-major
    bytes → SOI/APP0/DQT/SOF0/DHT/SOS stream with Annex-K Huffman and
    quality-scaled Annex-K quantization. ``subsampling`` is ``"444"``
    or ``"420"``; ``restart_interval`` > 0 emits DRI + RSTn markers
    every N MCUs (the resync feature a decoder must honor)."""
    if subsampling not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    rgb = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width, 3)
    ycc = rgb_to_ycbcr(rgb)
    h_max = v_max = 2 if subsampling == "420" else 1
    samp = [(h_max, v_max), (1, 1), (1, 1)]
    qluma = quant_table(BASE_QUANT_LUMA, quality)
    qchroma = quant_table(BASE_QUANT_CHROMA, quality)
    qtabs = [qluma, qchroma, qchroma]

    # MCU grid sized by the max-sampling component
    mcux = -(-width // (8 * h_max))
    mcuy = -(-height // (8 * v_max))

    # per component: quantized coefficient blocks in raster order
    comp_blocks: list[np.ndarray] = []
    comp_bw: list[int] = []
    for ci in range(3):
        hs, vs = samp[ci]
        plane = _component_plane(ycc, ci, hs, vs, h_max, v_max)
        bw, bh = mcux * hs, mcuy * vs
        blocks = _blockize(plane, bw, bh) - 128
        coefs = fdct_2d(blocks)
        q = qtabs[ci].reshape(8, 8).astype(np.float64)
        comp_blocks.append(
            _round_half_up(coefs / q).astype(np.int64)
        )
        comp_bw.append(bw)

    dc_codes = [_canonical_codes(*HUFF_DC_LUMA), _canonical_codes(*HUFF_DC_CHROMA)]
    ac_codes = [_canonical_codes(*HUFF_AC_LUMA), _canonical_codes(*HUFF_AC_CHROMA)]
    zz_r, zz_c = ZIGZAG // 8, ZIGZAG % 8

    writer = _BitWriter()
    pred = [0, 0, 0]
    out_tail = bytearray()

    def emit_block(ci: int, block: np.ndarray) -> None:
        tsel = 0 if ci == 0 else 1
        zz = block[zz_r, zz_c]
        diff = int(zz[0]) - pred[ci]
        pred[ci] = int(zz[0])
        ssss, bits_val = _magnitude(diff)
        code, ln = dc_codes[tsel][ssss]
        writer.write(code, ln)
        if ssss:
            writer.write(bits_val, ssss)
        run = 0
        last_nz = 0
        nz = np.nonzero(zz[1:])[0]
        last_nz = (nz[-1] + 1) if len(nz) else 0
        for i in range(1, last_nz + 1):
            v = int(zz[i])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_codes[tsel][0xF0]  # ZRL
                writer.write(code, ln)
                run -= 16
            ssss, bits_val = _magnitude(v)
            code, ln = ac_codes[tsel][(run << 4) | ssss]
            writer.write(code, ln)
            writer.write(bits_val, ssss)
            run = 0
        if last_nz < 63:
            code, ln = ac_codes[tsel][0x00]  # EOB
            writer.write(code, ln)

    mcu_index = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                writer.pad_to_byte()
                out_tail += bytes(writer.buf)
                writer.buf = bytearray()
                out_tail += bytes((0xFF, 0xD0 + rst))
                rst = (rst + 1) % 8
                pred[:] = [0, 0, 0]
            for ci in range(3):
                hs, vs = samp[ci]
                for by in range(vs):
                    for bx in range(hs):
                        idx = (my * vs + by) * comp_bw[ci] + (mx * hs + bx)
                        emit_block(ci, comp_blocks[ci][idx])
            mcu_index += 1
    writer.pad_to_byte()
    out_tail += bytes(writer.buf)

    # --- segment assembly ---
    def seg(marker: int, body: bytes) -> bytes:
        return bytes((0xFF, marker)) + _struct.pack(">H", 2 + len(body)) + body

    app0 = seg(0xE0, b"JFIF\x00\x01\x01\x00" + _struct.pack(">HH", 1, 1) + b"\x00\x00")
    dqt = seg(0x00DB & 0xFF, bytes([0]) + bytes(qluma[ZIGZAG].astype(np.uint8)))
    dqt += seg(0xDB, bytes([1]) + bytes(qchroma[ZIGZAG].astype(np.uint8)))
    sof_body = b"\x08" + _struct.pack(">HH", height, width) + b"\x03"
    for ci, (hs, vs) in enumerate(samp):
        sof_body += bytes((ci + 1, (hs << 4) | vs, 0 if ci == 0 else 1))
    sof0 = seg(0xC0, sof_body)
    dht = b""
    for cls, tid, (bits, values) in (
        (0, 0, HUFF_DC_LUMA), (1, 0, HUFF_AC_LUMA),
        (0, 1, HUFF_DC_CHROMA), (1, 1, HUFF_AC_CHROMA),
    ):
        dht += seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(values))
    dri = seg(0xDD, _struct.pack(">H", restart_interval)) if restart_interval else b""
    sos_body = b"\x03"
    for ci in range(3):
        td_ta = 0 if ci == 0 else 0x11
        sos_body += bytes((ci + 1, td_ta))
    sos_body += b"\x00\x3f\x00"
    sos = seg(0xDA, sos_body)
    return (
        b"\xff\xd8" + app0 + dqt + sof0 + dht + dri + sos
        + bytes(out_tail) + b"\xff\xd9"
    )


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def decode_jpeg(payload: bytes, idct=idct_2d) -> tuple[int, int, int, bytes]:
    """REAL JPEG entropy decode → (width, height, 3, RGB24 bytes).

    Supports BOTH DCT processes actually found in web corpora:

    * **Baseline/extended sequential** (SOF0/SOF1): one scan, full
      DC+AC per block.
    * **Progressive** (SOF2): any legal scan script — spectral
      selection (per-band AC scans, interleaved or single-component DC
      scans) AND successive approximation (DC/AC first passes at
      reduced precision plus refinement passes), with EOB-run coding
      in both first and refinement AC scans, per ITU-T T.81 §G.
      Verified against a real libjpeg progressive photograph (see
      tests/test_jpeg.py interop tests).

    Common machinery: 8-bit samples, 1 or 3 components, sampling
    factors 1–2 (4:4:4/4:2:2/4:2:0), arbitrary DHT/DQT (16-bit DQT
    precision), restart intervals, tables redefined between scans.
    Non-interleaved scans iterate the component's TRUE block grid
    (ceil(comp_size/8)), not the MCU-padded grid — the rule baseline
    single-component images rely on too. Coefficients accumulate
    across scans and dequantize once at the end, so the DC-only exact
    path (and the solid-color oracle arithmetic) is identical for both
    processes.

    Raises ``ValueError`` on arithmetic-coded/lossless/hierarchical
    processes, missing segments, or corrupt entropy data — callers
    quarantine.

    ``idct`` is injectable so the test suite can run the spec-literal
    O(N⁴) reference IDCT through the IDENTICAL parse/upsample path as a
    differential against the production matrix kernel."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, _HuffDecoder] = {}
    ac_tabs: dict[int, _HuffDecoder] = {}
    frame = None   # (width, height, comps=[(cid, hs, vs, tq)], progressive)
    geo = None     # per comp: dict(hs, vs, bw, bh, tbw, tbh)
    coefs = None   # per comp: (bh*bw, 64) int64, ZIGZAG order
    restart_interval = 0
    any_scan = False

    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad marker alignment")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM / stray RST
            pos += 2
            continue
        size = _struct.unpack(">H", payload[pos + 2 : pos + 4])[0]
        body = payload[pos + 4 : pos + 2 + size]
        if marker == 0xDB:  # DQT — possibly several tables per segment
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0x0F
                p += 1
                if pq:
                    tab = np.frombuffer(body[p : p + 128], dtype=">u2").astype(np.int64)
                    p += 128
                else:
                    tab = np.frombuffer(body[p : p + 64], dtype=np.uint8).astype(np.int64)
                    p += 64
                qtables[tq] = tab.copy()  # kept in ZIGZAG order
        elif marker == 0xC4:  # DHT — possibly several tables
            p = 0
            while p < len(body):
                cls, tid = body[p] >> 4, body[p] & 0x0F
                bits = tuple(body[p + 1 : p + 17])
                n = sum(bits)
                values = tuple(body[p + 17 : p + 17 + n])
                (ac_tabs if cls else dc_tabs)[tid] = _HuffDecoder(bits, values)
                p += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # sequential / progressive
            if body[0] != 8:
                raise ValueError("only 8-bit precision supported")
            h, w = _struct.unpack(">HH", body[1:5])
            ncomp = body[5]
            comps = []
            for i in range(ncomp):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            if not (1 <= ncomp <= 3):
                raise ValueError("unsupported component count")
            if w == 0 or h == 0 or w * h > MAX_PIXELS:
                raise ValueError(
                    f"image dimensions {w}x{h} outside supported range"
                )
            h_max = max(c[1] for c in comps)
            v_max = max(c[2] for c in comps)
            if h_max > 2 or v_max > 2:
                raise ValueError("sampling factors above 2 unsupported")
            mcux = -(-w // (8 * h_max))
            mcuy = -(-h // (8 * v_max))
            geo = []
            coefs = []
            for cid, hs, vs, tq in comps:
                bw, bh = mcux * hs, mcuy * vs
                # true (non-MCU-padded) block grid: ceil(ceil(dim·s/s_max)/8)
                comp_w = -(-(w * hs) // h_max)
                comp_h = -(-(h * vs) // v_max)
                tbw = -(-comp_w // 8)
                tbh = -(-comp_h // 8)
                geo.append({"hs": hs, "vs": vs, "bw": bw, "bh": bh,
                            "tbw": tbw, "tbh": tbh})
                coefs.append(np.zeros((bh * bw, 64), dtype=np.int64))
            frame = (w, h, comps, marker == 0xC2, h_max, v_max, mcux, mcuy)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported JPEG process (SOF{marker - 0xC0})")
        elif marker == 0xDD:
            restart_interval = _struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = []
            for i in range(ns):
                cs, tdta = body[1 + 2 * i : 3 + 2 * i]
                scan.append((cs, tdta >> 4, tdta & 0x0F))
            ss, se, ahal = body[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            pos = _decode_scan_into(
                payload, pos + 2 + size, frame, geo, coefs, scan,
                ss, se, ah, al, dc_tabs, ac_tabs, restart_interval,
            )
            any_scan = True
            continue
        pos += 2 + size

    if frame is None or not any_scan:
        raise ValueError("no SOS segment (header-only or truncated JPEG)")

    width, height, comps, _prog, h_max, v_max, mcux, mcuy = frame
    zz_r, zz_c = ZIGZAG // 8, ZIGZAG % 8
    planes = []
    for ci, (cid, hs, vs, tq) in enumerate(comps):
        if tq not in qtables:
            raise ValueError(f"missing DQT {tq}")
        g = geo[ci]
        deq = coefs[ci] * qtables[tq][None, :]  # both in zigzag order
        blocks = np.zeros((len(deq), 8, 8), dtype=np.int64)
        blocks[:, zz_r, zz_c] = deq
        spatial = idct(blocks)
        samples = np.clip(
            _round_half_up(np.asarray(spatial, np.float64) + 128.0), 0, 255
        ).astype(np.int64)
        bw, bh = g["bw"], g["bh"]
        plane = (
            samples.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        )
        # nearest (pixel-replication) chroma upsample — the box-filter
        # inverse, and the convention the fixtures' oracles replay
        fy, fx = v_max // vs, h_max // hs
        if fy > 1 or fx > 1:
            plane = plane.repeat(fy, axis=0).repeat(fx, axis=1)
        planes.append(plane[:height, :width])

    if len(planes) == 1:
        y = planes[0]
        rgb = np.stack([y, y, y], axis=-1)
    else:
        rgb = ycbcr_to_rgb(np.stack(planes, axis=-1))
    return width, height, 3, np.ascontiguousarray(rgb.astype(np.uint8)).tobytes()


#: back-compat alias (the round-11 baseline-only entry point grew
#: progressive support in place; decode_pixels dispatches decode_jpeg)
decode_jpeg_baseline = decode_jpeg


def _decode_scan_into(
    payload, pos, frame, geo, coefs, scan, ss, se, ah, al,
    dc_tabs, ac_tabs, restart_interval,
):
    """Decode ONE scan's entropy data into the per-component zigzag
    coefficient arrays; returns the stream position of the next marker.
    Handles all four progressive scan types plus full sequential scans,
    interleaved (MCU order, padded grid) and single-component
    (raster order over the TRUE block grid) layouts, and restarts."""
    width, height, comps, progressive, h_max, v_max, mcux, mcuy = frame
    id_to_ci = {c[0]: i for i, c in enumerate(comps)}
    sel = []
    for cs, td, ta in scan:
        if cs not in id_to_ci:
            raise ValueError(f"scan references unknown component {cs}")
        ci = id_to_ci[cs]
        need_dc = ss == 0 and (not progressive or ah == 0)
        need_dc_refine = progressive and ss == 0 and ah > 0
        need_ac = se > 0
        if (need_dc and td not in dc_tabs) and not need_dc_refine:
            raise ValueError("missing DC DHT table")
        if need_ac and ta not in ac_tabs:
            raise ValueError("missing AC DHT table")
        sel.append((ci, dc_tabs.get(td), ac_tabs.get(ta)))
    if progressive and ss > 0 and len(sel) != 1:
        raise ValueError("progressive AC scans must be single-component")
    if progressive and ss == 0 and se != 0:
        raise ValueError("progressive DC scan must have Se=0")
    if progressive and (ss > 63 or se > 63 or se < ss):
        raise ValueError("invalid spectral band")
    if not progressive and (ss != 0 or se != 63 or ah or al):
        raise ValueError("sequential scan with progressive parameters")

    reader = _BitReader(payload, pos)
    pred = [0] * len(comps)
    state = {"eobrun": 0}
    p1, m1 = 1 << al, -(1 << al)

    def decode_sequential(zz, dtab, atab, ci):
        ssss = dtab.decode(reader)
        diff = _extend(reader.bits(ssss), ssss) if ssss else 0
        pred[ci] += diff
        zz[0] = pred[ci]
        k = 1
        while k < 64:
            rs = atab.decode(reader)
            r, sz = rs >> 4, rs & 0x0F
            if sz == 0:
                if r == 15:
                    k += 16
                    continue
                break
            k += r
            if k > 63:
                raise ValueError("AC index overflow")
            zz[k] = _extend(reader.bits(sz), sz)
            k += 1

    def decode_dc_first(zz, dtab, ci):
        ssss = dtab.decode(reader)
        diff = _extend(reader.bits(ssss), ssss) if ssss else 0
        pred[ci] += diff
        zz[0] = pred[ci] << al

    def decode_dc_refine(zz):
        if reader.bits(1):
            zz[0] |= p1

    def decode_ac_first(zz, atab):
        if state["eobrun"] > 0:
            state["eobrun"] -= 1
            return
        k = ss
        while k <= se:
            rs = atab.decode(reader)
            r, sz = rs >> 4, rs & 0x0F
            if sz == 0:
                if r == 15:
                    k += 16
                    continue
                state["eobrun"] = (1 << r) - 1
                if r:
                    state["eobrun"] += reader.bits(r)
                break
            k += r
            if k > se:
                raise ValueError("AC band overflow")
            zz[k] = _extend(reader.bits(sz), sz) << al
            k += 1

    def decode_ac_refine(zz, atab):
        # T.81 G.1.2.3 / the libjpeg refinement algorithm: newly
        # significant coefficients arrive as ±1<<Al with a sign bit;
        # every nonzero-HISTORY coefficient passed along the way (and,
        # inside an EOB run, through the rest of the band) carries a
        # correction bit that may add 1<<Al toward its sign.
        k = ss
        if state["eobrun"] == 0:
            while k <= se:
                rs = atab.decode(reader)
                r, sz = rs >> 4, rs & 0x0F
                val = 0
                if sz == 0:
                    if r < 15:
                        # NO "-1" here (unlike the first-pass scan): the
                        # tail loop below consumes the CURRENT block's
                        # remaining correction bits and decrements once
                        state["eobrun"] = 1 << r
                        if r:
                            state["eobrun"] += reader.bits(r)
                        break
                    # r == 15: skip 16 zero-history positions
                else:
                    if sz != 1:
                        raise ValueError("invalid refinement magnitude")
                    val = p1 if reader.bits(1) else m1
                while k <= se:
                    if zz[k] != 0:
                        if reader.bits(1) and (zz[k] & p1) == 0:
                            zz[k] += p1 if zz[k] >= 0 else m1
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if val != 0:
                    if k > se:
                        raise ValueError("refinement ran past the band")
                    zz[k] = val
                k += 1
        if state["eobrun"] > 0:
            while k <= se:
                if zz[k] != 0:
                    if reader.bits(1) and (zz[k] & p1) == 0:
                        zz[k] += p1 if zz[k] >= 0 else m1
                k += 1
            state["eobrun"] -= 1

    def decode_block(ci, dtab, atab, idx):
        zz = coefs[ci][idx]
        if not progressive:
            decode_sequential(zz, dtab, atab, ci)
        elif ss == 0:
            if ah == 0:
                decode_dc_first(zz, dtab, ci)
            else:
                decode_dc_refine(zz)
        elif ah == 0:
            decode_ac_first(zz, atab)
        else:
            decode_ac_refine(zz, atab)

    def restart_check(unit_index):
        if restart_interval and unit_index and unit_index % restart_interval == 0:
            m = reader.align_to_marker()
            if not (0xD0 <= m <= 0xD7):
                raise ValueError("expected RSTn marker")
            pred[:] = [0] * len(comps)
            state["eobrun"] = 0

    if len(sel) > 1 or (not progressive and len(comps) > 1 and len(sel) == len(comps)):
        # interleaved: MCU order over the padded grid
        unit = 0
        for my in range(mcuy):
            for mx in range(mcux):
                restart_check(unit)
                for ci, dtab, atab in sel:
                    g = geo[ci]
                    for by in range(g["vs"]):
                        for bx in range(g["hs"]):
                            idx = (my * g["vs"] + by) * g["bw"] + (mx * g["hs"] + bx)
                            decode_block(ci, dtab, atab, idx)
                unit += 1
    else:
        # single-component: raster over the TRUE grid
        ci, dtab, atab = sel[0]
        g = geo[ci]
        unit = 0
        for by in range(g["tbh"]):
            for bx in range(g["tbw"]):
                restart_check(unit)
                decode_block(ci, dtab, atab, by * g["bw"] + bx)
                unit += 1

    # drop the partial byte and resync to the next true marker (the
    # reader may stop mid-byte before the scan's 1-fill padding, and
    # stuffed FF00 pairs / FF fill bytes are not markers)
    pnext = reader.pos
    while pnext + 1 < len(payload):
        if payload[pnext] == 0xFF and payload[pnext + 1] not in (0x00, 0xFF):
            break
        pnext += 1
    return pnext


#: fixed-length Huffman tables for the PROGRESSIVE encoder: Annex K's
#: AC tables lack the EOBn (r<<4|0, r>0) symbols progressive EOB runs
#: need, so the fixture encoder uses flat spec-valid tables — every DC
#: category at 4 bits (12 ≤ 2⁴−1) and every AC symbol at 8 bits
#: (176 ≤ 2⁸−1). Worse compression, trivially canonical; the decoder
#: reads whatever DHT the stream declares either way.
_PROG_DC_TABLE = (
    (0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0),
    tuple(range(12)),
)
_PROG_AC_SYMBOLS = tuple(
    sorted([(r << 4) | sz for r in range(16) for sz in range(1, 11)]
           + [r << 4 for r in range(15)] + [0xF0])
)
_PROG_AC_TABLE = (
    (0, 0, 0, 0, 0, 0, 0, len(_PROG_AC_SYMBOLS), 0, 0, 0, 0, 0, 0, 0, 0),
    _PROG_AC_SYMBOLS,
)


def _prep_quantized_zz(width, height, pixels, quality, subsampling):
    """Shared encoder front end: RGB → YCbCr → (sub)sampled planes →
    padded block grid → FDCT → quantize; returns per-component
    ZIGZAG-order (n_blocks, 64) int64 arrays plus the grid geometry."""
    if subsampling not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    rgb = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width, 3)
    ycc = rgb_to_ycbcr(rgb)
    h_max = v_max = 2 if subsampling == "420" else 1
    samp = [(h_max, v_max), (1, 1), (1, 1)]
    qluma = quant_table(BASE_QUANT_LUMA, quality)
    qchroma = quant_table(BASE_QUANT_CHROMA, quality)
    qtabs = [qluma, qchroma, qchroma]
    mcux = -(-width // (8 * h_max))
    mcuy = -(-height // (8 * v_max))
    zz_r, zz_c = ZIGZAG // 8, ZIGZAG % 8
    comp_zz, grids = [], []
    for ci in range(3):
        hs, vs = samp[ci]
        plane = _component_plane(ycc, ci, hs, vs, h_max, v_max)
        bw, bh = mcux * hs, mcuy * vs
        blocks = _blockize(plane, bw, bh) - 128
        q = qtabs[ci].reshape(8, 8).astype(np.float64)
        quant = _round_half_up(fdct_2d(blocks) / q).astype(np.int64)
        comp_zz.append(quant[:, zz_r, zz_c])
        comp_w = -(-(width * hs) // h_max)
        comp_h = -(-(height * vs) // v_max)
        grids.append({"hs": hs, "vs": vs, "bw": bw, "bh": bh,
                      "tbw": -(-comp_w // 8), "tbh": -(-comp_h // 8)})
    return comp_zz, grids, samp, qluma, qchroma, mcux, mcuy


def _seg(marker: int, body: bytes) -> bytes:
    return bytes((0xFF, marker)) + _struct.pack(">H", 2 + len(body)) + body


def encode_jpeg_progressive(
    width: int,
    height: int,
    pixels: bytes,
    quality: int = 75,
    subsampling: str = "444",
) -> bytes:
    """REAL progressive JFIF encoder (SOF2) — the fixture twin of the
    progressive half of :func:`decode_jpeg`. Scan script exercises
    every progressive scan type:

    1. DC first, interleaved, successive approximation Al=1;
    2. DC refinement (Ah=1 → Al=0, raw bits);
    3. per component: AC first pass, full band 1–63 at Al=1, with
       EOB-run coding across blocks;
    4. per component: AC refinement (Ah=1 → Al=0) with correction
       bits, newly-significant ±1 coding, ZRL runs and EOB runs
       carrying buffered correction bits.

    Uses flat fixed-length Huffman tables (see ``_PROG_AC_TABLE``)
    because Annex K's tables carry no EOBn symbols. Output decodes
    bit-exactly to the same pixels as the BASELINE encoding of the same
    image at the same quality/subsampling (both reconstruct the same
    quantized coefficients) — the round-trip equivalence the tests
    pin."""
    comp_zz, grids, samp, qluma, qchroma, mcux, mcuy = _prep_quantized_zz(
        width, height, pixels, quality, subsampling
    )
    dc_codes = _canonical_codes(*_PROG_DC_TABLE)
    ac_codes = _canonical_codes(*_PROG_AC_TABLE)

    def mcu_blocks(sel):
        """(ci, idx) pairs in interleaved MCU order over the padded grid."""
        for my in range(mcuy):
            for mx in range(mcux):
                for ci in sel:
                    g = grids[ci]
                    for by in range(g["vs"]):
                        for bx in range(g["hs"]):
                            yield ci, (my * g["vs"] + by) * g["bw"] + (
                                mx * g["hs"] + bx)

    def raster_blocks(ci):
        g = grids[ci]
        for by in range(g["tbh"]):
            for bx in range(g["tbw"]):
                yield by * g["bw"] + bx

    scans = []

    # --- scan 1: DC first (interleaved, Al=1) ---
    w = _BitWriter()
    pred = [0, 0, 0]
    for ci, idx in mcu_blocks((0, 1, 2)):
        t = int(comp_zz[ci][idx, 0]) >> 1  # DC point transform: arithmetic shift
        diff = t - pred[ci]
        pred[ci] = t
        ssss, bits_val = _magnitude(diff)
        code, ln = dc_codes[ssss]
        w.write(code, ln)
        if ssss:
            w.write(bits_val, ssss)
    w.pad_to_byte()
    scans.append(((0, 1, 2), 0, 0, 0, 1, bytes(w.buf)))

    # --- scan 2: DC refinement (Ah=1, Al=0; one raw bit per block) ---
    w = _BitWriter()
    for ci, idx in mcu_blocks((0, 1, 2)):
        w.write(int(comp_zz[ci][idx, 0]) & 1, 1)
    w.pad_to_byte()
    scans.append(((0, 1, 2), 0, 0, 1, 0, bytes(w.buf)))

    # --- scans 3..5: AC first pass per component (band 1-63, Al=1) ---
    def trunc_div2(v: int) -> int:  # AC point transform truncates toward 0
        return v >> 1 if v >= 0 else -((-v) >> 1)

    def flush_eobrun(w, st):
        if st["eobrun"] > 0:
            eb = st["eobrun"]
            nbits = eb.bit_length() - 1
            code, ln = ac_codes[nbits << 4]
            w.write(code, ln)
            if nbits:
                w.write(eb - (1 << nbits), nbits)
            st["eobrun"] = 0
        for b in st["pending"]:
            w.write(b, 1)
        st["pending"] = []

    for ci in range(3):
        w = _BitWriter()
        st = {"eobrun": 0, "pending": []}
        for idx in raster_blocks(ci):
            zz = comp_zz[ci][idx]
            r = 0
            wrote_any = False
            for k in range(1, 64):
                t = trunc_div2(int(zz[k]))
                if t == 0:
                    r += 1
                    continue
                flush_eobrun(w, st)
                while r > 15:
                    code, ln = ac_codes[0xF0]
                    w.write(code, ln)
                    r -= 16
                ssss, bits_val = _magnitude(t)
                code, ln = ac_codes[(r << 4) | ssss]
                w.write(code, ln)
                w.write(bits_val, ssss)
                r = 0
                wrote_any = True
            if r > 0 or not wrote_any:
                st["eobrun"] += 1
                if st["eobrun"] == 0x7FFF:
                    flush_eobrun(w, st)
        flush_eobrun(w, st)
        w.pad_to_byte()
        scans.append(((ci,), 1, 63, 0, 1, bytes(w.buf)))

    # --- scans 6..8: AC refinement per component (Ah=1 -> Al=0) ---
    for ci in range(3):
        w = _BitWriter()
        st = {"eobrun": 0, "pending": []}
        for idx in raster_blocks(ci):
            zz = comp_zz[ci][idx]
            # eob = index of the LAST newly-significant (|coef| == 1)
            # position; zero-runs past it fold into the EOB-run, so the
            # ZRL loop below is gated on k <= eob (the jcphuff.c rule)
            eob = 0
            for k in range(1, 64):
                if abs(int(zz[k])) == 1:
                    eob = k
            r = 0
            br: list[int] = []
            for k in range(1, 64):
                t = abs(int(zz[k]))  # history = |coef| >> Al(=0 target);
                if t == 0:
                    r += 1
                    continue
                # Run the ZRL loop at EVERY nonzero position (ADVICE r11
                # high; mirrors jcphuff.c encode_mcu_AC_refine), not only
                # at newly-significant ones. Each ZRL covers the first 16
                # zero-history slots of the run, and every bit currently
                # in br was buffered while r <= 15 (this loop drains r
                # before the known-nonzero branch appends), so the bits
                # flushed after each ZRL are exactly the correction bits
                # the decoder consumes while skipping that window.
                while r > 15 and k <= eob:
                    flush_eobrun(w, st)
                    code, ln = ac_codes[0xF0]
                    w.write(code, ln)
                    r -= 16
                    for b in br:
                        w.write(b, 1)
                    br = []
                if t > 1:
                    # known-nonzero: correction bit only (r > 15 here is
                    # possible only when k > eob — those bits ride the
                    # EOB-run's pending buffer instead)
                    br.append(t & 1)
                    continue
                # newly significant (|coef| == 1 at this precision);
                # k <= eob by construction, so r <= 15 after the loop
                flush_eobrun(w, st)
                code, ln = ac_codes[(r << 4) | 1]
                w.write(code, ln)
                w.write(1 if int(zz[k]) > 0 else 0, 1)
                for b in br:
                    w.write(b, 1)
                br = []
                r = 0
            if r > 0 or br:
                st["eobrun"] += 1
                st["pending"].extend(br)
                if st["eobrun"] == 0x7FFF:
                    flush_eobrun(w, st)
        flush_eobrun(w, st)
        w.pad_to_byte()
        scans.append(((ci,), 1, 63, 1, 0, bytes(w.buf)))

    # --- segment assembly ---
    app0 = _seg(0xE0, b"JFIF\x00\x01\x01\x00" + _struct.pack(">HH", 1, 1) + b"\x00\x00")
    dqt = _seg(0xDB, bytes([0]) + bytes(qluma[ZIGZAG].astype(np.uint8)))
    dqt += _seg(0xDB, bytes([1]) + bytes(qchroma[ZIGZAG].astype(np.uint8)))
    sof_body = b"\x08" + _struct.pack(">HH", height, width) + b"\x03"
    for ci, (hs, vs) in enumerate(samp):
        sof_body += bytes((ci + 1, (hs << 4) | vs, 0 if ci == 0 else 1))
    sof2 = _seg(0xC2, sof_body)
    dht = _seg(0xC4, bytes([0x00]) + bytes(_PROG_DC_TABLE[0]) + bytes(_PROG_DC_TABLE[1]))
    dht += _seg(0xC4, bytes([0x10]) + bytes(_PROG_AC_TABLE[0]) + bytes(_PROG_AC_TABLE[1]))
    out = bytearray(b"\xff\xd8" + app0 + dqt + sof2 + dht)
    for comps_in_scan, ss, se, ah, al, data in scans:
        body = bytes([len(comps_in_scan)])
        for ci in comps_in_scan:
            body += bytes((ci + 1, 0x00))  # Td=0, Ta=0 (flat tables)
        body += bytes((ss, se, (ah << 4) | al))
        out += _seg(0xDA, body) + data
    out += b"\xff\xd9"
    return bytes(out)


def idct_2d_reference(coefs: np.ndarray) -> np.ndarray:
    """Spec-literal O(N⁴) inverse DCT (T.81 A.3.3, quadruple loop) —
    the independent differential twin of :func:`idct_2d`. Test-only by
    design: slow, but shares NO code path with the production kernel."""
    coefs = np.asarray(coefs, dtype=np.float64)
    single = coefs.ndim == 2
    stack = coefs[None] if single else coefs
    out = np.zeros_like(stack)
    import math

    for n, blk in enumerate(stack):
        for x in range(8):
            for y in range(8):
                acc = 0.0
                for u in range(8):
                    cu = (1.0 / math.sqrt(2.0)) if u == 0 else 1.0
                    for v in range(8):
                        cv = (1.0 / math.sqrt(2.0)) if v == 0 else 1.0
                        acc += (
                            cu * cv * blk[u, v]
                            * math.cos((2 * x + 1) * u * math.pi / 16)
                            * math.cos((2 * y + 1) * v * math.pi / 16)
                        )
                out[n, x, y] = acc / 4.0
    return out[0] if single else out
