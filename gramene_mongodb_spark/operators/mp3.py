"""MPEG Audio Layer III (MP3, ISO/IEC 11172-3) — pure Python + numpy.

After the round-11 JPEG codec, the one compressed-media capability stub
left was audio sample decode (`multimodal.decode_wav_samples` covers PCM
WAV only; real web audio corpora are overwhelmingly MP3). No audio
library ships in this sandbox, so this module implements the Layer III
decode pipeline from the public spec — frame sync / header walk (MPEG-1
and the MPEG-2/2.5 lower-sampling-frequency extension), CRC accounting,
side information, the bit reservoir (``main_data_begin``), scalefactor
decode (MPEG-1 scfsi sharing and the LSF slen-quad derivation), Huffman
spectral decode with exact ``part2_3_length`` bit accounting, 4/3-power
requantization (preflag/pretab, scalefac_scale, subblock_gain),
short-block reorder, MS stereo, the aliasing-reduction butterflies, the
hybrid IMDCT (all four block types with overlap-add), frequency
inversion, and the 32-band polyphase synthesis filterbank — plus a
spec-valid constrained ENCODER (the role ``encode_jpeg_baseline`` plays
for images) so real compressed fixtures are built worker-side and the
whole pipeline round-trips end-to-end under the driver oracle.

HONEST CAPABILITY BOUNDARY (read before extending):

* **Huffman code tables.** ISO 11172-3 Table B.7 defines 34 code
  tables. The exact (length, codeword) literals for the small tables —
  0..3, 5, 6 and both count1 quad tables — are bundled below and
  machine-validated at import (Kraft sum == 1 and prefix-freeness; a
  table that fails validation would refuse to load rather than decode
  garbage). The 16×16 big-value tables (7..13, 15, and the 16/24
  linbits families) could NOT be sourced in this sandbox — no spec
  copy, no decoder library, nothing on disk carries them — and they
  must not be approximated: a structurally-valid-but-wrong code table
  decodes to silently corrupt audio, which is worse than refusing.
  Decoding a granule that selects an unbundled table raises
  ``ValueError`` naming the table id. The bundled set covers every
  stream our encoder produces (it quantizes so all big-value samples
  are ≤ 3) and any third-party stream whose encoder chose small
  tables.
* **LSF (MPEG-2/2.5) streams** get the full structural walk — header,
  side info, scalefactor *bit accounting*, reservoir bookkeeping —
  used by the real-file interop gate (the only real MP3 on this disk
  is MPEG-2 LSF); LSF *sample* decode raises ``ValueError`` because no
  LSF stream our bundled tables can decode exists to test it against.
* **Intensity stereo** raises ``ValueError`` (MS stereo is decoded;
  intensity needs position→ratio tables whose behaviour we could not
  gate against any real decoder here).
* **Polyphase prototype window.** ISO Table 3-B.3 tabulates 512
  window coefficients that are not derivable in closed form and could
  not be sourced in-sandbox. The filterbank here uses the spec's exact
  STRUCTURE (512-tap window, 32-phase polyphase, cos((16+i)(2k+1)π/64)
  matrixing, the V-FIFO/U/W synthesis flow, 481-sample delay) with a
  window pair DERIVED by alternating least squares against that exact
  structure for near-perfect reconstruction (measured ≳48 dB analysis→
  synthesis round-trip SNR — far below the quantization noise of any
  real Layer III stream, but NOT bit-identical to ISO decoders).
  Consequence: PCM from this decoder is within a small tolerance of,
  not bit-equal to, a conformance decoder — which is why the driver
  gate pins tolerance FLAGS plus exact integer stream geometry
  (frame/byte/sample counts), the `a_approx_aggregates` pattern, same
  as the JPEG AC gate.

Reference analog: the reference repo handles packed binary payloads
(`search/genetree_adder.js:25-46`) but has no audio pipeline — this is
extension surface for multimodal training-data curation, per the same
north-star note that motivated jpeg.py.
"""

from __future__ import annotations

import base64 as _base64
import zlib as _zlib

import numpy as np

# ---------------------------------------------------------------------------
# header tables (ISO 11172-3 §2.4.2.3 / ISO 13818-3)
# ---------------------------------------------------------------------------

#: version field (header bits 19..20) → sampling-rate triple [idx 0..2]
_RATES = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000), 0: (11025, 12000, 8000)}
#: Layer III bitrate (kbps) by version; index 0 (free format) and 15 invalid
_BITRATES_L3 = {
    3: (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    2: (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}
_BITRATES_L3[0] = _BITRATES_L3[2]

#: MPEG-1 scalefactor slen pairs, indexed by scalefac_compress (§2.4.2.7)
_SLEN1 = (0, 0, 0, 0, 3, 1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4)
_SLEN2 = (0, 1, 2, 3, 0, 1, 2, 3, 1, 2, 3, 1, 2, 3, 2, 3)

#: preemphasis table, one entry per long scalefactor band (§2.4.3.4)
_PRETAB = (0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 3, 3, 2, 0)

#: MPEG-1 long-block scalefactor band boundaries (sample index), per rate
_SFB_LONG = {
    44100: (0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 52, 62, 74, 90, 110, 134,
            162, 196, 238, 288, 342, 418, 576),
    48000: (0, 4, 8, 12, 16, 20, 24, 30, 36, 42, 50, 60, 72, 88, 106, 128,
            156, 190, 230, 276, 330, 384, 576),
    32000: (0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 54, 66, 82, 102, 126, 156,
            194, 240, 296, 364, 448, 576),
}
#: MPEG-1 short-block boundaries (per window), per rate
_SFB_SHORT = {
    44100: (0, 4, 8, 12, 16, 22, 30, 40, 52, 66, 84, 106, 136, 192),
    48000: (0, 4, 8, 12, 16, 22, 28, 38, 50, 64, 80, 100, 126, 192),
    32000: (0, 4, 8, 12, 16, 22, 30, 42, 58, 78, 104, 138, 180, 192),
}

# ---------------------------------------------------------------------------
# Huffman code tables (ISO 11172-3 Table B.7) — bundled, validated subset
# ---------------------------------------------------------------------------
# Each pair table: xlen, then row-major (x, y) → (hlen, hcod). Tables 4 and
# 14 are "not used" in the spec; 7..13/15/16../24.. are valid-but-unbundled
# (see the module docstring). linbits == 0 for every bundled table.

_PAIR_CODES: dict[int, tuple[int, tuple[tuple[int, int], ...]]] = {
    # table 1: 2×2
    1: (2, ((1, 1), (3, 1), (2, 1), (3, 0))),
    # table 2: 3×3
    2: (3, ((1, 1), (3, 2), (6, 1),
            (3, 3), (3, 1), (5, 1),
            (5, 3), (5, 2), (6, 0))),
    # table 3: 3×3
    3: (3, ((2, 3), (2, 2), (6, 1),
            (3, 1), (2, 1), (5, 1),
            (5, 3), (5, 2), (6, 0))),
    # table 5: 4×4
    5: (4, ((1, 1), (3, 2), (6, 6), (7, 5),
            (3, 3), (3, 1), (6, 4), (7, 4),
            (6, 7), (6, 5), (7, 7), (8, 1),
            (7, 6), (6, 1), (7, 1), (8, 0))),
    # table 6: 4×4
    6: (4, ((3, 7), (3, 3), (5, 5), (7, 1),
            (3, 6), (2, 2), (4, 3), (5, 2),
            (4, 5), (4, 4), (5, 4), (6, 1),
            (6, 3), (5, 3), (6, 2), (7, 0))),
}

#: count1 quad tables (§2.4.2.7 count1table_select): entry index is the
#: 4-bit pattern v·8 + w·4 + x·2 + y. Table B ("1") is the fixed 4-bit
#: code hcod = 15 - pattern.
_QUAD_CODES: dict[int, tuple[tuple[int, int], ...]] = {
    0: ((1, 1), (4, 5), (4, 4), (5, 5), (4, 6), (6, 5), (5, 4), (6, 4),
        (4, 7), (5, 3), (5, 6), (6, 0), (5, 7), (6, 2), (6, 3), (6, 1)),
    1: tuple((4, 15 - i) for i in range(16)),
}

#: tables the spec marks "not used" — selecting them is a stream error
_INVALID_TABLES = frozenset({4, 14})


def _validate_code(entries: tuple[tuple[int, int], ...], label: str) -> dict:
    """Build a (hlen, hcod) → symbol-index decode map, asserting the code
    is COMPLETE (Kraft sum == 1) and prefix-free. Runs at import for every
    bundled table — a misremembered literal refuses to load rather than
    decode garbage."""
    kraft = 0.0
    decode: dict[tuple[int, int], int] = {}
    for sym, (hlen, hcod) in enumerate(entries):
        if not (1 <= hlen <= 19) or hcod >> hlen:
            raise AssertionError(f"{label}: bad entry {sym}: ({hlen}, {hcod})")
        if (hlen, hcod) in decode:
            raise AssertionError(f"{label}: duplicate code ({hlen}, {hcod})")
        decode[(hlen, hcod)] = sym
        kraft += 2.0 ** -hlen
    if kraft != 1.0:
        raise AssertionError(f"{label}: Kraft sum {kraft} != 1 (incomplete code)")
    # prefix-freeness: completeness + uniqueness already implies it for a
    # binary code with Kraft == 1, but check explicitly (cheap, import-time)
    codes = sorted((h, c) for (h, c) in decode)
    for i, (h1, c1) in enumerate(codes):
        for h2, c2 in codes[i + 1:]:
            if h2 > h1 and (c2 >> (h2 - h1)) == c1:
                raise AssertionError(f"{label}: ({h1},{c1}) prefixes ({h2},{c2})")
    return decode


_PAIR_DECODE = {
    tid: (xlen, _validate_code(entries, f"pair table {tid}"))
    for tid, (xlen, entries) in _PAIR_CODES.items()
}
_QUAD_DECODE = {
    tid: _validate_code(entries, f"count1 table {tid}")
    for tid, entries in _QUAD_CODES.items()
}
#: longest bundled codeword — decode loop bound
_MAX_HLEN = 8


# ---------------------------------------------------------------------------
# bit I/O (MSB-first; no byte stuffing in MPEG audio, unlike JPEG)
# ---------------------------------------------------------------------------

class _BitReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, bitpos: int = 0) -> None:
        self.data = data
        self.pos = bitpos

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        end = self.pos + n
        if end > len(self.data) * 8:
            raise ValueError("bitstream truncated")
        v = 0
        pos = self.pos
        data = self.data
        while n:
            byte = data[pos >> 3]
            avail = 8 - (pos & 7)
            take = avail if avail < n else n
            v = (v << take) | ((byte >> (avail - take)) & ((1 << take) - 1))
            pos += take
            n -= take
        self.pos = pos
        return v

    def bit(self) -> int:
        return self.bits(1)


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def bit_length(self) -> int:
        return len(self.buf) * 8 + self.nbits

    def getvalue(self) -> bytes:
        if self.nbits:
            return bytes(self.buf) + bytes([(self.acc << (8 - self.nbits)) & 0xFF])
        return bytes(self.buf)


# ---------------------------------------------------------------------------
# frame header / stream walk
# ---------------------------------------------------------------------------

def skip_id3v2(data: bytes) -> int:
    """Byte offset of the first audio byte: 0, or past an ID3v2 tag
    (syncsafe 28-bit size, §ID3v2.4; footer flag adds 10)."""
    if data[:3] != b"ID3" or len(data) < 10:
        return 0
    if (data[6] | data[7] | data[8] | data[9]) & 0x80:
        raise ValueError("ID3v2 size bytes not syncsafe")
    size = (data[6] << 21) | (data[7] << 14) | (data[8] << 7) | data[9]
    footer = 10 if data[5] & 0x10 else 0
    return 10 + size + footer


def parse_frame_header(data: bytes, off: int) -> dict:
    """Decode one 4-byte Layer III frame header at ``off``. Raises
    ``ValueError`` for anything that is not a valid Layer III header."""
    if off + 4 > len(data):
        raise ValueError("frame header truncated")
    h = int.from_bytes(data[off:off + 4], "big")
    if (h >> 21) & 0x7FF != 0x7FF:
        raise ValueError(f"lost frame sync at byte {off}")
    version = (h >> 19) & 3
    if version == 1:
        raise ValueError("reserved MPEG version id")
    layer = (h >> 17) & 3
    if layer != 1:
        raise ValueError(f"not Layer III (layer bits {layer})")
    crc_absent = (h >> 16) & 1
    br_idx = (h >> 12) & 15
    if br_idx == 0:
        raise ValueError("free-format bitrate not supported")
    if br_idx == 15:
        raise ValueError("invalid bitrate index 15")
    sr_idx = (h >> 10) & 3
    if sr_idx == 3:
        raise ValueError("invalid sampling-rate index 3")
    padding = (h >> 9) & 1
    mode = (h >> 6) & 3
    mode_ext = (h >> 4) & 3
    rate = _RATES[version][sr_idx]
    bitrate = _BITRATES_L3[version][br_idx] * 1000
    mpeg1 = version == 3
    per_frame = 144 if mpeg1 else 72
    frame_len = per_frame * bitrate // rate + padding
    return {
        "version": version,
        "mpeg1": mpeg1,
        "crc": crc_absent == 0,
        "bitrate": bitrate,
        "sample_rate": rate,
        "padding": padding,
        "mode": mode,
        "mode_ext": mode_ext,
        "channels": 1 if mode == 3 else 2,
        "frame_len": frame_len,
        "samples": 1152 if mpeg1 else 576,
        "offset": off,
    }


def walk_frames(data: bytes) -> list[dict]:
    """Walk every frame in the stream (after an optional ID3v2 tag),
    enforcing per-frame header validity and exact frame-length
    arithmetic. A trailing ID3v1 'TAG' block (128 bytes) is allowed.
    Raises ``ValueError`` on any structural fault."""
    off = skip_id3v2(data)
    frames = []
    n = len(data)
    while off < n:
        if data[off:off + 3] == b"TAG" and n - off == 128:
            break
        if n - off < 4:
            raise ValueError(f"trailing garbage at byte {off}")
        hdr = parse_frame_header(data, off)
        if off + hdr["frame_len"] > n:
            raise ValueError("last frame truncated")
        frames.append(hdr)
        off += hdr["frame_len"]
    if not frames:
        raise ValueError("no MPEG audio frames found")
    return frames


# ---------------------------------------------------------------------------
# side information (§2.4.1.7 / LSF §2.4.1.7 of 13818-3)
# ---------------------------------------------------------------------------

def side_info_size(mpeg1: bool, channels: int) -> int:
    if mpeg1:
        return 17 if channels == 1 else 32
    return 9 if channels == 1 else 17


def crc16_mpeg(data: bytes) -> int:
    """ISO 11172-3 §2.4.3.1 CRC-16: G(x) = x¹⁶+x¹⁵+x²+1, init 0xFFFF,
    MSB-first. For Layer III the protected span is header bytes 2-3
    plus the whole side-information block."""
    crc = 0xFFFF
    for byte in data:
        for k in range(7, -1, -1):
            bit = (byte >> k) & 1
            carry = ((crc >> 15) & 1) ^ bit
            crc = (crc << 1) & 0xFFFF
            if carry:
                crc ^= 0x8005
    return crc


def verify_crc(hdr: dict, data: bytes) -> None:
    """Check a protected frame's CRC-16 (no-op for unprotected frames);
    ``ValueError`` on mismatch — a corrupted side-info block would
    otherwise desync the whole bit reservoir, which is exactly what the
    spec put the CRC in front of."""
    if not hdr["crc"]:
        return
    off = hdr["offset"]
    stored = int.from_bytes(data[off + 4:off + 6], "big")
    span = data[off + 2:off + 4] + data[
        off + 6:off + 6 + side_info_size(hdr["mpeg1"], hdr["channels"])
    ]
    if crc16_mpeg(span) != stored:
        raise ValueError(f"CRC-16 mismatch in frame at byte {off}")


def parse_side_info(hdr: dict, data: bytes) -> dict:
    """Parse the side information block following the header (and CRC,
    when present) of one frame. Returns granule/channel field arrays plus
    ``main_data_begin``."""
    off = hdr["offset"] + 4 + (2 if hdr["crc"] else 0)
    size = side_info_size(hdr["mpeg1"], hdr["channels"])
    if off + size > len(data):
        raise ValueError("side info truncated")
    r = _BitReader(data[off:off + size])
    nch = hdr["channels"]
    if hdr["mpeg1"]:
        main_data_begin = r.bits(9)
        r.bits(5 if nch == 1 else 3)  # private bits
        scfsi = [[r.bit() for _ in range(4)] for _ in range(nch)]
        ngran = 2
    else:
        main_data_begin = r.bits(8)
        r.bits(1 if nch == 1 else 2)
        scfsi = [[0, 0, 0, 0] for _ in range(nch)]
        ngran = 1
    granules = []
    for _ in range(ngran):
        chs = []
        for _ in range(nch):
            g: dict = {}
            g["part2_3_length"] = r.bits(12)
            g["big_values"] = r.bits(9)
            if g["big_values"] > 288:
                raise ValueError(f"big_values {g['big_values']} > 288")
            g["global_gain"] = r.bits(8)
            g["scalefac_compress"] = r.bits(4 if hdr["mpeg1"] else 9)
            g["window_switching"] = r.bit()
            if g["window_switching"]:
                g["block_type"] = r.bits(2)
                if g["block_type"] == 0:
                    raise ValueError("window switching with block_type 0")
                g["mixed_block"] = r.bit()
                g["table_select"] = [r.bits(5) for _ in range(2)]
                g["subblock_gain"] = [r.bits(3) for _ in range(3)]
                g["region0_count"] = 7 if g["block_type"] != 2 or g["mixed_block"] else 8
                g["region1_count"] = 36  # "all the rest" per spec
            else:
                g["block_type"] = 0
                g["mixed_block"] = 0
                g["table_select"] = [r.bits(5) for _ in range(3)]
                g["region0_count"] = r.bits(4)
                g["region1_count"] = r.bits(3)
                g["subblock_gain"] = [0, 0, 0]
            g["preflag"] = r.bit() if hdr["mpeg1"] else 0
            g["scalefac_scale"] = r.bit()
            g["count1table_select"] = r.bit()
            chs.append(g)
        granules.append(chs)
    return {"main_data_begin": main_data_begin, "scfsi": scfsi,
            "granules": granules, "side_bytes": size}


def lsf_scalefac_bits(g: dict, intensity_channel: bool = False) -> int:
    """Exact scalefactor ("part2") bit count for one LSF granule, via the
    ISO 13818-3 §2.4.3.2 slen-quad derivation — used by the real-file
    structural interop gate (the one real MP3 on this disk is MPEG-2)."""
    sfc = g["scalefac_compress"]
    if intensity_channel:
        sfc >>= 1
    short = g["block_type"] == 2 and not g["mixed_block"]
    mixed = g["block_type"] == 2 and g["mixed_block"]
    if sfc < 400:
        slen = ((sfc >> 4) // 5, (sfc >> 4) % 5, (sfc & 15) >> 2, sfc & 3)
        nr = (9, 9, 9, 9) if short else (6, 9, 9, 9) if mixed else (6, 5, 5, 5)
    elif sfc < 500:
        t = sfc - 400
        slen = ((t >> 2) // 5, (t >> 2) % 5, t & 3, 0)
        nr = (9, 9, 12, 6) if short else (6, 9, 12, 6) if mixed else (6, 5, 7, 3)
    else:
        t = sfc - 500
        slen = (t // 3, t % 3, 0, 0)
        nr = (18, 18, 0, 0) if short else (15, 18, 0, 0) if mixed else (11, 10, 0, 0)
    return sum(s * n for s, n in zip(slen, nr))


# ---------------------------------------------------------------------------
# scalefactors (MPEG-1, §2.4.2.7)
# ---------------------------------------------------------------------------

def _read_scalefactors_mpeg1(
    r: _BitReader, g: dict, scfsi: list[int], prev: dict | None
) -> dict:
    slen1, slen2 = _SLEN1[g["scalefac_compress"]], _SLEN2[g["scalefac_compress"]]
    out = {"long": [0] * 22, "short": [[0] * 13 for _ in range(3)]}
    if g["block_type"] == 2:
        if g["mixed_block"]:
            for sfb in range(8):
                out["long"][sfb] = r.bits(slen1)
            for sfb in range(3, 6):
                for win in range(3):
                    out["short"][win][sfb] = r.bits(slen1)
            for sfb in range(6, 12):
                for win in range(3):
                    out["short"][win][sfb] = r.bits(slen2)
        else:
            for sfb in range(6):
                for win in range(3):
                    out["short"][win][sfb] = r.bits(slen1)
            for sfb in range(6, 12):
                for win in range(3):
                    out["short"][win][sfb] = r.bits(slen2)
    else:
        bands = ((0, 6, slen1), (6, 11, slen1), (11, 16, slen2), (16, 21, slen2))
        for part, (lo, hi, slen) in enumerate(bands):
            if scfsi[part] and prev is not None:
                for sfb in range(lo, hi):
                    out["long"][sfb] = prev["long"][sfb]
            else:
                for sfb in range(lo, hi):
                    out["long"][sfb] = r.bits(slen)
    return out


def _scalefac_bits_mpeg1(g: dict, scfsi: list[int], granule_index: int) -> int:
    slen1, slen2 = _SLEN1[g["scalefac_compress"]], _SLEN2[g["scalefac_compress"]]
    if g["block_type"] == 2:
        if g["mixed_block"]:
            return 8 * slen1 + 9 * slen1 + 18 * slen2
        return 18 * slen1 + 18 * slen2
    bits = 0
    for part, (count, slen) in enumerate(((6, slen1), (5, slen1), (5, slen2), (5, slen2))):
        if granule_index == 0 or not scfsi[part]:
            bits += count * slen
    return bits


# ---------------------------------------------------------------------------
# Huffman spectral decode (§2.4.2.7 / §2.4.3.4.19)
# ---------------------------------------------------------------------------

def _decode_symbol(r: _BitReader, table: dict, limit: int) -> int:
    hlen, hcod = 0, 0
    while hlen < _MAX_HLEN + 1:
        if r.pos >= limit:
            raise ValueError("Huffman data overruns part2_3_length")
        hcod = (hcod << 1) | r.bit()
        hlen += 1
        sym = table.get((hlen, hcod))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman codeword")


def _require_table(tid: int) -> tuple[int, dict]:
    if tid == 0:
        return (0, {})
    if tid in _INVALID_TABLES:
        raise ValueError(f"Huffman table {tid} is marked 'not used' by the spec")
    got = _PAIR_DECODE.get(tid)
    if got is None:
        raise ValueError(
            f"Huffman code table {tid} not bundled (16x16 Table B.7 "
            "literals unavailable in this sandbox; see operators/mp3.py "
            "docstring)"
        )
    return got


def _decode_spectrum(
    r: _BitReader, g: dict, sfb_long: tuple[int, ...], part2_end: int
) -> np.ndarray:
    """Decode one granule's 576 integer spectral values, consuming
    EXACTLY up to ``part2_end`` (absolute bit position) — the spec's
    part2_3_length contract, enforced."""
    xs = np.zeros(576, dtype=np.int64)
    big = g["big_values"] * 2
    if g["window_switching"]:
        region = (min(36, big), big)
        tables = g["table_select"][:2]
    else:
        r0 = sfb_long[min(g["region0_count"] + 1, len(sfb_long) - 1)]
        r1 = sfb_long[min(g["region0_count"] + g["region1_count"] + 2,
                          len(sfb_long) - 1)]
        region = (min(r0, big), min(r1, big), big)
        tables = g["table_select"][:3]
    idx = 0
    start = 0
    for bound, tid in zip(region, tables):
        if bound <= start or tid == 0:
            # table 0 codes an all-zero region with ZERO bits
            start = max(start, bound)
            continue
        xlen, table = _require_table(tid)
        for idx in range(start, bound, 2):
            sym = _decode_symbol(r, table, part2_end)
            x, y = divmod(sym, xlen)
            # bundled tables have no linbits (all xlen <= 4 < 16)
            if x:
                if r.pos >= part2_end:
                    raise ValueError("sign bit overruns part2_3_length")
                x = -x if r.bit() else x
            if y:
                if r.pos >= part2_end:
                    raise ValueError("sign bit overruns part2_3_length")
                y = -y if r.bit() else y
            xs[idx] = x
            xs[idx + 1] = y
        start = bound
    idx = big
    # count1 region: quads until the bit budget (or spectrum) is exhausted.
    # A quad may START anywhere below 576 (big_values can leave the region
    # at any even index — e.g. big_end == 574 leaves one in-range pair in
    # the final quad); lines at/above 576 are out of range and discarded,
    # matching ISO 11172-3 §2.4.3.4.6 ("values exceeding 576 are ignored")
    # and the encoder's quad_end = min(..., 576) cap (_encode_granule_bits).
    quad = _QUAD_DECODE[g["count1table_select"]]
    while r.pos < part2_end and idx < 576:
        mark = r.pos
        try:
            sym = _decode_symbol(r, quad, part2_end)
            vals = [(sym >> 3) & 1, (sym >> 2) & 1, (sym >> 1) & 1, sym & 1]
            for j in range(4):
                if vals[j]:
                    vals[j] = -1 if r.bit() else 1
        except ValueError:
            # the spec allows the final quad to straddle the boundary:
            # discard it and stop at the budget
            r.pos = mark
            break
        if r.pos > part2_end:
            r.pos = mark
            break
        for j in range(4):
            if idx + j < 576:
                xs[idx + j] = vals[j]
        idx += 4
    g["count1_end"] = min(idx, 576)
    r.pos = part2_end  # stuffing bits, if any, are skipped per spec
    return xs


# ---------------------------------------------------------------------------
# requantize / reorder / stereo / antialias (§2.4.3.4)
# ---------------------------------------------------------------------------

def _requantize(
    xs: np.ndarray, g: dict, sf: dict,
    sfb_long: tuple[int, ...], sfb_short: tuple[int, ...],
) -> np.ndarray:
    mag = np.abs(xs).astype(np.float64) ** (4.0 / 3.0)
    expo = np.zeros(576)
    gg = g["global_gain"] - 210
    scale_mult = 1.0 if g["scalefac_scale"] else 0.5
    if g["block_type"] == 2 and not g["mixed_block"]:
        for sfb in range(len(sfb_short) - 1):
            lo, hi = sfb_short[sfb], sfb_short[sfb + 1]
            w = hi - lo
            for win in range(3):
                a = lo * 3 + win * w
                expo[a:a + w] = (0.25 * (gg - 8 * g["subblock_gain"][win])
                                 - scale_mult * sf["short"][win][sfb])
    else:
        # long blocks (mixed-block long region handled as long; the
        # bundled-table encoder never emits mixed blocks)
        if g["block_type"] == 2:
            raise ValueError("mixed blocks not supported by this decoder")
        for sfb in range(len(sfb_long) - 1):
            lo, hi = sfb_long[sfb], sfb_long[sfb + 1]
            pre = _PRETAB[sfb] if g["preflag"] else 0
            expo[lo:hi] = 0.25 * gg - scale_mult * (sf["long"][sfb] + pre)
    xr = np.sign(xs) * mag * np.exp2(expo)
    return xr


def _reorder_short(xr: np.ndarray, sfb_short: tuple[int, ...]) -> np.ndarray:
    """Short-block reorder: Huffman order is (sfb, window, line); the
    hybrid filterbank wants (subband, window, line) — 18 consecutive
    samples per subband = 3 windows × 6 lines."""
    out = np.zeros_like(xr)
    for sfb in range(len(sfb_short) - 1):
        lo, hi = sfb_short[sfb], sfb_short[sfb + 1]
        w = hi - lo
        for win in range(3):
            src = lo * 3 + win * w
            for i in range(w):
                line = lo + i
                out[(line // 6) * 18 + win * 6 + (line % 6)] = xr[src + i]
    return out


#: aliasing-reduction coefficients (§2.4.3.4.10.1): ci → (cs, ca)
_ALIAS_CI = (-0.6, -0.535, -0.33, -0.185, -0.095, -0.041, -0.0142, -0.0037)
_ALIAS_CS = tuple(1.0 / np.sqrt(1.0 + c * c) for c in _ALIAS_CI)
_ALIAS_CA = tuple(c / np.sqrt(1.0 + c * c) for c in _ALIAS_CI)


def _antialias(xr: np.ndarray) -> np.ndarray:
    out = xr.copy()
    for sb in range(1, 32):
        base = 18 * sb
        for i in range(8):
            a = out[base - 1 - i]
            b = out[base + i]
            out[base - 1 - i] = a * _ALIAS_CS[i] - b * _ALIAS_CA[i]
            out[base + i] = b * _ALIAS_CS[i] + a * _ALIAS_CA[i]
    return out


def _antialias_inverse(xr: np.ndarray) -> np.ndarray:
    out = xr.copy()
    for sb in range(1, 32):
        base = 18 * sb
        for i in range(8):
            a = out[base - 1 - i]
            b = out[base + i]
            out[base - 1 - i] = a * _ALIAS_CS[i] + b * _ALIAS_CA[i]
            out[base + i] = b * _ALIAS_CS[i] - a * _ALIAS_CA[i]
    return out


# ---------------------------------------------------------------------------
# hybrid filterbank: IMDCT (§2.4.3.4.12) + polyphase synthesis (§2.4.3.2)
# ---------------------------------------------------------------------------

_IMDCT_N, _IMDCT_H = 36, 18
_i36 = np.arange(_IMDCT_N)
_k18 = np.arange(_IMDCT_H)
_IMDCT_COS = np.cos(np.pi / 72.0 * np.outer(2 * _i36 + 1 + _IMDCT_H, 2 * _k18 + 1))
_WIN_NORMAL = np.sin(np.pi / 36.0 * (_i36 + 0.5))
_WIN_START = np.concatenate([
    np.sin(np.pi / 36.0 * (np.arange(18) + 0.5)),
    np.ones(6),
    np.sin(np.pi / 12.0 * (np.arange(24, 30) - 18 + 0.5)),
    np.zeros(6),
])
_WIN_STOP = np.concatenate([
    np.zeros(6),
    np.sin(np.pi / 12.0 * (np.arange(6, 12) - 6 + 0.5)),
    np.ones(6),
    np.sin(np.pi / 36.0 * (np.arange(18, 36) + 0.5)),
])
_i12 = np.arange(12)
_IMDCT12_COS = np.cos(np.pi / 24.0 * np.outer(2 * _i12 + 1 + 6, 2 * np.arange(6) + 1))
_WIN_SHORT = np.sin(np.pi / 12.0 * (_i12 + 0.5))


def _imdct_granule(xr: np.ndarray, block_type: int, overlap: np.ndarray) -> np.ndarray:
    """One channel-granule hybrid IMDCT: 576 lines → 576 subband time
    samples (18 per subband), with the 18-sample overlap-add state
    updated in place (overlap: shape (32, 18))."""
    out = np.zeros((32, 18))
    for sb in range(32):
        spec = xr[sb * 18:(sb + 1) * 18]
        if block_type == 2:
            z = np.zeros(36)
            for win in range(3):
                xw = _IMDCT12_COS @ spec[win * 6:(win + 1) * 6]
                z[6 + win * 6:6 + win * 6 + 12] += _WIN_SHORT * xw
        else:
            x = _IMDCT_COS @ spec
            if block_type == 0:
                z = x * _WIN_NORMAL
            elif block_type == 1:
                z = x * _WIN_START
            elif block_type == 3:
                z = x * _WIN_STOP
            else:
                raise ValueError(f"invalid block_type {block_type}")
        out[sb] = z[:18] + overlap[sb]
        overlap[sb] = z[18:]
    # frequency inversion: odd time samples of odd subbands are negated
    out[1::2, 1::2] *= -1.0
    return out


# --- polyphase windows: ALS-derived near-PR prototype pair (see module
# docstring) — embedded as zlib+base85 float32 blobs, decoded lazily.
_WINDOW_BLOB_A: str = (
    "c-jq=XFL@Q8^#+*iAs92GfIdM)gjzSHX-XM>u~IGtYcJUZw}6}x1{ipB$+o!N>(zSq(zbPkfN06"
    "?c@LY{jP8S>*}yo7;p6+?eLYSaBU|rQ04TmQ`033B+UIXm}q67XsO_ZSEUSODd(lEIWzF{>hQG}"
    "2N|flZ18TOg^u?R21zhX=vaAzP4?$RCfeQ!`V^y)i9@|zGQWc|(8`Zd<fxsFBr|E@&CXQhr+Vx="
    "-V=`$f?v(p{V<#lv-"
    "D!rr>P2tiuX3{xdL?Ni$0k~F|bf`lWn~w9_~u?#@p~DLgKWZ@LS(RNH``ZXeg2hHe0*$e%mHM<s"
    "Yq%BGq^}KeF-j(W6)}P-0Eq_B9#~N9S5IHAF&X^d-l-"
    "#c=RbI7)k96#`1~>uM%+Uq~DJW8atV0P5>JSb1hU+^60=*3xK+zE{Me*1en%H~Iw1WZjYWzwK5h"
    "2ws>R{f`X~t2gp-AAb2(!3(eHx%nz9df+@xC)7|}@t1aKbfPdBSJiEQkdhp*?5yTn=7ozGr9D)i"
    "7i5k(6Q3lwqKq-{1=;j6ivd2?<qXhgHo@8g7NK_U&W`r6rJ8pK&toOQ<g_iH4zB-"
    "78P^Hd!@ldzYyqc?k+=EGzW9v`7%Vz_#Cy;Zr`9|BteGz2;~%>wGbC(qlvE@kJ#T|Wa@CWUx7c8"
    "sl#`g4iZ$N46HZ>BnWK!n{=afbMkrr9&i^J)4R?GS5g9ENMXTUF7QZ+6L7{)nr*8)xRjl~SS*~Z"
    "INpHGx-Omhk>tY@_CX<0$|8^>gIHsfUns-"
    "3<O&Yc&c7A5tNyFU}yzxmKY3L*`@cxHdD(>wpq7*Swuu7|~=+K*F<n*n)_zaWKef*<FZcYL^Q<9"
    "ds24isWf$L`0-Eiz=^tHCujCMr-"
    "2ypdaroy~nzs#m=6dX1=!81*Yg??vEmVm%GV3N~$Z$pcN7fwy{gyV6rMWr)MBPtd~MO+&{l>GI@"
    "`Jt6{Of>L(KeC@gGzu;jF1n^UMZlTbop*NFhrunuRet`-"
    "V5k>YnYR@31M0T|dTzB7oD^(wmkgGI+PoR+j!Y#qB6=UN<T1yIb(6@YE_+mqK4W}}LPpn(Q>pfa"
    "u6SdTJtIEJ9sjGY7MZ^0fmQ$P$<Mm&fpnF*Ecz)AT>Iz7a|X9N+I$sP1r1j;v=gbT`P<k39kA-"
    "b>VWkf3kP@En<4X0qVbU)Ni_G~VS=vApilj7&#ABzgbyt)cJ-KGz`3?K=L?rmai?yZ$eKM~_M;S"
    "tP)V44vcUVNpd;#Yy^8yKz!AS_PitQykubwNSMu$42i!Q`ai{;A4NBf&GO@|ALOio9=zr1_b3FY"
    "+Uyo>E)r7k=lk!Py|KYVQP?!skuZL*g)l|m&Qr54!N#3X`Z{Z{*<$_{1$#=999dLHTX`o;DB320"
    "=?elQAz~Y{U<e_FWEDOGteQm@XS!ir;#i>M`tI}BeVrPdR4yx!%(H&7Le97N)!vz`LY@w-"
    "JJ+V`BW@YZT7jkD#hqapi<?}JJmQ*LCJlr|Yp7~kTOG06P#+V;mHQ>8!+!hR<7Pigzkwf6mme&?"
    "aBf+q1waci7Js4!{&dz<)4+7tBGP1Q9RFI$9-"
    "LiWs5WWmu|KcSO2+WePVPZM~pt=21OqI4j469CYTW|V8Dw*pnLxTcdUp<no9(q9X?BUA=0c050o"
    "EI?ZvBy8jxidpK=Rn0k{oKA$6(sgATHSCZ;yZtzk{v8$)M`4i)s5<j<%xxwkFNM)*T~Ov+<F0c#"
    "(Z@@lu_|e9+yo;P%!SJ3W^-"
    "A2*E+WEw^J{h9K8__t$cf!PsJW>@l$@04p5##CMS0aY~kh!JDX#IgVYIKYTERgUxUK8KK6wZgad"
    "eEX5TES+9z0L0>c#x>DlL6@ax1T#xv}1CXkBM4WBVAOD0@bBK8Q;b3rYFfWaQJDR>lAE@`lD0Nx"
    "hghm&9EtA$9Pb6Xbwtr@onu+)(J@Sto%?L9Z6@(g8l+ZrID%t(lUIa0mZu8KENRKya?AifPy!C{"
    "nNpm37Mai^evQuGNy<@l_BM`K1$#sin1%O)Wk+Bhdf3WWmUG9783y0DZ-CMXRz}zlBGGyQhu^|g"
    "~*$-"
    "TxtF9xR6iR}4viMlGF%ib3MQc_x4dAR;5NviRz@@$WcLcuR1leZ3jhozNF!@XNYa9;+RFARnPL2"
    "lx@%uynN|g|JNi`m{;=Kw2+EM#mJFh|S0FNP^BMQ2%H2~Qm2E=`aU8fr2;F9g4$?&d3AX<i&<Wr"
    "JCt3dst&ev3ko06WHAE3c)w&k1dgbZNu2wHBe%Y>3CHCZMe22?2%x>mVj!P<cJy6>ed=pYrQMtf"
    "!f>d$1q|H~(%Vrrfq&4Ru8Wd<)s84%H1yIkhY0G@&3z{pKHyxD3cWspLL(yYQpq8J@!TTA}ie3="
    "Px4V<UO1~P%7+9>5MONV_ir7l&53{WPkd9XWW1Mh2st&DXZuo~(F4dmp*F?yb@^^P0}p0DXEOw0"
    "sR+5a-E1!zEV$u^64nFP;sV`l6B#6!T|NT1w^Sb$^c-Cq}@fjM-"
    "`&DdR0a6iZNaXDKAyghR5L)3$-"
    "prCku!HOvaWaQkoy_xg}Bkk7Ebo7MdN9H<nY8;@`RFFP?*brpmLQ=TCRRZVEH&xA7L-"
    "82tc14}VHLQ=&HO-ic!d0=Tfx7HCoOvzxsLCb@3&&KPF7u_~w=rVeDc5wYeCqq6_-"
    "rN`TSgUBiZjq%Rq=kZa5naD-"
    "}ye{bS^HmtYyV|<>PL#z1!GZ3(>23w!)vY1b=aIG)}pcq7I$7g)^=U{pbD_E;1{_JjLWg&vupJ&"
    "5Axk_VZHAuql{5mQ;!{`Nyy8K`C0zM86*WS%N9I8uRm8OECO|TA_1934Sapt*q24K|St>+;c1?*"
    "ndbN>snwjUXeHLo^C5bPkYf|jTeRZ)7Nd!v&RL<Ij3?^G(R7;2S{(6gkqs`F`k#)l!Jvq<@aRgv"
    "hc?Dp1G?E3>1(Y5B6!yL`~LT1|K{!kc}$Pk#asALt_lCD4Nqy_PBJR-ApR3om0H`{zM9zTacn=u"
    "Oy*}=%VmsRst%${2akfh(pyBWeefYQCQARPmG5!v~Tk7WlN%9(z(@i&sueSqTg|PzFZy!NBwLhB"
    "OGzIT!&Mg?1Khc#LvmKzBtQ$cVa82FW&3Y@GsKx#;o&Wd>qzpxYDk%OGe!ZZ&X)oFZpDPMZ~W2+"
    "4dGV_0HXI{f8mC4x_-6FKWov(|!Nenh<`M5Hk1Ne-eU=U$L_27y->Q{Hxb46BwPZcDWy@grjk-T"
    "sZ}NsHUUYu~2skb|3BSW*RbpJ4*p6&%7*Q@56p;|2aDd`(3rvk>&{d^LP)f6P%&{cyyRYnG4K3j"
    "g8iibAcnry}xWUlc7FlEm%dH1fn`W2C@Y%g6{XR{S*sBXs`ZQ*1e>RL!%!yrX6)Kq4|Q;fRF-"
    "w{?PD5r&<T*326<J&&=RUae&3kQd`h)TMkifcZAb2Zlq&V&X6BeH1g2R6+Y^1p4A|`0w;g=&)I2"
    "b;OPw}M65f)@Bb-OY|!i=A>Q}Yi6>?dyvVV7{VKrve`Cz!R%cLOGTg9j!2%b3oPOAZ8e*<GYrk+"
    "f85t)f^PVh_ktW)AHDQg61j4pY54D|fQv15xV@((Q7$9)Z;-"
    "DL*>oWggzVCqz@>1)vOg^~B(TE)4=!<`>3Pw7J{z$W&<mo&dh@y=HU(|J}IGycqj{0vPDtc_rB`"
    "Nt~yjmJf@{I%X*nipg8l*wP$>iwyN*^F`tDavw>j5~mZP_=H1P9`b6BU>(;3g%u`GcA!q|&UlR>"
    "zpYSn}60pMf$y_g)=$_^O8r+=_ej@0y}j@!-"
    ";_8Vf96;hTN9gNRO%n_2`3BC>Re*GZoEn=i9{yLr|Ki<tgbJG3Z{L)V36lqDr`lk?XwGoKI+|GW"
    "9vph*JGSa3|PjB5eYoAN>a2WCK#O|xZcvw_kQzTBmIBp4#p@y6dKg8_q+&-"
    "<<mL_IqC^k=s#=yT2S%dEOW_Jv#i!=bM5ve5XuSd$ARUikc^|AY%T^TvexWI02G|IwOlRSrP-_u"
    "iu)6(@jyrhi|RjT<nS1xzS;ZtynkVcHohH+Z*EojQ@?4s7pq2|J5C;fQhnBa;SiDAM5IuMwfZdb"
    "M*^QWynFO^d__^eAAvJGAFZzc(oB<@DCrd%%bTky+$`Gwi%rxppeg239Nv0&c(4f_5pzZLF`=v0"
    "X8C|An4|@YKJ^{%(vnGFwdbJl3Y7Q;XA%VD>Ah(|%|-"
    "#rPU>Ub=LC_)sJY4zpWIXGP)1^4+iV`lC_lRn}7Evlu+YsHiQz8H-"
    "*n_H|oz<FLujTj3==4hfu7x{8`{NNqMgT-z3dVX^%u?Pnvf>J#BDRXYHyzX{0;^mlih-ZI*LniL"
    "KKnZ~+l`(hxBKdnN>Iu7b<g>FPr<H521MP}mv5}+a4tMV5;0nFGn2BifPVPxDYYWz_mln$56Oyn"
    "d%OMvB!dTui8bQ(G@-"
    "<JaWYFSx>B+|fI?)2va7Bo2eZq583{&ZM{lJJ?)bhs4%ieciq9XhY<mAh>rgY%L<R>l)nIxf`+W"
    ")-TPgyh7l39st3p!Y{(3zQjyt>%;IiW_F|GTPmhrf&&JsU%y2W-"
    "B;Z;<2<{jR<WYjMiOEi7;^Gv1WW05xQfOQt5jy0<o|@Ujpo4W!bx857`mM;52iVJ{kNas&3KtO{"
    "@A>taAyUB!hI``{=tDo#43gV7;G<17x^dBE9|lH@#{7exb8=;CwGbZmh)~RO)E(<$(i)y?WHzT~"
    "2})X`QUge@H+WW93K*Ac2>7--GKp_V9aEH?(=32r5e3_c=%yf==;^5SN3T*z-xeXmzI<hN-"
    "G}I!k<3_1?0?p80pTUX4c2KOMS)=SHQD4)jML@+W*W7>dSz4dd}Li8x%MPr-"
    "xrc;p|{cTjRl#B{%Sz15H;q@EGt?$b@iq?L`%py$bW&*<Is(AE@0y|AO=ImuX8)AZmjM-ujDyBu"
    "7#io=!Kl=fp4VW_kAE?SGDO;xaoaBDI;3^w1k>AsGL2bIY33HigRU}oDdijy>uxu39if-"
    "3{6LXEs5*fQa0!N|(4*-W@cpWI|>qJxDNtH^&b3@F#_DQ>%v1-"
    "=hT8#VZ|;lzOH8}qSj@F|vQsPN2z?M2j9?ngNwEk<xy?#O}v19T+ZA^"
)
_WINDOW_BLOB_D: str = (
    "c-jq=cRUmf9L5_~iAs7yD3p*wRHxEUk`Waup-7^XhzO~aRWdTN<Ltf1Is0d?&Isr1b<QYRB}(-"
    "6=lA)1p8vkjQ(+|6U21gzZDg&vHxn4BaPs$wu^0vtCVy+vN*O2;D|mG<mVqqseAX-"
    "X82ELm{dMmi2C6S;j?R>fW6>T5@nG$7Og_dg{fkCNqdbQ%9!hj<Yp9a?<1mJLPlAbeRY%d}+7Y4"
    "k$|2;px7c~Kt_Q6NPco=QtvKy`!!kH`_^hClSOa-G1%jAwKK^i-"
    "3Nslg?5i0)P$1smX~^3LUSk)9Mr``v-C-HQOTv9%xUnkYk5Mlq|5d3Vp6!7v9c#bp>$^eo6r0bc"
    "#V$DD9&W&t-"
    "vP<)x9(=ow!ss*L;lrzO>jzfRZ%;r3jEss8aD^z!nsvmOg?=TitJMkmynXt=7p%+s$~J<TC+f$b"
    "P4+Zw^{EPp&WhOGYxs!DsV5)f&LM>a(sR9fz28DQk=%IcNx}2_**sB-AjmsOXrN1O}uk4?!58{^"
    "GrIrskY@tI3!{i?Ta|KTMRz!HPd;{5{ZrKTy`4Fv6vOfvcKGF2bNRkGDi1AV=_Veq|x3mT>b6at"
    "@bJcn-lJ_+ntC(zT(q6J=fyVQDowvRckU1tX4J~Fr{PT^47jU@l5P8A&MWF&P1Y2df)R6ndm2JD"
    "k`dwhN*e4%x3%(QA$>$N5-3ovRU2y!x8?-"
    "`n^NAE7lhE9JlNKS$hO>l*z}<tmCMl#~;s<Ku7I{fHT>@#_&NEbIW0=F;wZPJSBX06opo-"
    ">_SsUu*9qKEBlra+(zT`^yVB!Q(1xWWyK-fQAxBW1`lGIN*QtA@BnhzB;Wju{rIqZN+~?77w=hn"
    "FL1X~v9;QKJ*1!wD}$R$OEV6j`?8(61#>-"
    "23sR)kr90t(_A%ZulWw5gQ)aPyN&_YtwQ)m#8uXfyrwK=CutA~HPsyztx`fS1jF^AE+^f|y@aO{"
    "Gp9gnwigd!ws9AGA)6Z}^YfB!haVw+>F7fmCHA1eK!t{;()nNZUGAKN~0FDciA4)jBfUF3*J?jT"
    "AysU4v`vz|!(pI%y=c;m0(fzd632PFXubp^r994u#eH?+F-X-"
    "`gJzaS0bt$H0ZvPmPQ;I<flOaJTN^vDKsWX_T1PvF(&Vo`AUb-!uo$;@)@yBk-f-"
    "M(wD`xg=HBLb0U;0`H>zweq6{|LyUk45QpT=Br`XID#cDAZ67VR#Sy}fre1Le1<mkF=r;PWTek;"
    "3+Q=yN>M>X%?XYH$y}UEH0I^QvR2w@mUd@Orq!$mU#JJ6e%P`JRaqc}&`dVJV2G7X)pO$6?qbTc"
    "@Fp5KN;zJi>Iw1Iw2!H$4?H#iOgwR11`Sut?Hiu*ReU&&ukWN=lMZ)X*nS)hib#)=XO{Lg|<$c&"
    "ORpVG>5y<@>Z1Ct#f8>(JL7iOAy5J|bqHij!$dEAzLrk+DZXT{0*iC11_iK3XGVa1FcD`;BE-"
    "sZ9Sd`KKItK8!h+>ipv?9@01L3(&fD%QVM_(_kqsw=0lZ4KFqKKG!O1gfBCjrkl;0;O~YZ-BTTn"
    "uyv{Gavet_NZmd^`CX#{Y`#lLX9d=SEPY$awt+gBZ%dfB6sQAci8s!oYPF!e`HM%IY7MlX9pEuo"
    "uY&hx+~<RpD#3Em!bh*R6nrKQJdd;^LAUa>fOcID{`Co`w}l0Rg66pkJG*>QpE9eLWS)wnwvS_2"
    "SxBftKDhCLeHq4kMJd<6sKTm_Ul({T*5c{wOS>Sh9`{9X8zwq5;!b-"
    "(;RA_H*!pBcjz@nJa*sb8l5uUsl1qmh^@+8Zcz3&Jg;@y>NOK1Bc?DqD-KysdMilHR9<dE}iosR"
    "Gqp{AuMcB&rQg{Paq0asnF}B>bm^H&)&;P0x?Jph_V{fg&zt7S+g&$R8t7C&BpMNE?lE1s}&MiZ"
    "?bJBe8NMsz6@+<b#&%=OCnG>gqQ*k)J_3v$eA_kJ=_U9{jp>d#|&%@uw2%<PvW)Tjq7Q>1hs<jZ"
    "k@tA~maUEp4NtJxysE4t0744CMb)b?eQzH^m3ySX#Qadziz_>zWq4`r4><jRESi(~Y%;mBjZJK5"
    "9=Gn~c&}uSNWmg24IOTz-nHV)xD;20mL^6ITN5Xkg2UxFghg&;#u|DlJ0qNqsYbiVl(Dz$<@hxv"
    "9oIT9K*VkPK`af%JlNFkv-(IU#kFNy;RNZ!&SGGe#3-6^M&Q7R$oeySrs37*Z-"
    "FzUQ2Dgl6wcEG$f&LArn2**2pb~lRrrP2Vyd5|~pKcj}9QK8jhlDX;v2a)*Wz!*MKv9~BmjP*K2"
    "vtkm-C&@}mSA&h0xC?R-"
    "n&1V0Mwv|j{oE1ZXOw*4o$$0k8zs4T?}w($XbZAVgPST^i$XMaTwmHC#mT>4zVFoBz@6wm?(|;w"
    "%$*NxA|Nrs4aA`K1-6ck{*Yh9<le+E-"
    "~PYnW6=U=_K$C5sah^z5v@LHHVh4uW&dh!pMMi3LK|1nxnkvpd<Y)&_G}WtnY_jbLsDg&Tx;3+`"
    "m0wx5M>uIISDta6rxCY!@&)ZAf{uwG)cMbQ<H?Kf}nu*9^Dn7Lb#_GNZ@T1X3~&HVyaHz-"
    "84^rvNO2qX#D|!!mNAQb#bT`#=;(y?y4({e2m@whX5gzih_CCOL`Oy6u?jqOKD-"
    "(1}Z;ZY|lNG^7v7)TbHtV-"
    "!`v^!eUl{7%(>d%}DalRw$?MxUpn)(yAFWHAOlJS$)1BQ%MW&0EF;Pfp`Z$x6r@%dfaibjK!+(r"
    ";*)K9Ok4HIKi!I7tKd7f>xoe*@RsMYNsl5h7k&#0YtxeV?~3VoG8&A+&P=0}Uf54tp=4$H$`y7h"
    "wVQ=<Y*Zzvj_5mGtpr={&wVrWke4Wge%9vB}9Q^LUZRCHw-"
    "*JW}?_g}i<`hc9GxYR1ZD@sY8Jqf+lT{AKfC`{%|P<eF62Bl7Vps<xO6o9^$1<XKNXGx8KhIm8!"
    "APflRc&$`K%atsuZ=yrTeqN6g~Z%u~97_!?7RQO&QMJEr<7xLFfQ2OYRsN3`*T)7}$IDTvpuj`t"
    ")O}ywwVUby(zK~u#)&JFngFwTxzGrlWzII|fPmq@<w4yQDwt?Nd61^`h1w6_Mz$T4~lhg5TDA@J"
    "HP{Ji2C*sw(&Y2-"
    "<s_1|9$*RH$o&wrNt|~07QnDqgRA9&z>RwKRV*F9Av{mX{0Vbs<ZjSkqg+%?TE1||oI57I~$?9?"
    "xnzy4s)4V^j*VPoIu2|zw@%`5y?eYM}=s`9XH6r*wdbMb|H5R(2)9)8O^}?>VrQBhW7O1GETrrd"
    "V2DTk)s9|c0guFRB-_MrGu%nh@U^|%&&VSP8D*W<cR|Ma_RYD<9j=DQr#F2si>5aR_TQVFxYBj%"
    "BOoCjG6-NctJP=V^ZV44g2lb!SUDmo$P@X;&S2O2>ZC#ADvAbdTuK22C%YJwG%E)h0OAmu-"
    "f?s~$=LDFKw$ts8%>tzd3(wA!=fg><2PTIH3gM#zv7`1u5lmfNKd)p~1YG=~zb3{Cfw#et;If(z"
    "fBut8T=UO{cb+yUjx{BK<1FV=!b?9`{YGW(*7HUUiC34(W|DCBvFWm*Qxt}uW1|SYB4O}xiHN2d"
    "68eiYzkIhsLIPpams-_A>{CsUX;dcTl$}7K?w(={P-p(jTvUqrvXZOPOo-"
    "d>UN(Dnw+jF2MRru^*P#E6KHka$btpn=nLnpqk7J>CF4*_fp}fWVr1z<6^i=foml)1PUgP<lL+}"
    "!mOtlYPNk%Z?IeTU0d@10-rUe_<JlOqK%S(<q2~w=z6f+cq;Jv?r$`bV&Xi5BD*sJM-omNZTcNQ"
    "a1jz@mGMnN3vMYqnK$VkHYAA2WiSyR!}bzOxZo{B70V%ZYM{^bko-"
    "&4*Lk;wF4R@<y2wj~Hjosn?Db*|s-%zLe|y=T2qll%-"
    "$>vHz}=nes<;rLem>IATs_A_EC%Y@jNz2S3(dC*44=JU)Ufo3q*UaJB!xYZx}^sA-_G`J`ErIv~"
    "y^lGYYyHgSLM``^OC6mGH>enX9F*4la^LX_*q!3(e4`pmh%LPJDVf}KVEAZ1PJJSq{A(&Y}+d85"
    "cM*M31PU{uJ=vw-Fnr{iPkE#>45X<187NuT0zXFI#octNWm9UzAFU{Mz5@L0TVl5Xd!DyRP-"
    "8`iN&Rh&@$S^L2jyw9y!n+G$%gyAK6A_v4L$}2)XEX%LCFM7<4FzDi{F_}@>+ZuRTcUA+M+GwL4"
    "%9WO)}v{ODXSv~1=Y&;ZL`*DN3L79uC(v#K*4s78%IJqaVmb>Pz0q5PYs65xqhbNzTm{H=#*}>y"
    "l<SnQJse5+g5V@K{O<A4XDd2)6l+H>p)f+6`kKujvG&W#<VYl5qs5IO#i-"
    "LR)De#Pj2WcKWWki0w1*0{dQ8pncpu_%76yBS^JY*?R(&EZtn-L|9T<c-7@)iP%m8LP-"
    ";CQ*ascmdT!nIeGuCoFGUOMhZ4IR^mE|@u*J0Pifr>B?95_ga}XZ}1DTUwck7P8q0yD=nf#-"
    "$1TnAZU88Wzb1+!j{3=ww*dddn`wFKemVb1=Q^s2vf+10g9^m8k^4(x|2sA8{N+2!<jFg+k5|a|"
    "3-~FMvzeX~6zc(?`EKY&rF&1;16;q*%ae38TCly*=G%9<Bq(aRb@ApAF(m_8e_oFyu!;b~4#O-"
    "GJK!uacAsQsG6;Dg`-+2sd6IZ!~j+5X>#JGFG%>p=jrZxA;{agsVf6HX#-"
    "`_O&QJy$WWW&9}KpARD4k%>%!+dovI1kpB*2L#Q$q}`X=YR8nKxO0fwaWubvF7T8upIcar0!I_n"
    "hFZ1Ht)P69tCRAz0dCNF~PboV#K8_3Fv%Q;n6+u(_pn>j^o3>-"
    "CB|^cYfJN!3$lIhgv9~5&7RuX|{DCMM<kWPMn5wK?6{|+JpS98h1{a_F=#i&x=dX`qBRMex7Fa0"
    "rdW{R_V|=fQ6Sw$J#ayB3^VpBo;P+*%{>O0?vM<gx=q?q({RaS-"
    "$0m6I)SjWz=1Ta~lYf38{VVt*|~)rat7-"
    "0}8J3G}!|~aLtG!f_)<(RrGELje88zoGx3ru+!mCWXF%K6LcsH>RV?bkAtoXoA5Ue2E?n^MVDQj"
    "0GsMqk`n(U9Ba`TzD}Kl$I(*xiI1jWGts`3r+x~Kh!XBBR7}DD03>rd"
)
_WINDOW_CACHE: dict = {}


def _window_pair() -> tuple[np.ndarray, np.ndarray]:
    got = _WINDOW_CACHE.get("ad")
    if got is None:
        a = np.frombuffer(
            _zlib.decompress(_base64.b85decode(_WINDOW_BLOB_A)), dtype="<f8"
        ).astype(np.float64)
        d = np.frombuffer(
            _zlib.decompress(_base64.b85decode(_WINDOW_BLOB_D)), dtype="<f8"
        ).astype(np.float64)
        if len(a) != 512 or len(d) != 512:
            raise AssertionError("corrupt embedded window pair")
        got = (a, d)
        _WINDOW_CACHE["ad"] = got
    return got


_NN = np.arange(512)
_SIGN512 = (-1.0) ** (_NN // 64)
_ANALYSIS_MOD = np.cos((2 * np.arange(32)[:, None] + 1)
                       * (_NN[None, :] - 16) * np.pi / 64.0)
_SYNTH_MOD = np.cos((16 + np.arange(64)[:, None])
                    * (2 * np.arange(32)[None, :] + 1) * np.pi / 64.0)


class _Synthesizer:
    """Stateful 32-band polyphase synthesis (V-FIFO/U/W flow, §2.4.3.2.2)."""

    def __init__(self) -> None:
        self.fifo = np.zeros(1024)
        _, self.d = _window_pair()

    def run(self, subband_block: np.ndarray) -> np.ndarray:
        """(18, 32) subband samples → 576 PCM samples."""
        out = np.empty(18 * 32)
        fifo = self.fifo
        d = self.d
        for t in range(18):
            fifo[64:] = fifo[:-64]
            fifo[:64] = _SYNTH_MOD @ subband_block[t]
            U = np.empty(512)
            for b in range(8):
                U[64 * b:64 * b + 32] = fifo[128 * b:128 * b + 32]
                U[64 * b + 32:64 * b + 64] = fifo[128 * b + 96:128 * b + 128]
            out[t * 32:(t + 1) * 32] = (U * d).reshape(16, 32).sum(axis=0)
        return out


class _Analyzer:
    """Stateful 32-band polyphase analysis (encoder side)."""

    def __init__(self) -> None:
        self.x = np.zeros(512)
        a, _ = _window_pair()
        self.rows = _ANALYSIS_MOD * (a * _SIGN512)[None, :]

    def run(self, pcm32: np.ndarray) -> np.ndarray:
        """32 new PCM samples → 32 subband samples."""
        self.x[32:] = self.x[:-32]
        self.x[:32] = pcm32[::-1]
        return self.rows @ self.x


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def decode_mp3(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Full sample decode of a Layer III stream → (sample_rate, channels,
    float64 PCM array, shape (n, channels), nominal range ±1).

    MPEG-1 streams decode fully (bundled Huffman tables permitting).
    MPEG-2/2.5 (LSF) granules decode when they need no LSF scalefactor
    band table — zero scalefactor bits, ``big_values == 0``, and (for
    short blocks) no nonzero count1 lines, since requantization is then
    band-uniform: ``2^((global_gain-210)/4)``. Anything beyond that
    subset raises ``ValueError`` naming the missing LSF table (the
    22050/24000/16000 Hz sfb boundary literals could not be sourced in
    this sandbox; see the module docstring). The one real MP3 on this
    disk — MPEG-2, 22050 Hz, digital silence — decodes end-to-end
    through this path (tests/test_mp3.py)."""
    frames = walk_frames(payload)
    rate = frames[0]["sample_rate"]
    nch = frames[0]["channels"]
    mpeg1 = frames[0]["mpeg1"]
    spf = frames[0]["samples"]  # samples per frame: 1152 MPEG-1, 576 LSF
    # --- bit reservoir: concatenate main_data, remembering per-frame starts
    reservoir = bytearray()
    starts = []  # absolute reservoir byte offset where each frame's data begins
    sides = []
    for hdr in frames:
        if hdr["sample_rate"] != rate or hdr["channels"] != nch:
            raise ValueError("mid-stream format change")
        verify_crc(hdr, payload)
        side = parse_side_info(hdr, payload)
        data_off = (hdr["offset"] + 4 + (2 if hdr["crc"] else 0)
                    + side["side_bytes"])
        md = payload[data_off:hdr["offset"] + hdr["frame_len"]]
        begin = len(reservoir) - side["main_data_begin"]
        if begin < 0:
            raise ValueError("main_data_begin reaches before stream start")
        starts.append(begin)
        reservoir.extend(md)
        sides.append(side)
    main = bytes(reservoir)
    sfb_long = _SFB_LONG.get(rate)
    sfb_short = _SFB_SHORT.get(rate)
    overlap = [np.zeros((32, 18)) for _ in range(nch)]
    synth = [_Synthesizer() for _ in range(nch)]
    pcm = np.zeros((len(frames) * spf, nch))
    for fi, (hdr, side) in enumerate(zip(frames, sides)):
        r = _BitReader(main, starts[fi] * 8)
        prev_sf: list[dict | None] = [None] * nch
        for gi, chans in enumerate(side["granules"]):
            decoded = []
            for ci, g in enumerate(chans):
                part2_end = r.pos + g["part2_3_length"]
                if mpeg1:
                    sf = _read_scalefactors_mpeg1(
                        r, g, side["scfsi"][ci], prev_sf[ci] if gi else None)
                    if gi == 0:
                        prev_sf[ci] = sf
                    xs = _decode_spectrum(r, g, sfb_long, part2_end)
                    xr = _requantize(xs, g, sf, sfb_long, sfb_short)
                    if g["block_type"] == 2:
                        xr = _reorder_short(xr, sfb_short)
                else:
                    xr = _decode_lsf_granule(r, g, part2_end)
                decoded.append((g, xr))
            if nch == 2 and hdr["mode"] == 1:
                if hdr["mode_ext"] & 1:
                    raise ValueError("intensity stereo not supported")
                if hdr["mode_ext"] & 2:  # MS stereo
                    m, s = decoded[0][1], decoded[1][1]
                    inv_sqrt2 = 1.0 / np.sqrt(2.0)
                    decoded[0] = (decoded[0][0], (m + s) * inv_sqrt2)
                    decoded[1] = (decoded[1][0], (m - s) * inv_sqrt2)
            for ci, (g, xr) in enumerate(decoded):
                if g["block_type"] != 2:
                    xr = _antialias(xr)
                sub = _imdct_granule(xr, g["block_type"], overlap[ci])
                block = sub.T  # (18, 32): time-major for the synthesizer
                lo = fi * spf + gi * 576
                pcm[lo:lo + 576, ci] = synth[ci].run(block)
    return rate, nch, pcm


def _decode_lsf_granule(r: _BitReader, g: dict, part2_end: int) -> np.ndarray:
    """Decode one LSF granule within the supported subset (see
    :func:`decode_mp3`): no scalefactor bits, no big values, so
    requantization is the band-uniform ``2^((global_gain-210)/4)`` and
    no LSF sfb table is required."""
    if lsf_scalefac_bits(g) or g["big_values"]:
        raise ValueError(
            "LSF granule needs scalefactor-band tables (nonzero "
            "scalefactors or big_values) — 22050/24000/16000 Hz sfb "
            "literals unavailable in this sandbox"
        )
    xs = _decode_spectrum(r, g, (0,) * 23, part2_end)
    if g["block_type"] == 2 and np.any(xs):
        raise ValueError("LSF short-block reorder needs the missing sfb table")
    gain = 2.0 ** (0.25 * (g["global_gain"] - 210))
    return np.sign(xs) * np.abs(xs).astype(np.float64) ** (4.0 / 3.0) * gain


# ---------------------------------------------------------------------------
# encoder (constrained: MPEG-1, long blocks, bundled tables only)
# ---------------------------------------------------------------------------

def _huffman_cost_pairs(vals: np.ndarray, tid: int) -> int:
    if tid == 0:
        return 0
    xlen, entries = _PAIR_CODES[tid]
    bits = 0
    for i in range(0, len(vals), 2):
        x, y = abs(int(vals[i])), abs(int(vals[i + 1]))
        bits += entries[x * xlen + y][0] + (x != 0) + (y != 0)
    return bits


def _pick_pair_table(vals: np.ndarray) -> int:
    m = int(np.abs(vals).max()) if len(vals) else 0
    if m == 0:
        return 0
    if m == 1:
        return 1
    candidates = (2, 3) if m == 2 else (5, 6)
    return min(candidates, key=lambda t: _huffman_cost_pairs(vals, t))


def _encode_pairs(w: _BitWriter, vals: np.ndarray, tid: int) -> None:
    if tid == 0:
        return
    xlen, entries = _PAIR_CODES[tid]
    for i in range(0, len(vals), 2):
        x, y = int(vals[i]), int(vals[i + 1])
        ax, ay = abs(x), abs(y)
        hlen, hcod = entries[ax * xlen + ay]
        w.write(hcod, hlen)
        if ax:
            w.write(1 if x < 0 else 0, 1)
        if ay:
            w.write(1 if y < 0 else 0, 1)


def _encode_granule_bits(
    xs: np.ndarray,
    sfb_long: tuple[int, ...],
    w: _BitWriter | None = None,
    window_switching: bool = False,
) -> tuple:
    """Partition + Huffman-encode one granule's 576 integer lines,
    appending to ``w`` (which already carries the scalefactor bits when
    the caller wrote any — spec part2 ordering). Returns (writer,
    side-info fields dict). With ``window_switching`` the big-value
    region split is the spec's fixed two-region layout (boundary at
    line 36, two table selects) used by block types 1/2/3."""
    nz = np.nonzero(xs)[0]
    last = int(nz[-1]) + 1 if len(nz) else 0
    # rzero boundary: pairs; count1 region: quads with |v| <= 1
    big_end = last
    while big_end > 0 and abs(int(xs[big_end - 1])) <= 1:
        big_end -= 1
    big_end += big_end & 1  # pairs
    quad_end = big_end + ((last - big_end + 3) // 4) * 4
    quad_end = min(quad_end, 576)
    if big_end > 576 or np.abs(xs[:big_end]).max(initial=0) > 3:
        raise ValueError("big-value magnitude > 3 (bundled-table encoder)")
    if w is None:
        w = _BitWriter()
    if window_switching:
        # fixed split per §2.4.2.7: region0 = first 36 lines, region1 = rest
        r0_end = min(36, big_end)
        t0 = _pick_pair_table(xs[:r0_end])
        t1 = _pick_pair_table(xs[r0_end:big_end])
        _encode_pairs(w, xs[:r0_end], t0)
        _encode_pairs(w, xs[r0_end:big_end], t1)
        tables = [t0, t1]
    else:
        # region split at sfb boundaries: region0_count=7, region1_count
        # chosen so region2 is the tail (any split is legal; decoder uses
        # the same map)
        r0c, r1c = 7, 7
        r0_end = min(sfb_long[r0c + 1], big_end)
        r1_end = min(sfb_long[r0c + r1c + 2], big_end)
        t0 = _pick_pair_table(xs[:r0_end])
        t1 = _pick_pair_table(xs[r0_end:r1_end])
        t2 = _pick_pair_table(xs[r1_end:big_end])
        _encode_pairs(w, xs[:r0_end], t0)
        _encode_pairs(w, xs[r0_end:r1_end], t1)
        _encode_pairs(w, xs[r1_end:big_end], t2)
        tables = [t0, t1, t2]
    # count1 quads: pick the cheaper table
    quads = []
    for i in range(big_end, quad_end, 4):
        q = [int(xs[i + j]) if i + j < 576 else 0 for j in range(4)]
        quads.append(q)
    costs = []
    for tid in (0, 1):
        entries = _QUAD_CODES[tid]
        c = 0
        for q in quads:
            pat = ((q[0] != 0) << 3) | ((q[1] != 0) << 2) | ((q[2] != 0) << 1) | (q[3] != 0)
            c += entries[pat][0] + sum(v != 0 for v in q)
        costs.append(c)
    ct = 0 if costs[0] <= costs[1] else 1
    entries = _QUAD_CODES[ct]
    for q in quads:
        pat = ((q[0] != 0) << 3) | ((q[1] != 0) << 2) | ((q[2] != 0) << 1) | (q[3] != 0)
        hlen, hcod = entries[pat]
        w.write(hcod, hlen)
        for v in q:
            if v:
                w.write(1 if v < 0 else 0, 1)
    fields = {
        "big_values": big_end // 2,
        "table_select": tables,
        "window_switching": 1 if window_switching else 0,
        "count1table_select": ct,
    }
    if not window_switching:
        fields["region0_count"] = r0c
        fields["region1_count"] = r1c
    return w, fields


#: transient detection: a granule goes SHORT when its 36-sample MDCT
#: window simultaneously holds loud content and near-silence — the
#: pre/post-echo condition (quantization noise of a long window spreads
#: over all 1152 samples it covers; against near-silence that noise is
#: unmasked). 1e-4 = 40 dB spread; the floor ignores numerically-quiet
#: windows outright.
_TRANSIENT_RATIO = 1e-4
_TRANSIENT_FLOOR = 1e-7


def _assign_block_types(chunk_energy: np.ndarray) -> list[int]:
    """Per-granule block types (0 long / 1 start / 2 short / 3 stop)
    from 6-subband-sample chunk energies: 3 chunks per granule with one
    virtual silent granule prepended, so granule ``g``'s MDCT window is
    ``chunk_energy[3g : 3g+6]``. Emits the spec-legal window sequence
    (…0,1,2…2,3,0…); a long granule squeezed between two shorts becomes
    short itself (it cannot be start and stop at once)."""
    ngran = len(chunk_energy) // 3 - 1
    short = [False] * ngran
    for g in range(ngran):
        win = chunk_energy[3 * g: 3 * g + 6]
        mx = float(win.max())
        if mx > _TRANSIENT_FLOOR and float(win.min()) < mx * _TRANSIENT_RATIO:
            short[g] = True
    changed = True
    while changed:
        changed = False
        for g in range(1, ngran - 1):
            if not short[g] and short[g - 1] and short[g + 1]:
                short[g] = True
                changed = True
    out = []
    for g in range(ngran):
        if short[g]:
            out.append(2)
        elif g + 1 < ngran and short[g + 1]:
            out.append(1)
        elif g > 0 and short[g - 1]:
            out.append(3)
        else:
            out.append(0)
    return out


def _forward_mdct_long(seg: np.ndarray, window: np.ndarray) -> np.ndarray:
    """36 windowed subband samples → 18 spectral lines; exact inverse of
    the decoder's long/start/stop IMDCT + overlap-add (verified to
    ~1e-14 round-trip together with :func:`_imdct_granule`)."""
    return (_IMDCT_COS.T @ (window * seg)) / 9.0


def _forward_mdct_short(seg: np.ndarray) -> np.ndarray:
    """36 subband samples → 3 windows × 6 spectral lines (filterbank
    order), the inverse of the decoder's block_type-2 IMDCT placement
    (windows at offsets 6/12/18 of the 36-sample span)."""
    out = np.empty(18)
    for wi in range(3):
        out[wi * 6:(wi + 1) * 6] = (
            _IMDCT12_COS.T @ (_WIN_SHORT * seg[6 + wi * 6:18 + wi * 6])) / 3.0
    return out


_SHORT_IDX_CACHE: dict[int, np.ndarray] = {}


def _short_huffman_to_fb(sfb_short: tuple[int, ...], rate: int) -> np.ndarray:
    """Index array mapping Huffman order (sfb, window, line) → filterbank
    order (subband, window, line) — the encoder-side inverse of
    :func:`_reorder_short` (same index walk, applied as a gather)."""
    got = _SHORT_IDX_CACHE.get(rate)
    if got is not None:
        return got
    idx = np.empty(576, dtype=np.int64)
    for b in range(len(sfb_short) - 1):
        lo, hi = sfb_short[b], sfb_short[b + 1]
        width = hi - lo
        for win in range(3):
            for i in range(width):
                line = lo + i
                idx[lo * 3 + win * width + i] = (
                    (line // 6) * 18 + win * 6 + (line % 6))
    _SHORT_IDX_CACHE[rate] = idx
    return idx


def _quantize_long_granule(
    xr: np.ndarray, sfb_long: tuple[int, ...], share: int,
    window_switching: bool,
) -> tuple:
    """Gain/scalefactor search for a long-family granule (block types
    0/1/3): among every global_gain whose quantized magnitudes fit the
    bundled tables (max |q| <= 3) AND whose Huffman bits fit this
    granule's share, keep the one with the smallest actual reconstruction
    error — coarser gains zero more lines, finer gains clip less, and
    neither end is uniformly better. Per-band scalefactors
    (scalefac_compress 15) sharpen quiet bands up toward the |q| <= 3
    ceiling instead of quantizing them to silence under the loudest
    band's step. Returns (global_gain, writer, fields)."""
    mag = np.abs(xr)
    maxmag = float(mag.max(initial=0.0))
    # closed-form search start: q <= 3 iff mag/step < 3.5946^(4/3)
    if maxmag > 0.0:
        lo = int(np.ceil(210 + 4 * np.log2(maxmag / 5.494690))) - 1
        lo = max(0, min(lo, 255))
    else:
        lo = 210
    sfc = 15
    slen1, slen2 = _SLEN1[sfc], _SLEN2[sfc]
    caps = [2 ** slen1 - 1] * 11 + [2 ** slen2 - 1] * 10
    chosen = None
    best_err = None
    for gg in range(lo, min(lo + 16, 256)):
        step = 2.0 ** (0.25 * (gg - 210))
        sf = [0] * 21
        scale = np.ones(576)
        for b in range(21):
            b_lo, b_hi = sfb_long[b], sfb_long[b + 1]
            m_b = float(mag[b_lo:b_hi].max(initial=0.0))
            if m_b <= 0.0:
                continue
            s = int(np.floor(2.0 * np.log2(5.494690 * step / m_b)))
            s = max(0, min(caps[b], s))
            while s and np.floor(
                (m_b * 2.0 ** (0.5 * s) / step) ** 0.75 + 0.4054
            ) > 3:
                s -= 1
            if s:
                sf[b] = s
                scale[b_lo:b_hi] = 2.0 ** (0.5 * s)
        q = np.floor((mag * scale / step) ** 0.75 + 0.4054).astype(np.int64)
        if q.max(initial=0) > 3:
            continue
        recon = q.astype(np.float64) ** (4.0 / 3.0) * step / scale
        err = float(((mag - recon) ** 2).sum())
        if best_err is not None and err >= best_err:
            if err > 4.0 * best_err:
                break  # monotonically worse from here on
            continue
        xs = (np.sign(xr) * q).astype(np.int64)
        use_sfc = sfc if any(sf) else 0
        w = _BitWriter()
        if use_sfc:
            for b in range(11):
                w.write(sf[b], slen1)
            for b in range(11, 21):
                w.write(sf[b], slen2)
        w, fields = _encode_granule_bits(xs, sfb_long, w, window_switching)
        if w.bit_length() <= share:
            fields["scalefac_compress"] = use_sfc
            chosen = (gg, w, fields)
            best_err = err
    if chosen is None:
        # loud broadband content at a low bitrate: nothing in the
        # error-minimizing window fits, so walk the gain coarser with
        # scalefactors OFF until the bits fit — terminates because a
        # coarse enough step zeroes everything (found by the Hypothesis
        # round-trip property, seed in tests/test_properties.py)
        for gg in range(lo, 256):
            step = 2.0 ** (0.25 * (gg - 210))
            q = np.floor((mag / step) ** 0.75 + 0.4054).astype(np.int64)
            if q.max(initial=0) > 3:
                continue
            xs = (np.sign(xr) * q).astype(np.int64)
            w, fields = _encode_granule_bits(
                xs, sfb_long, None, window_switching)
            if w.bit_length() <= share:
                fields["scalefac_compress"] = 0
                chosen = (gg, w, fields)
                break
    return chosen


def _quantize_short_granule(
    hxr: np.ndarray, sfb_short: tuple[int, ...], sfb_long: tuple[int, ...],
    share: int,
) -> tuple:
    """Gain search for a SHORT granule (block type 2), spectrum in
    Huffman order: per-window subblock_gain centers each window's step
    (a quiet window next to an attack gets up to 2^-14 finer), and
    per-(window, band) scalefactors sharpen quiet bands toward the
    |q| <= 3 ceiling — the short-block twin of the long-path search.
    Returns (global_gain, writer, fields) with subblock_gain set."""
    mag = np.abs(hxr)
    maxmag = float(mag.max(initial=0.0))
    if maxmag > 0.0:
        lo = int(np.ceil(210 + 4 * np.log2(maxmag / 5.494690))) - 1
        lo = max(0, min(lo, 255))
    else:
        lo = 210
    sfc = 15
    slen1, slen2 = _SLEN1[sfc], _SLEN2[sfc]
    nb = len(sfb_short) - 1
    # per-(window, band) slices of the Huffman-order spectrum + maxima
    slices = []
    wb_max = np.zeros((3, nb))
    for b in range(nb):
        b_lo, b_hi = sfb_short[b], sfb_short[b + 1]
        width = b_hi - b_lo
        for win in range(3):
            a = b_lo * 3 + win * width
            slices.append((win, b, a, a + width))
            wb_max[win][b] = mag[a:a + width].max(initial=0.0)
    w_max = wb_max.max(axis=1)
    chosen = None
    best_err = None
    for gg in range(lo, min(lo + 16, 256)):
        step = 2.0 ** (0.25 * (gg - 210))
        sbg = [0, 0, 0]
        # subblock_gain: largest 0..7 keeping the window max at |q| <= 3
        # (each unit is 2 octaves finer: expo -= 2 per unit)
        for win in range(3):
            if w_max[win] <= 0.0:
                continue
            g_units = int(np.floor(
                (gg - 210 - 4.0 * np.log2(w_max[win] / 5.494690)) / 8.0))
            s = max(0, min(7, g_units))
            while s and np.floor(
                (w_max[win] * 4.0 ** s / step) ** 0.75 + 0.4054
            ) > 3:
                s -= 1
            sbg[win] = s
        sf = [[0] * nb for _ in range(3)]
        scale = np.ones(576)
        for win, b, a, z in slices:
            m_b = wb_max[win][b]
            base = 4.0 ** sbg[win]
            if m_b <= 0.0:
                if sbg[win]:
                    scale[a:z] = base
                continue
            if b < 12:
                cap = (2 ** slen1 - 1) if b < 6 else (2 ** slen2 - 1)
                s = int(np.floor(
                    2.0 * np.log2(5.494690 * step / (m_b * base))))
                s = max(0, min(cap, s))
                while s and np.floor(
                    (m_b * base * 2.0 ** (0.5 * s) / step) ** 0.75 + 0.4054
                ) > 3:
                    s -= 1
                sf[win][b] = s
                scale[a:z] = base * 2.0 ** (0.5 * s)
            else:
                # band 12+ carries no scalefactor: subblock_gain only
                scale[a:z] = base
        q = np.floor((mag * scale / step) ** 0.75 + 0.4054).astype(np.int64)
        if q.max(initial=0) > 3:
            continue
        recon = q.astype(np.float64) ** (4.0 / 3.0) * step / scale
        err = float(((mag - recon) ** 2).sum())
        if best_err is not None and err >= best_err:
            if err > 4.0 * best_err:
                break
            continue
        xs = (np.sign(hxr) * q).astype(np.int64)
        any_sf = any(any(row) for row in sf)
        use_sfc = sfc if any_sf else 0
        w = _BitWriter()
        if use_sfc:
            # spec order: sfb-major, window-minor (matches the reader)
            for b in range(6):
                for win in range(3):
                    w.write(sf[win][b], slen1)
            for b in range(6, 12):
                for win in range(3):
                    w.write(sf[win][b], slen2)
        w, fields = _encode_granule_bits(xs, sfb_long, w, True)
        if w.bit_length() <= share:
            fields["scalefac_compress"] = use_sfc
            fields["subblock_gain"] = list(sbg)
            chosen = (gg, w, fields)
            best_err = err
    if chosen is None:
        # fallback: walk coarser with scalefactors/subblock gain OFF
        for gg in range(lo, 256):
            step = 2.0 ** (0.25 * (gg - 210))
            q = np.floor((mag / step) ** 0.75 + 0.4054).astype(np.int64)
            if q.max(initial=0) > 3:
                continue
            xs = (np.sign(hxr) * q).astype(np.int64)
            w, fields = _encode_granule_bits(xs, sfb_long, None, True)
            if w.bit_length() <= share:
                fields["scalefac_compress"] = 0
                fields["subblock_gain"] = [0, 0, 0]
                chosen = (gg, w, fields)
                break
    return chosen


def encode_mp3(
    pcm: np.ndarray,
    sample_rate: int = 48000,
    bitrate_kbps: int = 128,
    protection: bool = False,
) -> bytes:
    """Spec-valid CBR MPEG-1 Layer III encode of float PCM (±1 range,
    shape (n,) mono or (n, 2) stereo). Long blocks with per-band
    scalefactors for steady content; WINDOW SWITCHING (start/short/stop,
    per-window subblock_gain) around transients so quantization noise
    stays temporally confined instead of pre/post-echoing across the
    whole 1152-sample window (the Hypothesis burst counterexample,
    seed 1911833517, pinned in tests). No bit reservoir
    (main_data_begin = 0), bundled Huffman tables only — every produced
    stream round-trips through :func:`decode_mp3` and is decodable by
    any conformant third-party decoder. PCM is zero-padded to a whole
    number of 1152-sample frames."""
    if sample_rate not in _SFB_LONG:
        raise ValueError(f"MPEG-1 Layer III sample rate required, got {sample_rate}")
    if bitrate_kbps not in _BITRATES_L3[3]:
        raise ValueError(f"invalid MPEG-1 Layer III bitrate {bitrate_kbps}")
    pcm = np.asarray(pcm, dtype=np.float64)
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    if pcm.ndim != 2 or pcm.shape[1] not in (1, 2):
        raise ValueError("PCM must be (n,) mono or (n, 1|2)")
    nch = pcm.shape[1]
    n = pcm.shape[0]
    nframes = max(1, -(-n // 1152))
    padded = np.zeros((nframes * 1152, nch))
    padded[:n] = pcm
    sfb_long = _SFB_LONG[sample_rate]
    sr_idx = _RATES[3].index(sample_rate)
    br_idx = _BITRATES_L3[3].index(bitrate_kbps)
    frame_len = 144 * bitrate_kbps * 1000 // sample_rate  # padding bit unused
    side_bytes = side_info_size(True, nch)
    crc_bytes = 2 if protection else 0
    budget_bits = (frame_len - 4 - crc_bytes - side_bytes) * 8
    mode = 3 if nch == 1 else 0  # mono / plain stereo
    header = bytes([
        0xFF,
        0xFA if protection else 0xFB,  # MPEG-1, Layer III, CRC flag
        (br_idx << 4) | (sr_idx << 2),
        (mode << 6),
    ])
    sfb_short = _SFB_SHORT[sample_rate]
    short_idx = _short_huffman_to_fb(sfb_short, sample_rate)
    ngran = nframes * 2
    share = budget_bits // (2 * nch)
    # --- phase 1: analysis filterbank over every granule (frequency
    # inversion applied, self-inverse), so block types can look one
    # granule ahead (a long granule preceding a short one must carry
    # the START window)
    subblocks: list[list[np.ndarray]] = []
    btypes: list[list[int]] = []
    for ci in range(nch):
        an = _Analyzer()
        blocks = []
        for g in range(ngran):
            base = g * 576
            sub = np.empty((18, 32))
            for t in range(18):
                sub[t] = an.run(padded[base + t * 32: base + (t + 1) * 32, ci])
            cur = sub.T.copy()  # (32, 18)
            cur[1::2, 1::2] *= -1.0
            blocks.append(cur)
        subblocks.append(blocks)
        # transient detection: 6-sample chunk energies, one virtual
        # silent granule prepended so granule 0's window is covered
        chunks = np.zeros(3 * (ngran + 1))
        for g, cur in enumerate(blocks):
            for j in range(3):
                seg = cur[:, 6 * j: 6 * j + 6]
                chunks[3 * (g + 1) + j] = float((seg * seg).sum())
        btypes.append(_assign_block_types(chunks))
    mdct_overlap = [np.zeros((32, 18)) for _ in range(nch)]
    out = bytearray()
    for fi in range(nframes):
        granule_bits = []   # per granule per channel: (_BitWriter, fields)
        for gi in range(2):
            for ci in range(nch):
                g = fi * 2 + gi
                bt = btypes[ci][g]
                cur = subblocks[ci][g]
                xr = np.empty(576)
                if bt == 2:
                    for sb in range(32):
                        seg = np.concatenate([mdct_overlap[ci][sb], cur[sb]])
                        xr[sb * 18:(sb + 1) * 18] = _forward_mdct_short(seg)
                        mdct_overlap[ci][sb] = cur[sb]
                    # no alias reduction for short blocks (decoder skips it
                    # too); quantize in Huffman order
                    hxr = xr[short_idx]
                    chosen = _quantize_short_granule(
                        hxr, sfb_short, sfb_long, share)
                else:
                    win = (_WIN_NORMAL, _WIN_START, None, _WIN_STOP)[bt]
                    for sb in range(32):
                        seg = np.concatenate([mdct_overlap[ci][sb], cur[sb]])
                        xr[sb * 18:(sb + 1) * 18] = _forward_mdct_long(seg, win)
                        mdct_overlap[ci][sb] = cur[sb]
                    xr = _antialias_inverse(xr)
                    chosen = _quantize_long_granule(
                        xr, sfb_long, share, window_switching=bt != 0)
                if chosen is None:
                    raise ValueError("granule does not fit the bit budget")
                gg, w, fields = chosen
                fields["global_gain"] = gg
                fields["part2_3_length"] = w.bit_length()
                fields["block_type"] = bt
                if bt != 2:
                    fields["subblock_gain"] = [0, 0, 0]
                granule_bits.append((w, fields))
        # --- side info
        sw = _BitWriter()
        sw.write(0, 9)                        # main_data_begin
        sw.write(0, 5 if nch == 1 else 3)     # private bits
        for _ in range(nch):
            sw.write(0, 4)                    # scfsi: none shared
        for w, fields in granule_bits:
            sw.write(fields["part2_3_length"], 12)
            sw.write(fields["big_values"], 9)
            sw.write(fields["global_gain"], 8)
            sw.write(fields["scalefac_compress"], 4)
            if fields["window_switching"]:
                # start/short/stop: 2+1+10+9 = 22 bits, same total as the
                # non-switching 15+4+3 layout
                sw.write(1, 1)
                sw.write(fields["block_type"], 2)
                sw.write(0, 1)                # mixed_block = 0
                for t in fields["table_select"]:
                    sw.write(t, 5)
                for sbg in fields["subblock_gain"]:
                    sw.write(sbg, 3)
            else:
                sw.write(0, 1)
                for t in fields["table_select"]:
                    sw.write(t, 5)
                sw.write(fields["region0_count"], 4)
                sw.write(fields["region1_count"], 3)
            sw.write(0, 1)                    # preflag
            sw.write(0, 1)                    # scalefac_scale
            sw.write(fields["count1table_select"], 1)
        side = sw.getvalue()
        assert len(side) == side_bytes
        # --- main data: concatenated granule bitstreams, zero-padded
        mw = _BitWriter()
        for w, fields in granule_bits:
            bits = w.bit_length()
            data = w.getvalue()
            for i, byte in enumerate(data):
                take = min(8, bits - i * 8)
                mw.write(byte >> (8 - take), take)
        main = mw.getvalue()
        payload_len = frame_len - 4 - crc_bytes - side_bytes
        if len(main) > payload_len:
            raise AssertionError("main data exceeded frame budget")
        crc = (crc16_mpeg(header[2:4] + side).to_bytes(2, "big")
               if protection else b"")
        out += header + crc + side + main + b"\x00" * (payload_len - len(main))
    return bytes(out)


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

_MP3_STATS_SCHEMA = (
    "media_id BIGINT, sample_rate INT, channels INT, n_frames INT, "
    "n_bytes BIGINT, n_samples BIGINT, energy DOUBLE, peak DOUBLE"
)


def mp3_stats(media, id_col: str = "media_id", payload_col: str = "payload"):
    """Per-clip sample statistics through the REAL Layer III decoder via
    ``mapInPandas`` — the compressed-audio twin of
    ``multimodal.audio_stats`` (which covers PCM WAV). Embarrassingly
    parallel Arrow map pass: per-byte codec work, no shuffle; at 100 TB
    the only scan-shape requirement is that the payload column arrives
    pre-spread across partitions (same pre-spread rule as
    ``x_jpeg_decode``)."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                rate, nch, pcm = decode_mp3(bytes(payload))
                frames = walk_frames(bytes(payload))
                rows.append(
                    {
                        "media_id": mid,
                        "sample_rate": rate,
                        "channels": nch,
                        "n_frames": len(frames),
                        "n_bytes": len(payload),
                        "n_samples": pcm.shape[0],
                        "energy": float((pcm * pcm).sum()),
                        "peak": float(np.abs(pcm).max(initial=0.0)),
                    }
                )
            yield pd.DataFrame(rows)

    return media.select(id_col, payload_col).mapInPandas(run, _MP3_STATS_SCHEMA)


# ---------------------------------------------------------------------------
# ID3v2 metadata (informal standard id3v2.3.0 / id3v2.4.0)
# ---------------------------------------------------------------------------

_ID3_ENCODINGS = {0: "latin-1", 1: "utf-16", 2: "utf-16-be", 3: "utf-8"}


def id3_tags(payload: bytes) -> dict[str, str]:
    """Parse an ID3v2.2/2.3/2.4 tag prefix into {frame_id: text} for the
    declared TEXT frames (T*** incl. TXXX, rendered as ``desc\\x00value``
    collapsed to ``value`` when the description is empty). Non-text
    frames are skipped, not errors; a payload with no ID3v2 tag returns
    ``{"version": "none"}``. Structural faults raise ``ValueError`` —
    the same loud-contract rule as the rest of the codec. The real-file
    gate: the MPEG-2 fixture on this disk carries an ffmpeg-written
    v2.4 UTF-8 ``TSSE`` frame (tests/test_mp3.py)."""
    if payload[:3] != b"ID3":
        return {"version": "none"}
    if len(payload) < 10:
        raise ValueError("ID3v2 header truncated")
    major, flags = payload[3], payload[5]
    if major not in (2, 3, 4):
        raise ValueError(f"unsupported ID3v2.{major}")
    if (payload[6] | payload[7] | payload[8] | payload[9]) & 0x80:
        raise ValueError("ID3v2 size bytes not syncsafe")
    size = (payload[6] << 21) | (payload[7] << 14) | (payload[8] << 7) | payload[9]
    body = payload[10:10 + size]
    if len(body) < size:
        raise ValueError("ID3v2 body truncated")
    if flags & 0x80:  # tag-level unsynchronisation: FF 00 -> FF
        body = body.replace(b"\xff\x00", b"\xff")
    if flags & 0x40:  # extended header: skip it
        if major == 4:
            ext = ((body[0] << 21) | (body[1] << 14) | (body[2] << 7) | body[3])
        else:
            ext = int.from_bytes(body[0:4], "big") + 4
        body = body[ext:]
    out: dict[str, str] = {"version": f"ID3v2.{major}"}
    pos = 0
    id_len, size_len, flag_len = (3, 3, 0) if major == 2 else (4, 4, 2)
    while pos + id_len + size_len + flag_len <= len(body):
        fid = body[pos:pos + id_len]
        if fid == b"\x00" * id_len:
            break  # padding
        if not all(65 <= c <= 90 or 48 <= c <= 57 for c in fid):
            raise ValueError(f"malformed ID3v2 frame id {fid!r} at {pos}")
        raw = body[pos + id_len:pos + id_len + size_len]
        if major == 4:
            if any(b & 0x80 for b in raw):
                raise ValueError("ID3v2.4 frame size not syncsafe")
            fsize = (raw[0] << 21) | (raw[1] << 14) | (raw[2] << 7) | raw[3]
        else:
            fsize = int.from_bytes(raw, "big")
        pos += id_len + size_len + flag_len
        frame = body[pos:pos + fsize]
        if len(frame) < fsize:
            raise ValueError("ID3v2 frame overruns tag")
        pos += fsize
        name = fid.decode("ascii")
        if name.startswith("T") and frame:
            enc = _ID3_ENCODINGS.get(frame[0])
            if enc is None:
                raise ValueError(f"bad ID3v2 text encoding {frame[0]}")
            try:
                text = frame[1:].decode(enc)
            except UnicodeDecodeError as exc:
                raise ValueError(f"undecodable ID3v2 text frame {name}") from exc
            text = text.rstrip("\x00")
            if name == "TXXX" and "\x00" in text:
                desc, _, value = text.partition("\x00")
                text = value if not desc else f"{desc}\x00{value}"
            out[name] = text
    return out


def make_id3v2(frames: dict[str, str], major: int = 4) -> bytes:
    """Build a spec-valid ID3v2.3/2.4 tag carrying UTF-8 (v2.4) or
    UTF-16 (v2.3 — its spec predates the UTF-8 encoding byte) text
    frames — the fixture twin of :func:`id3_tags`, prepended to encoded
    streams worker-side so the driver gate parses REAL tagged files."""
    if major not in (3, 4):
        raise ValueError("ID3v2.3 or .4 only")
    body = bytearray()
    for fid, text in frames.items():
        if len(fid) != 4 or not fid.isupper() or not fid.startswith("T"):
            raise ValueError(f"text frame id required, got {fid!r}")
        if major == 4:
            data = b"\x03" + text.encode("utf-8")
            raw = bytes([(len(data) >> 21) & 0x7F, (len(data) >> 14) & 0x7F,
                         (len(data) >> 7) & 0x7F, len(data) & 0x7F])
        else:
            data = b"\x01" + text.encode("utf-16")  # BOM included
            raw = len(data).to_bytes(4, "big")
        body += fid.encode("ascii") + raw + b"\x00\x00" + data
    size = len(body)
    hdr = b"ID3" + bytes([major, 0, 0,
                          (size >> 21) & 0x7F, (size >> 14) & 0x7F,
                          (size >> 7) & 0x7F, size & 0x7F])
    return hdr + bytes(body)


# ---------------------------------------------------------------------------
# Xing/Info VBR header (de-facto standard, LAME tech FAQ)
# ---------------------------------------------------------------------------

def parse_xing(payload: bytes) -> dict:
    """Probe the first frame for a Xing (VBR) / Info (CBR) header — the
    de-facto stream-geometry record real encoders write into frame 0's
    otherwise-unused main data: total frame/byte counts, a 100-byte
    seek TOC, a quality word, and (when the LAME extension follows) the
    9-char encoder version. Returns ``{"kind": "none"}`` when absent;
    corpus tooling uses this to get duration/seekability for VBR files
    WITHOUT decoding (CBR arithmetic is wrong for them by definition).
    Structural faults raise ``ValueError``."""
    off = skip_id3v2(payload)
    hdr = parse_frame_header(payload, off)
    if off + hdr["frame_len"] > len(payload):
        raise ValueError("first frame truncated")
    probe = off + 4 + (2 if hdr["crc"] else 0) + side_info_size(
        hdr["mpeg1"], hdr["channels"])
    tag = payload[probe:probe + 4]
    if tag not in (b"Xing", b"Info"):
        return {"kind": "none"}
    out: dict = {"kind": tag.decode("ascii")}
    pos = probe + 4
    end = off + hdr["frame_len"]
    if pos + 4 > end:
        raise ValueError("Xing header overruns its frame")
    flags = int.from_bytes(payload[pos:pos + 4], "big")
    pos += 4
    for bit, name, width in ((1, "frames", 4), (2, "bytes", 4)):
        if flags & bit:
            if pos + width > end:
                raise ValueError(f"Xing {name} field overruns its frame")
            out[name] = int.from_bytes(payload[pos:pos + width], "big")
            pos += width
    if flags & 4:
        if pos + 100 > end:
            raise ValueError("Xing TOC overruns its frame")
        out["toc"] = payload[pos:pos + 100]
        pos += 100
    if flags & 8:
        if pos + 4 > end:
            raise ValueError("Xing quality field overruns its frame")
        out["quality"] = int.from_bytes(payload[pos:pos + 4], "big")
        pos += 4
    enc = payload[pos:pos + 9]
    if len(enc) == 9 and all(0x20 <= c < 0x7F for c in enc):
        out["encoder"] = enc.decode("ascii").rstrip()
    return out


def make_xing_frame(
    n_frames: int,
    n_bytes: int,
    sample_rate: int = 48000,
    bitrate_kbps: int = 128,
    kind: bytes = b"Xing",
    encoder: str = "GMSPARK12",
) -> bytes:
    """Spec-valid silent first frame carrying a Xing/Info header with
    frame/byte counts, a linear 100-byte TOC, quality 57, and a 9-char
    encoder string — the fixture twin of :func:`parse_xing` (VBR
    streams prepend this to frames of varying bitrate)."""
    base = encode_mp3(np.zeros(1152), sample_rate, bitrate_kbps)
    frame = bytearray(base[:144 * bitrate_kbps * 1000 // sample_rate])
    probe = 4 + side_info_size(True, 1)
    body = (kind + (15).to_bytes(4, "big")  # frames|bytes|TOC|quality
            + int(n_frames).to_bytes(4, "big")
            + int(n_bytes).to_bytes(4, "big")
            + bytes(min(255, i * 256 // 100) for i in range(100))
            + (57).to_bytes(4, "big"))
    if len(encoder) != 9:
        raise ValueError("encoder string must be 9 chars")
    body += encoder.encode("ascii")
    if probe + len(body) > len(frame):
        raise ValueError("Xing body does not fit the frame")
    frame[probe:probe + len(body)] = body
    return bytes(frame)
