"""Multimodal columns: opaque binary payloads + typed metadata.

Extension surface (BASELINE.json north_star). Design for 100 TB of
image/audio/video:

* payloads are opaque ``BinaryType`` columns (or object-store URIs for
  >64 MB blobs) with a typed metadata struct alongside — schema below.
* decode / feature-extract / resize / frame-sample run as
  ``mapInPandas`` batch iterators: Arrow moves the bytes once per
  batch, the Python worker touches each payload exactly once, and the
  operator composes with any upstream filter (pushed to the scan, so
  decode only runs on surviving rows).
* CONTAINER-HEADER decode is REAL and stdlib-only
  (``parse_media_header`` / ``probe_metadata``): PNG IHDR, WAV RIFF
  chunk walk, GIF logical screen, JPEG SOF scan — true width/height/
  sample_rate/duration without any imaging library.
* PIXEL-level decode is REAL for PNG (stdlib ``zlib`` inflate + full
  scanline unfilter — all five filter types), 24-bit BMP, and binary
  PPM: ``decode_pixels`` returns true pixel bytes, ``encode_png`` is a
  spec-valid encoder, ``pixel_resample`` does a genuine
  nearest-neighbor resize, and ``pixel_stats`` reduces payloads to
  exact integer channel sums (oracle-checkable arithmetic, no float).
* AUDIO sample decode is REAL for PCM WAV (``decode_wav_samples``:
  RIFF chunk walk + 8/16-bit sample recovery; ``audio_stats`` reduces
  to exact integer sums).
* JPEG pixel decode is REAL as of round 11 (operators/jpeg.py:
  Huffman entropy decode + dequant + IDCT + YCbCr→RGB for BOTH the
  baseline and the full progressive process, 4:4:4/4:2:2/4:2:0,
  restart markers, interop-verified on real libjpeg files) —
  ``decode_pixels`` dispatches it, so phash / resize / stats run on
  actual JPEG corpora.
* MP3 sample decode is REAL as of round 12 (operators/mp3.py: full
  MPEG-1 Layer III pipeline + a constrained spec-valid encoder; the
  bundled-Huffman-table boundary and the LSF subset are documented
  there). Only AAC sample decode remains stubbed — requesting it
  raises ``ValueError``; the Spark-side plumbing — schema, batching,
  partitioning — is real and tested either way.
"""

from __future__ import annotations

import hashlib
import struct as _struct
import zlib
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: metadata struct carried next to every payload
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image/audio/video
        T.StructField("format", T.StringType()),      # png/jpeg/wav/mp4…
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
    ]
)

FEATURE_DIM = 8

_FEATURES_SCHEMA = (
    "media_id BIGINT, n_bytes BIGINT, sha256 STRING, features ARRAY<DOUBLE>"
)


def parse_media_header(payload: bytes) -> dict | None:
    """REAL stdlib-only container-header decode → MEDIA_META_SCHEMA dict.

    Formats (magic-number dispatch, header fields per the public specs):

    * PNG — 8-byte signature, then the mandatory first IHDR chunk:
      big-endian width/height at offsets 16/20.
    * WAV — RIFF/WAVE chunk walk: ``fmt `` gives channels/sample_rate/
      byte_rate, ``data`` gives payload size; duration_ms =
      data_size·1000 // byte_rate.
    * GIF — little-endian logical-screen width/height at offset 6.
    * JPEG — marker scan to the first SOF0-SOF15 frame header
      (height/width big-endian at +5/+7), skipping entropy-free
      segments by their declared lengths.
    * MP3 — optional ID3v2 tag skip (syncsafe 28-bit size), then the
      first MPEG audio frame header (11 sync bits): version/layer/
      bitrate/sample-rate fields per the public MPEG-1/2 spec (Layer
      III tables); duration_ms is the CBR estimate
      ``audio_bytes × 8 // bitrate_kbps`` over the post-ID3 payload —
      a header-only probe, deliberately NOT an entropy decoder (VBR
      files without a Xing header will misestimate, as every
      header-probe does).
    * BMP — 'BM' magic; little-endian int32 width/height at offsets
      18/22 (negative height = top-down rows → abs).
    * PPM — 'P6' magic; ASCII width/height tokens (comments skipped).
    * MP4/ISO-BMFF — 'ftyp' at offset 4; top-level box walk (uint32
      sizes, 64-bit largesize and to-EOF size-0 handled) to ``moov``,
      where ``mvhd`` yields duration_ms = duration·1000 // timescale
      (version 0 and 1 layouts) and the first video ``trak``'s
      ``tkhd`` yields presentation width/height (16.16 fixed point;
      audio traks carry 0×0 and are skipped).

    Returns None for unrecognized/truncated payloads (callers keep the
    row with null metadata — the quarantine decision is theirs).
    """
    try:
        return _parse_media_header_inner(payload)
    except (ValueError, _struct.error, IndexError):
        # Corrupt headers must quarantine (None), never raise — one bad
        # payload would otherwise fail the whole Spark task.
        return None


def _parse_media_header_inner(payload: bytes) -> dict | None:
    meta = {
        "media_type": None, "format": None, "width": None,
        "height": None, "duration_ms": None, "sample_rate": None,
    }
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        if len(payload) < 24 or payload[12:16] != b"IHDR":
            return None
        w, h = _struct.unpack(">II", payload[16:24])
        meta.update(media_type="image", format="png", width=w, height=h)
        return meta
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        pos, rate, byte_rate, data_size = 12, None, None, None
        while pos + 8 <= len(payload):
            cid, size = payload[pos : pos + 4], _struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
            body = payload[pos + 8 : pos + 8 + size]
            if cid == b"fmt " and size >= 16:
                _, _, rate, byte_rate = _struct.unpack("<HHII", body[:12])
            elif cid == b"data":
                data_size = size
            pos += 8 + size + (size & 1)  # chunks are word-aligned
        if rate is None:
            return None
        meta.update(media_type="audio", format="wav", sample_rate=rate)
        if byte_rate and data_size is not None:
            meta["duration_ms"] = data_size * 1000 // byte_rate
        return meta
    if len(payload) >= 12 and payload[4:8] == b"ftyp":
        # ISO-BMFF (MP4/MOV): top-level box walk to moov, then mvhd for
        # duration/timescale and the first video trak's tkhd for
        # presentation dims (16.16 fixed point). Box sizes are big-endian
        # uint32; size==1 → 64-bit largesize follows the type; size==0 →
        # box extends to EOF (legal only for the last top-level box).
        def _walk(lo: int, hi: int):
            pos = lo
            while pos + 8 <= hi:
                size = _struct.unpack(">I", payload[pos : pos + 4])[0]
                btype = payload[pos + 4 : pos + 8]
                body = pos + 8
                if size == 1:
                    if pos + 16 > hi:
                        return
                    size = _struct.unpack(">Q", payload[pos + 8 : pos + 16])[0]
                    body = pos + 16
                elif size == 0:
                    size = hi - pos
                if size < 8 or pos + size > hi:
                    return
                yield btype, body, pos + size
                pos += size

        dur_ms = width = height = None
        for btype, body, end in _walk(0, len(payload)):
            if btype != b"moov":
                continue
            for ctype, cbody, cend in _walk(body, end):
                if ctype == b"mvhd" and dur_ms is None:
                    ver = payload[cbody]
                    # v1 layout reads duration from cbody+24..+32, so the
                    # box must hold at least 32 payload bytes — a 28–31
                    # byte malformed v1 mvhd is skipped, not misread
                    if ver == 1 and cend >= cbody + 32:
                        ts = _struct.unpack(">I", payload[cbody + 20 : cbody + 24])[0]
                        dur = _struct.unpack(">Q", payload[cbody + 24 : cbody + 32])[0]
                    elif cend >= cbody + 20:
                        ts = _struct.unpack(">I", payload[cbody + 12 : cbody + 16])[0]
                        dur = _struct.unpack(">I", payload[cbody + 16 : cbody + 20])[0]
                    else:
                        continue
                    if ts:
                        dur_ms = dur * 1000 // ts
                elif ctype == b"trak" and width is None:
                    for ttype, tbody, tend in _walk(cbody, cend):
                        if ttype != b"tkhd":
                            continue
                        ver = payload[tbody]
                        # tkhd fixed layout: version/flags(4) +
                        # times(8 or 16) + track_id(4) + reserved(4) +
                        # duration(4 or 8) = 24 (v0) / 36 (v1) bytes,
                        # then reserved(8), layer(2), alt_group(2),
                        # volume(2), reserved(2), matrix(36) = 52 more,
                        # then width/height as 16.16
                        off = tbody + (24 if ver == 0 else 36) + 52
                        if tend >= off + 8:
                            w_fp, h_fp = _struct.unpack(
                                ">II", payload[off : off + 8]
                            )
                            if w_fp and h_fp:  # audio traks carry 0×0
                                width, height = w_fp >> 16, h_fp >> 16
            break
        if dur_ms is None and width is None:
            return None
        meta.update(
            media_type="video", format="mp4",
            width=width, height=height, duration_ms=dur_ms,
        )
        return meta
    if payload[:3] == b"GIF" and len(payload) >= 10:
        w, h = _struct.unpack("<HH", payload[6:10])
        meta.update(media_type="image", format="gif", width=w, height=h)
        return meta
    if payload[:2] == b"BM" and len(payload) >= 26:
        w, h = _struct.unpack("<ii", payload[18:26])
        meta.update(media_type="image", format="bmp", width=w, height=abs(h))
        return meta
    if payload[:2] == b"P6":
        # ASCII header: P6 <ws> width <ws> height <ws> maxval; '#'
        # comment lines allowed anywhere in the whitespace
        toks: list[int] = []
        pos, n = 2, len(payload)
        while pos < n and len(toks) < 2:
            c = payload[pos]
            if c == 0x23:  # '#' comment → skip to newline
                while pos < n and payload[pos] not in (0x0A, 0x0D):
                    pos += 1
            elif 0x30 <= c <= 0x39:
                # explicit ASCII range: chr(c).isdigit() also accepts
                # Latin-1 superscript digits (0xB2/0xB3/0xB9) whose bytes
                # int() then rejects — a corrupt payload must yield None,
                # not a ValueError that kills the whole Spark task
                start = pos
                while pos < n and 0x30 <= payload[pos] <= 0x39:
                    pos += 1
                toks.append(int(payload[start:pos]))
            else:
                pos += 1
        if len(toks) < 2:
            return None
        meta.update(media_type="image", format="ppm", width=toks[0], height=toks[1])
        return meta
    if payload[:2] == b"\xff\xd8":
        pos = 2
        while pos + 4 <= len(payload):
            if payload[pos] != 0xFF:
                return None
            marker = payload[pos + 1]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if pos + 9 > len(payload):
                    return None
                h, w = _struct.unpack(">HH", payload[pos + 5 : pos + 9])
                meta.update(media_type="image", format="jpeg", width=w, height=h)
                return meta
            pos += 2 + _struct.unpack(">H", payload[pos + 2 : pos + 4])[0]
        return None
    # MP3: optional ID3v2 prefix, then a frame sync (11 set bits). The
    # JPEG branch above consumes FFD8, whose second byte fails the
    # 0xE0 sync mask, so the dispatch order is unambiguous.
    data, id3 = payload, 0
    if payload[:3] == b"ID3" and len(payload) >= 10:
        sz = (
            ((payload[6] & 0x7F) << 21)
            | ((payload[7] & 0x7F) << 14)
            | ((payload[8] & 0x7F) << 7)
            | (payload[9] & 0x7F)
        )
        id3 = 10 + sz
        data = payload[id3:]
    if len(data) >= 4 and data[0] == 0xFF and (data[1] & 0xE0) == 0xE0:
        version = (data[1] >> 3) & 3  # 0=MPEG2.5, 2=MPEG2, 3=MPEG1
        layer = (data[1] >> 1) & 3    # 1=Layer III
        br_idx = (data[2] >> 4) & 15
        sr_idx = (data[2] >> 2) & 3
        if version == 1 or layer != 1 or br_idx in (0, 15) or sr_idx == 3:
            return None  # reserved fields / free-format / non-L3: quarantine
        kbps = _MP3_BITRATES_L3[version][br_idx]
        meta.update(
            media_type="audio",
            format="mp3",
            sample_rate=_MP3_RATES[version][sr_idx],
            duration_ms=(len(payload) - id3) * 8 // kbps,
        )
        return meta
    return None


#: MPEG Layer III bitrate tables (kbps), keyed by header version bits
#: (3 = MPEG1; 2 = MPEG2; 0 = MPEG2.5 shares the MPEG2 table)
_MP3_BITRATES_L3 = {
    3: (None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    2: (None, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}
_MP3_BITRATES_L3[0] = _MP3_BITRATES_L3[2]

#: sample-rate tables keyed by the same version bits
_MP3_RATES = {
    3: (44100, 48000, 32000),
    2: (22050, 24000, 16000),
    0: (11025, 12000, 8000),
}


def _meta_out_schema(id_type: "T.DataType") -> "T.StructType":
    # media_id follows the INPUT id type: BIGINT keys from a media table,
    # STRING paths from binaryFile ingestion — same kernel either way
    return T.StructType(
        [T.StructField("media_id", id_type), T.StructField("meta", MEDIA_META_SCHEMA)]
    )


_META_OUT_SCHEMA = _meta_out_schema(T.LongType())


def probe_metadata(
    media: DataFrame, id_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """Populate the typed metadata struct from the REAL container headers
    via ``mapInPandas`` (same Arrow-batched shape as extract_features).
    Output: (media_id, meta MEDIA_META_SCHEMA); unparseable payloads get
    a null meta."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "meta": pdf[payload_col].map(
                        lambda b: None if b is None else parse_media_header(bytes(b))
                    ),
                }
            )

    id_type = media.schema[id_col].dataType
    return media.select(id_col, payload_col).mapInPandas(
        run, _meta_out_schema(id_type)
    )


def make_png(width: int, height: int) -> bytes:
    """Minimal REAL PNG header bytes (signature + IHDR) — fixture builder
    for header-level decode paths; no pixel data, so not renderable."""
    ihdr = _struct.pack(">II", width, height) + b"\x08\x06\x00\x00\x00"
    return (
        b"\x89PNG\r\n\x1a\n"
        + _struct.pack(">I", 13) + b"IHDR" + ihdr + b"\x00\x00\x00\x00"
    )


def make_jpeg(width: int, height: int) -> bytes:
    """Minimal REAL JPEG header bytes (SOI + JFIF APP0 + SOF0) — fixture
    for the marker-scan probe; no entropy data, so not renderable."""
    app0 = b"JFIF\x00\x01\x01\x00" + _struct.pack(">HH", 1, 1) + b"\x00\x00"
    sof0 = (
        b"\x08"
        + _struct.pack(">HH", height, width)
        + b"\x03"
        + b"\x01\x22\x00\x02\x11\x01\x03\x11\x01"
    )
    return (
        b"\xff\xd8"
        + b"\xff\xe0" + _struct.pack(">H", 2 + len(app0)) + app0
        + b"\xff\xc0" + _struct.pack(">H", 2 + len(sof0)) + sof0
    )


def make_mp3(
    bitrate_kbps: int = 128,
    sample_rate: int = 44100,
    n_frames: int = 4,
    id3_size: int = 0,
) -> bytes:
    """Spec-valid CBR MPEG-1 Layer III byte stream (silent frames, zero
    main data) with an optional ID3v2 tag — fixture for the MP3 header
    probe. Frame length follows the spec: 144000·kbps // sample_rate."""
    br_idx = _MP3_BITRATES_L3[3].index(bitrate_kbps)
    sr_idx = _MP3_RATES[3].index(sample_rate)
    frame_len = 144000 * bitrate_kbps // sample_rate
    # 0xFB = sync(3) | version MPEG1(11) | layer III(01) | no CRC(1)
    hdr = bytes([0xFF, 0xFB, (br_idx << 4) | (sr_idx << 2), 0x00])
    frame = hdr + b"\x00" * (frame_len - 4)
    out = b""
    if id3_size:
        out = (
            b"ID3\x04\x00\x00"
            + bytes(
                [
                    (id3_size >> 21) & 0x7F,
                    (id3_size >> 14) & 0x7F,
                    (id3_size >> 7) & 0x7F,
                    id3_size & 0x7F,
                ]
            )
            + b"\x00" * id3_size
        )
    return out + frame * n_frames


def _bmff_box(btype: bytes, body: bytes) -> bytes:
    return _struct.pack(">I", 8 + len(body)) + btype + body


def make_mp4(
    width: int,
    height: int,
    duration: int,
    timescale: int = 600,
    audio_trak_first: bool = False,
    wide_mvhd: bool = False,
) -> bytes:
    """Minimal spec-valid ISO-BMFF (MP4) byte stream for the header
    probe: ``ftyp`` + ``moov`` carrying a version-0 (or, with
    ``wide_mvhd``, version-1 64-bit) ``mvhd`` and one video ``trak``
    whose ``tkhd`` holds 16.16 fixed-point presentation dims. With
    ``audio_trak_first`` a 0×0 (audio-shaped) trak precedes the video
    one, exercising the probe's skip rule. No mdat — header-only, like
    ``make_png``/``make_jpeg``."""
    ftyp = _bmff_box(b"ftyp", b"isom" + _struct.pack(">I", 512) + b"isommp41")
    if wide_mvhd:
        mvhd_body = (
            b"\x01\x00\x00\x00"                      # version 1
            + _struct.pack(">QQIQ", 0, 0, timescale, duration)
            + _struct.pack(">I", 0x00010000) + _struct.pack(">H", 0x0100)
            + b"\x00" * 10 + _MP4_IDENTITY_MATRIX + b"\x00" * 24
            + _struct.pack(">I", 2)
        )
    else:
        mvhd_body = (
            b"\x00\x00\x00\x00"                      # version 0
            + _struct.pack(">IIII", 0, 0, timescale, duration)
            + _struct.pack(">I", 0x00010000) + _struct.pack(">H", 0x0100)
            + b"\x00" * 10 + _MP4_IDENTITY_MATRIX + b"\x00" * 24
            + _struct.pack(">I", 2)
        )

    def tkhd(track_id: int, w: int, h: int) -> bytes:
        body = (
            b"\x00\x00\x00\x07"                      # version 0, enabled
            + _struct.pack(">IIII", 0, 0, track_id, 0)
            + _struct.pack(">I", duration)
            + b"\x00" * 8 + _struct.pack(">HHHH", 0, 0, 0, 0)
            + _MP4_IDENTITY_MATRIX
            + _struct.pack(">II", w << 16, h << 16)
        )
        return _bmff_box(b"trak", _bmff_box(b"tkhd", body))

    traks = b""
    if audio_trak_first:
        traks += tkhd(1, 0, 0)
    traks += tkhd(2 if audio_trak_first else 1, width, height)
    return ftyp + _bmff_box(b"moov", _bmff_box(b"mvhd", mvhd_body) + traks)


#: unity transform matrix shared by mvhd/tkhd (a=d=1.0 in 16.16, w=1.0
#: in 2.30 — the spec's default)
_MP4_IDENTITY_MATRIX = _struct.pack(
    ">9I", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000
)


def make_wav(sample_rate: int, n_samples: int, channels: int = 1, bits: int = 16) -> bytes:
    """Complete, spec-valid little WAV file (silence) built with struct —
    a REAL audio payload for the header decoder and any future codec."""
    byte_rate = sample_rate * channels * bits // 8
    block = channels * bits // 8
    data = b"\x00" * (n_samples * block)
    fmt = _struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate, block, bits)
    body = b"WAVE" + b"fmt " + _struct.pack("<I", len(fmt)) + fmt
    body += b"data" + _struct.pack("<I", len(data)) + data
    return b"RIFF" + _struct.pack("<I", len(body)) + body


# --------------------------------------------------------------------------
# REAL pixel codec — stdlib only (zlib inflate + PNG scanline unfilter)
# --------------------------------------------------------------------------

_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # color type -> samples/pixel (3 = palette index)


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        _struct.pack(">I", len(body))
        + tag
        + body
        + _struct.pack(">I", zlib.crc32(tag + body))
    )


def encode_png(width: int, height: int, pixels: bytes, channels: int = 3) -> bytes:
    """REAL spec-valid PNG encoder (8-bit gray/gray+alpha/RGB/RGBA,
    filter 0 per scanline, one zlib IDAT). ``pixels`` is row-major
    interleaved bytes of length width·height·channels. Renderable by any
    viewer; round-trips through ``decode_pixels``."""
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError(f"need {stride * height} pixel bytes, got {len(pixels)}")
    raw = bytearray()
    for y in range(height):
        raw.append(0)  # filter type 0 = None
        raw += pixels[y * stride : (y + 1) * stride]
    ihdr = _struct.pack(">IIBBBBB", width, height, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


#: Adam7 pass grid: (x_start, y_start, x_step, y_step) per pass
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def encode_png_palette(width: int, height: int, pixels: bytes) -> bytes:
    """REAL indexed-color PNG (color type 3): palette built from the
    image's distinct colors (≤256, else ValueError), PLTE chunk + 8-bit
    index scanlines. Round-trips exactly through ``decode_pixels``."""
    if len(pixels) != width * height * 3:
        raise ValueError(f"need {width * height * 3} RGB bytes, got {len(pixels)}")
    colors: dict[bytes, int] = {}
    idx = bytearray()
    for i in range(0, len(pixels), 3):
        c = pixels[i : i + 3]
        j = colors.get(c)
        if j is None:
            j = colors[c] = len(colors)
        idx.append(j)
    if len(colors) > 256:
        raise ValueError(f"palette PNG needs ≤256 distinct colors, got {len(colors)}")
    plte = b"".join(colors)
    raw = bytearray()
    for y in range(height):
        raw.append(0)
        raw += idx[y * width : (y + 1) * width]
    ihdr = _struct.pack(">IIBBBBB", width, height, 8, 3, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"PLTE", plte)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


def encode_png_interlaced(
    width: int, height: int, pixels: bytes, channels: int = 3
) -> bytes:
    """REAL Adam7-interlaced PNG: the seven pass sub-images are
    extracted on the spec's grid, each scanline filtered type-0, all
    passes deflated into one IDAT. Round-trips through
    ``decode_pixels`` (which deinterlaces)."""
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError(f"need {stride * height} pixel bytes, got {len(pixels)}")
    raw = bytearray()
    for x0, y0, xs, ys in _ADAM7:
        pw = -(-(width - x0) // xs) if width > x0 else 0
        ph = -(-(height - y0) // ys) if height > y0 else 0
        if pw <= 0 or ph <= 0:
            continue
        for py in range(ph):
            raw.append(0)
            y = y0 + py * ys
            for px_i in range(pw):
                x = x0 + px_i * xs
                o = y * stride + x * channels
                raw += pixels[o : o + channels]
    ihdr = _struct.pack(">IIBBBBB", width, height, 8, ctype, 0, 0, 1)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


def _png_deinterlace(raw: bytes, width: int, height: int, channels: int) -> bytes:
    """Adam7 reassembly: unfilter each pass sub-image independently
    (filters reference neighbors WITHIN the pass, per the spec), then
    scatter its pixels onto the full-resolution grid."""
    # integer-only size audit BEFORE any allocation: a fuzzed IHDR can
    # claim absurd dimensions, and the output buffer must be bounded by
    # the actual inflated byte count, never by header claims
    expected = 0
    for x0, y0, xs, ys in _ADAM7:
        pw = -(-(width - x0) // xs) if width > x0 else 0
        ph = -(-(height - y0) // ys) if height > y0 else 0
        if pw > 0 and ph > 0:
            expected += ph * (1 + pw * channels)
    if expected != len(raw):
        raise ValueError("interlaced PNG pixel data size mismatch")
    out = bytearray(width * height * channels)
    pos = 0
    for x0, y0, xs, ys in _ADAM7:
        pw = -(-(width - x0) // xs) if width > x0 else 0
        ph = -(-(height - y0) // ys) if height > y0 else 0
        if pw <= 0 or ph <= 0:
            continue
        n = ph * (1 + pw * channels)
        sub = _png_unfilter(raw[pos : pos + n], pw, ph, channels)
        pos += n
        for py in range(ph):
            y = y0 + py * ys
            for px_i in range(pw):
                x = x0 + px_i * xs
                so = (py * pw + px_i) * channels
                oo = (y * width + x) * channels
                out[oo : oo + channels] = sub[so : so + channels]
    if pos != len(raw):
        raise ValueError("interlaced PNG pixel data size mismatch")
    return bytes(out)


def encode_bmp(width: int, height: int, pixels: bytes) -> bytes:
    """REAL spec-valid 24-bit uncompressed BMP (BITMAPINFOHEADER,
    bottom-up rows, BGR byte order, 4-byte row padding). ``pixels`` is
    row-major TOP-DOWN interleaved RGB; round-trips through
    ``decode_pixels``."""
    if len(pixels) != width * height * 3:
        raise ValueError(f"need {width * height * 3} RGB bytes, got {len(pixels)}")
    stride = (width * 3 + 3) & ~3
    pad = b"\x00" * (stride - width * 3)
    body = bytearray()
    for y in range(height - 1, -1, -1):  # bottom-up
        row = pixels[y * width * 3 : (y + 1) * width * 3]
        for x in range(width):
            r, g, b = row[3 * x : 3 * x + 3]
            body += bytes((b, g, r))
        body += pad
    off = 14 + 40
    hdr = b"BM" + _struct.pack("<IHHI", off + len(body), 0, 0, off)
    dib = _struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return hdr + dib + bytes(body)


def encode_ppm(width: int, height: int, pixels: bytes) -> bytes:
    """Binary PPM (``P6``, maxval 255). ``pixels`` is row-major RGB;
    round-trips through ``decode_pixels``."""
    if len(pixels) != width * height * 3:
        raise ValueError(f"need {width * height * 3} RGB bytes, got {len(pixels)}")
    return b"P6\n%d %d\n255\n" % (width, height) + pixels


def encode_gif(width: int, height: int, pixels: bytes) -> bytes:
    """Spec-valid GIF89a with a REAL LZW-compressed image stream —
    single frame, global color table built from the image's distinct
    colors (≤256, else ValueError: GIF is palette-based by design).
    ``pixels`` is row-major RGB; round-trips exactly through
    ``decode_pixels`` (palette formats are lossless)."""
    if len(pixels) != width * height * 3:
        raise ValueError(f"need {width * height * 3} RGB bytes, got {len(pixels)}")
    colors: dict[bytes, int] = {}
    idx = bytearray()
    for i in range(0, len(pixels), 3):
        c = pixels[i : i + 3]
        j = colors.get(c)
        if j is None:
            j = colors[c] = len(colors)
        idx.append(j)
    n = len(colors)
    if n > 256:
        raise ValueError(f"GIF needs ≤256 distinct colors, got {n}")
    depth = max(1, (max(n - 1, 1)).bit_length())  # palette size exponent
    table = bytearray()
    for c in colors:  # insertion order == index order
        table += c
    table += b"\x00" * ((1 << depth) * 3 - len(table))

    # --- LZW encode (variable width, clear/eoi codes per the spec) ---
    min_code = max(2, depth)
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    out_codes: list[tuple[int, int]] = []  # (code, width)
    width_bits = min_code + 1
    dict_next = eoi + 1
    strings: dict[bytes, int] = {bytes([i]): i for i in range(1 << min_code)}
    out_codes.append((clear, width_bits))
    w = b""
    for b in idx:
        wk = w + bytes([b])
        if wk in strings:
            w = wk
            continue
        out_codes.append((strings[w], width_bits))
        strings[wk] = dict_next
        dict_next += 1
        if dict_next > (1 << width_bits) and width_bits < 12:
            width_bits += 1
        elif dict_next >= 4096:  # table full: reset per spec
            out_codes.append((clear, width_bits))
            strings = {bytes([i]): i for i in range(1 << min_code)}
            dict_next = eoi + 1
            width_bits = min_code + 1
        w = bytes([b])
    if w:
        out_codes.append((strings[w], width_bits))
    out_codes.append((eoi, width_bits))
    # pack LSB-first
    acc = nbits = 0
    stream = bytearray()
    for code, wd in out_codes:
        acc |= code << nbits
        nbits += wd
        while nbits >= 8:
            stream.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        stream.append(acc & 0xFF)

    out = bytearray(b"GIF89a")
    out += _struct.pack("<HH", width, height)
    out += bytes([0x80 | ((depth - 1) << 4) | (depth - 1), 0, 0])  # GCT flag+sizes
    out += table
    out += b"\x2c" + _struct.pack("<HHHH", 0, 0, width, height) + b"\x00"
    out += bytes([min_code])
    for i in range(0, len(stream), 255):
        chunk = stream[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


def _decode_gif(payload: bytes) -> tuple[int, int, int, bytes]:
    """REAL GIF decode: logical-screen/global-color-table parse, first
    image descriptor (local table and interlace honored), full
    variable-width LZW decompression → row-major RGB. Animated GIFs
    yield their FIRST frame (the training-data convention). Raises
    ValueError on corrupt streams."""
    if payload[:3] != b"GIF" or len(payload) < 13:
        raise ValueError("not a GIF stream")
    sw, sh = _struct.unpack("<HH", payload[6:10])
    flags = payload[10]
    pos = 13
    gct = None
    if flags & 0x80:
        gsz = 2 << (flags & 7)
        gct = payload[pos : pos + gsz * 3]
        pos += gsz * 3
    while pos < len(payload):
        b0 = payload[pos]
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < len(payload) and payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b0 != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b0:02x}")
        left, top, w, h = _struct.unpack("<HHHH", payload[pos + 1 : pos + 9])
        iflags = payload[pos + 9]
        pos += 10
        table = gct
        if iflags & 0x80:
            lsz = 2 << (iflags & 7)
            table = payload[pos : pos + lsz * 3]
            pos += lsz * 3
        if table is None:
            raise ValueError("GIF image with no color table")
        interlaced = bool(iflags & 0x40)
        min_code = payload[pos]
        pos += 1
        data = bytearray()
        while pos < len(payload) and payload[pos]:
            ln = payload[pos]
            data += payload[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1

        # --- LZW decode ---
        clear, eoi = 1 << min_code, (1 << min_code) + 1
        width_bits = min_code + 1
        dict_entries: list[bytes] = [bytes([i]) for i in range(1 << min_code)]
        dict_entries += [b"", b""]  # clear/eoi placeholders
        acc = nbits = di = 0
        prev: bytes | None = None
        out = bytearray()
        n_codes = len(dict_entries)
        while True:
            while nbits < width_bits:
                if di >= len(data):
                    raise ValueError("GIF LZW stream truncated")
                acc |= data[di] << nbits
                di += 1
                nbits += 8
            code = acc & ((1 << width_bits) - 1)
            acc >>= width_bits
            nbits -= width_bits
            if code == clear:
                dict_entries = [bytes([i]) for i in range(1 << min_code)] + [b"", b""]
                n_codes = len(dict_entries)
                width_bits = min_code + 1
                prev = None
                continue
            if code == eoi:
                break
            if prev is None:
                entry = dict_entries[code]
            elif code < n_codes:
                entry = dict_entries[code]
                dict_entries.append(prev + entry[:1])
                n_codes += 1
            elif code == n_codes:  # the KwKwK case
                entry = prev + prev[:1]
                dict_entries.append(entry)
                n_codes += 1
            else:
                raise ValueError("GIF LZW code out of range")
            out += entry
            prev = entry
            if n_codes == (1 << width_bits) and width_bits < 12:
                width_bits += 1
        if len(out) < w * h:
            raise ValueError("GIF pixel data short")

        if interlaced:
            rows = bytearray(w * h)
            src = 0
            for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
                for y in range(start, h, step):
                    rows[y * w : (y + 1) * w] = out[src : src + w]
                    src += w
            out = rows
        rgb = bytearray(w * h * 3)
        for i in range(w * h):
            ci = out[i] * 3
            rgb[3 * i : 3 * i + 3] = table[ci : ci + 3]
        return w, h, 3, bytes(rgb)
    raise ValueError("GIF has no image descriptor")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _png_unfilter(raw: bytes, width: int, height: int, channels: int) -> bytes:
    """Reverse PNG scanline filtering (spec §9 Filtering): filter byte
    per row, types 0 None / 1 Sub / 2 Up / 3 Average / 4 Paeth, with
    ``bpp``-byte pixel stride and a zero row above the first."""
    bpp = channels  # 8-bit depth -> bytes per pixel == channels
    stride = width * channels
    out = bytearray(height * stride)
    prev = bytes(stride)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        row = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        if ftype == 1:  # Sub
            for i in range(bpp, stride):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = row[i - bpp] if i >= bpp else 0
                up_left = prev[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + _paeth(left, prev[i], up_left)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y * stride : (y + 1) * stride] = row
        prev = row
    return bytes(out)


def decode_pixels(payload: bytes) -> tuple[int, int, int, bytes]:
    """REAL pixel decode → (width, height, channels, row-major pixel
    bytes). Stdlib only. Formats:

    * PNG — 8-bit depth, color types 0/2/3/4/6 (palette expanded via
      PLTE), Adam7-interlaced or not: IDAT chunks concatenated,
      zlib-inflated, scanlines unfiltered (all five filter types per
      the spec; interlaced images unfilter each of the seven
      sub-images independently, then deinterlace).
    * BMP — uncompressed 24-bit BI_RGB: bottom-up rows, 4-byte row
      padding stripped, BGR→RGB swapped.
    * PPM — binary ``P6`` with maxval 255.
    * JPEG — REAL entropy decode, BOTH processes (operators/jpeg.py:
      Huffman + dequant + IDCT + YCbCr→RGB, 4:4:4/4:2:2/4:2:0, restart
      markers; progressive spectral selection + successive
      approximation per T.81 §G, interop-verified against real libjpeg
      files); grayscale decodes to replicated RGB. Arithmetic-coded /
      lossless / hierarchical streams raise ``ValueError``.
    * GIF — REAL variable-width LZW decompression (global/local color
      tables, interlace undone, extension blocks skipped; animated
      GIFs yield their first frame), palette-expanded to RGB.

    Raises ``ValueError`` — and ONLY ValueError — on unsupported or
    corrupt payloads: real web corpora are full of truncated and
    mangled images, so the error contract is part of the API
    (fuzz-tested). Parser internals that surface as struct/zlib/index
    errors on adversarial bytes are normalized here; callers decide
    quarantine (``pixel_stats(quarantine=True)`` keeps the row with
    null stats).
    """
    try:
        return _decode_pixels_inner(payload)
    except ValueError:
        raise
    except (_struct.error, zlib.error, IndexError, KeyError,
            OverflowError) as e:
        raise ValueError(f"corrupt image payload: {e}") from e


def _decode_pixels_inner(payload: bytes) -> tuple[int, int, int, bytes]:
    if payload[:2] == b"\xff\xd8":
        from gramene_mongodb_spark.operators.jpeg import decode_jpeg_baseline

        return decode_jpeg_baseline(payload)
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        pos, width = 8, None
        height = channels = 0
        ctype = ilace = 0
        plte = None
        idat = bytearray()
        while pos + 8 <= len(payload):
            size = _struct.unpack(">I", payload[pos : pos + 4])[0]
            tag = payload[pos + 4 : pos + 8]
            body = payload[pos + 8 : pos + 8 + size]
            if tag == b"IHDR":
                width, height, depth, ctype, comp, filt, ilace = _struct.unpack(
                    ">IIBBBBB", body
                )
                if depth != 8 or ctype not in _PNG_CHANNELS or ilace > 1:
                    raise ValueError(
                        f"unsupported PNG (depth={depth} ctype={ctype} interlace={ilace})"
                    )
                channels = _PNG_CHANNELS[ctype]
            elif tag == b"PLTE":
                plte = body
            elif tag == b"IDAT":
                idat += body
            elif tag == b"IEND":
                break
            pos += 12 + size  # len + tag + body + crc
        if width is None or not idat:
            raise ValueError("PNG missing IHDR or IDAT")
        if ctype == 3 and plte is None:
            raise ValueError("palette PNG missing PLTE")
        raw = zlib.decompress(bytes(idat))
        if ilace:
            px = _png_deinterlace(raw, width, height, channels)
        else:
            if len(raw) != height * (1 + width * channels):
                raise ValueError("PNG pixel data size mismatch")
            px = _png_unfilter(raw, width, height, channels)
        if ctype == 3:  # palette indices → RGB
            out = bytearray(width * height * 3)
            for i, v in enumerate(px):
                ci = v * 3
                if ci + 3 > len(plte):
                    raise ValueError("PNG palette index out of range")
                out[3 * i : 3 * i + 3] = plte[ci : ci + 3]
            return width, height, 3, bytes(out)
        return width, height, channels, px
    if payload[:2] == b"BM":
        off, hdr_size = _struct.unpack("<I", payload[10:14])[0], _struct.unpack(
            "<I", payload[14:18]
        )[0]
        if hdr_size < 40:
            raise ValueError("unsupported BMP header")
        width, height = _struct.unpack("<ii", payload[18:26])
        bits, comp = _struct.unpack("<HI", payload[28:34])
        if bits != 24 or comp != 0:
            raise ValueError(f"unsupported BMP (bits={bits} compression={comp})")
        flip = height > 0
        height = abs(height)
        if width <= 0 or height <= 0:
            raise ValueError("BMP with non-positive dimensions")
        stride = (width * 3 + 3) & ~3
        # size audit BEFORE any work: bounds the decode by the actual
        # payload bytes, so fuzzed header dimensions can neither
        # allocate nor loop beyond the input (and it vectorizes —
        # the old per-pixel Python loop was both slow and unbounded)
        if len(payload) < off + stride * height:
            raise ValueError("BMP pixel data truncated")
        import numpy as np

        rows = np.frombuffer(
            payload, np.uint8, count=stride * height, offset=off
        ).reshape(height, stride)[:, : width * 3].reshape(height, width, 3)
        if flip:
            rows = rows[::-1]
        return width, height, 3, np.ascontiguousarray(rows[..., ::-1]).tobytes()
    if payload[:2] == b"P6":
        fields: list[int] = []
        pos = 2
        while len(fields) < 3:
            while pos < len(payload) and payload[pos : pos + 1].isspace():
                pos += 1
            if payload[pos : pos + 1] == b"#":  # comment line
                while pos < len(payload) and payload[pos] != 0x0A:
                    pos += 1
                continue
            start = pos
            while pos < len(payload) and not payload[pos : pos + 1].isspace():
                pos += 1
            fields.append(int(payload[start:pos]))
        pos += 1  # single whitespace after maxval
        width, height, maxval = fields
        if maxval != 255:
            raise ValueError(f"unsupported PPM maxval {maxval}")
        n = width * height * 3
        if len(payload) < pos + n:
            raise ValueError("PPM pixel data truncated")
        return width, height, 3, payload[pos : pos + n]
    if payload[:3] == b"GIF":
        return _decode_gif(payload)
    raise ValueError("unrecognized pixel format (PNG/BMP/PPM/JPEG/GIF supported)")


def nearest_resize(
    pixels: bytes, width: int, height: int, channels: int, new_w: int, new_h: int
) -> bytes:
    """Nearest-neighbor resample on raw pixel bytes: source index
    ``(dst·src_dim) // dst_dim`` per axis — pure integer arithmetic, so
    an oracle can replay the exact sampling grid."""
    out = bytearray(new_w * new_h * channels)
    for y in range(new_h):
        sy = (y * height) // new_h
        row = pixels[sy * width * channels : (sy + 1) * width * channels]
        base = y * new_w * channels
        for x in range(new_w):
            sx = (x * width) // new_w
            out[base + x * channels : base + (x + 1) * channels] = row[
                sx * channels : (sx + 1) * channels
            ]
    return bytes(out)


def pixel_resample(payload: bytes, width: int, height: int) -> bytes:
    """REAL image resize: decode true pixels (PNG/BMP/PPM), nearest-
    neighbor resample, re-encode as PNG. The replacement for
    ``fake_resample`` wherever payloads carry actual pixel data."""
    w, h, c, px = decode_pixels(payload)
    return encode_png(width, height, nearest_resize(px, w, h, c, width, height), c)


_PIXEL_STATS_SCHEMA = (
    "media_id BIGINT, width INT, height INT, channels INT, "
    "sum_r BIGINT, sum_g BIGINT, sum_b BIGINT"
)


def pixel_stats(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    quarantine: bool = False,
) -> DataFrame:
    """Exact integer per-channel pixel sums via ``mapInPandas`` — the
    oracle-checkable reduction of true pixel content (sums are integers,
    so there is no float surface; a single wrong pixel anywhere in
    decode → resample → encode breaks the hash). Grayscale payloads
    report their sum as ``sum_r`` with null g/b.

    ``quarantine=True`` is the REAL-CORPUS mode: a corrupt payload
    yields its row with all-null stats instead of failing the task
    (one mangled crawl image must not kill a 100 TB job). The default
    stays strict — synthetic fixture corpora SHOULD fail loudly on any
    decode regression."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    w, h, c, px = decode_pixels(bytes(payload))
                except ValueError:
                    if not quarantine:
                        raise
                    rows.append(
                        {
                            "media_id": mid, "width": None, "height": None,
                            "channels": None, "sum_r": None, "sum_g": None,
                            "sum_b": None,
                        }
                    )
                    continue
                sums = (
                    np.frombuffer(px, dtype=np.uint8)
                    .reshape(w * h, c)
                    .sum(axis=0, dtype=np.int64)
                )
                rows.append(
                    {
                        "media_id": mid,
                        "width": w,
                        "height": h,
                        "channels": c,
                        "sum_r": int(sums[0]),
                        "sum_g": int(sums[1]) if c >= 3 else None,
                        "sum_b": int(sums[2]) if c >= 3 else None,
                    }
                )
            yield pd.DataFrame(rows)

    return media.select(id_col, payload_col).mapInPandas(run, _PIXEL_STATS_SCHEMA)


# --------------------------------------------------------------------------
# REAL PCM audio decode — stdlib struct only
# --------------------------------------------------------------------------


def make_wav_ramp(sample_rate: int, n_samples: int, seed: int) -> bytes:
    """Spec-valid 16-bit mono PCM WAV whose samples are the deterministic
    integer ramp ``((i·7 + seed) mod 65536) − 32768`` — real, non-silent
    audio content an oracle can replay arithmetically."""
    import numpy as np

    i = np.arange(n_samples, dtype=np.int64)
    samples = ((i * 7 + seed) % 65536 - 32768).astype("<i2")
    data = samples.tobytes()
    byte_rate = sample_rate * 2
    fmt = _struct.pack("<HHIIHH", 1, 1, sample_rate, byte_rate, 2, 16)
    body = b"WAVE" + b"fmt " + _struct.pack("<I", len(fmt)) + fmt
    body += b"data" + _struct.pack("<I", len(data)) + data
    return b"RIFF" + _struct.pack("<I", len(body)) + body


def decode_wav_samples(payload: bytes) -> tuple[int, int, "object"]:
    """REAL PCM decode: RIFF/WAVE chunk walk (same walk as
    ``parse_media_header``) → (sample_rate, channels, int numpy array of
    interleaved samples). Supports PCM 16-bit (little-endian signed) and
    8-bit (unsigned, returned as stored). Compressed payloads raise
    ``ValueError`` here — MP3 decodes for real via
    ``operators.mp3.decode_mp3`` (round 12); AAC stays unimplemented."""
    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, channels, bits, data = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = _struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt " and size >= 16:
            codec, channels, rate, _, _, bits = _struct.unpack("<HHIIHH", body[:16])
            if codec != 1:
                raise ValueError(f"unsupported WAV codec {codec} (PCM only)")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if rate is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    if bits == 16:
        samples = np.frombuffer(data[: len(data) & ~1], dtype="<i2")
    elif bits == 8:
        samples = np.frombuffer(data, dtype=np.uint8)
    else:
        raise ValueError(f"unsupported PCM width {bits}")
    return rate, channels, samples


_AUDIO_STATS_SCHEMA = (
    "media_id BIGINT, sample_rate INT, n_samples BIGINT, "
    "sum_samples BIGINT, min_sample INT, max_sample INT"
)


def audio_stats(
    media: DataFrame, id_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """Exact integer sample statistics through the REAL PCM decoder via
    ``mapInPandas`` — the audio twin of ``pixel_stats`` (integer sums,
    no float surface; one wrong sample breaks the oracle hash)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                rate, _, samples = decode_wav_samples(bytes(payload))
                rows.append(
                    {
                        "media_id": mid,
                        "sample_rate": rate,
                        "n_samples": len(samples),
                        "sum_samples": int(samples.sum()),
                        "min_sample": int(samples.min()) if len(samples) else None,
                        "max_sample": int(samples.max()) if len(samples) else None,
                    }
                )
            yield pd.DataFrame(rows)

    return media.select(id_col, payload_col).mapInPandas(run, _AUDIO_STATS_SCHEMA)


def encode_wav(sample_rate: int, samples: "object") -> bytes:
    """Spec-valid 16-bit mono PCM WAV from an int16 numpy array —
    the content-carrying counterpart of :func:`make_wav` (silence) and
    :func:`make_wav_ramp` (fixed ramp); round-trips through
    :func:`decode_wav_samples`."""
    data = samples.astype("<i2").tobytes()
    fmt = _struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = b"WAVE" + b"fmt " + _struct.pack("<I", len(fmt)) + fmt
    body += b"data" + _struct.pack("<I", len(data)) + data
    return b"RIFF" + _struct.pack("<I", len(body)) + body


def decode_audio_pcm(payload: bytes) -> tuple[int, int, "object"]:
    """Unified integer-PCM decode for the audio-analysis operators:
    RIFF/WAVE routes to :func:`decode_wav_samples` (samples as stored);
    MPEG Layer III (ID3v2-tagged or bare frame sync) routes to the real
    decoder (``operators.mp3.decode_mp3``) with float PCM quantized to
    16-bit as ``floor(x·32768 + 0.5)`` clamped — the same HALF_UP rule
    the other codecs in this module pin. Returns (sample_rate, channels,
    int numpy array, channel-interleaved). Anything else raises
    ``ValueError`` (AAC etc. — see operators/mp3.py's boundary notes)."""
    import numpy as np

    if payload[:4] == b"RIFF":
        return decode_wav_samples(payload)
    if payload[:3] == b"ID3" or (
        len(payload) >= 2 and payload[0] == 0xFF and (payload[1] & 0xE0) == 0xE0
    ):
        from gramene_mongodb_spark.operators import mp3 as _mp3

        rate, nch, pcm = _mp3.decode_mp3(payload)
        ints = np.floor(pcm * 32768.0 + 0.5).clip(-32768, 32767).astype(np.int64)
        return rate, nch, ints.reshape(-1)
    raise ValueError("unsupported audio container (PCM WAV and MP3 decode)")


def frame_energy(
    media: DataFrame,
    frame_len: int = 160,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Per-frame integer energy through the REAL decoders (PCM WAV and,
    since round 12, MP3 via :func:`decode_audio_pcm` — closing the
    "VAD/energy stats require WAV" gap): one Arrow map pass decodes each
    clip, folds the sample stream into fixed ``frame_len`` windows
    (10 ms at 16 kHz with the default) and emits mean absolute amplitude
    per frame as exact integer floor division — a trailing partial frame
    is dropped. Output: (media_id, frame_idx, energy). The payload is
    touched exactly once; everything downstream is column math on a
    frames table ~frame_len× smaller than the audio."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            fs: list[int] = []
            es: list[int] = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                _, _, samples = decode_audio_pcm(bytes(payload))
                a = np.abs(samples.astype(np.int64))
                n = len(a) // frame_len
                if not n:
                    continue
                per = a[: n * frame_len].reshape(n, frame_len).sum(axis=1) // frame_len
                ids.extend([int(mid)] * n)
                fs.extend(range(n))
                es.extend(int(v) for v in per)
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": fs, "energy": es},
                columns=["media_id", "frame_idx", "energy"],
            )

    return media.select(id_col, payload_col).mapInPandas(
        run, "media_id BIGINT, frame_idx BIGINT, energy BIGINT"
    )


def audio_segments(
    media: DataFrame,
    threshold: int = 100,
    frame_len: int = 160,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Energy-based audio segmentation (the classic VAD split, the audio
    twin of :func:`shot_boundaries`): per-frame energies from ONE Arrow
    decode pass (:func:`frame_energy`), frames at or above ``threshold``
    are active, and consecutive active frames merge gaps-and-islands
    style — a new segment opens wherever the active frame index is not
    the predecessor's + 1 (lag + running sum, all JVM-side). Output one
    row per segment: (media_id, segment_id ascending from 1,
    start_frame, end_frame, n_frames, peak_energy).

    Scale: decode is an embarrassingly parallel map pass (spread thin
    inputs first — see SCALE.md's x_video_shots row); the only shuffle
    is the per-media window over the already-reduced frames table, keyed
    on the media id with bounded per-key rows (duration × frame rate).
    Segment-sample or clip on segment boundaries downstream to cut
    silence from speech corpora."""
    from pyspark.sql import Window

    active = frame_energy(media, frame_len, id_col, payload_col).filter(
        F.col("energy") >= threshold
    )
    w = Window.partitionBy(id_col).orderBy("frame_idx")
    seg = active.withColumn("__prev", F.lag("frame_idx").over(w)).withColumn(
        "segment_id",
        F.sum(
            F.when(
                F.col("__prev").isNull()
                | (F.col("frame_idx") != F.col("__prev") + 1),
                1,
            ).otherwise(0)
        ).over(w),
    )
    return (
        seg.groupBy(id_col, "segment_id")
        .agg(
            F.min("frame_idx").cast("long").alias("start_frame"),
            F.max("frame_idx").cast("long").alias("end_frame"),
            F.count(F.lit(1)).cast("long").alias("n_frames"),
            F.max("energy").cast("long").alias("peak_energy"),
        )
        .select(
            F.col(id_col),
            F.col("segment_id").cast("long").alias("segment_id"),
            "start_frame",
            "end_frame",
            "n_frames",
            "peak_energy",
        )
    )


def fake_decode(payload: bytes) -> list[float]:
    """Deterministic stand-in for a real decoder: FEATURE_DIM pseudo-
    features from the payload digest. Replace with a codec + model once
    the libraries exist; the operator contract doesn't change."""
    digest = hashlib.sha256(payload).digest()
    return [digest[i] / 255.0 for i in range(FEATURE_DIM)]


def extract_features(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    decoder: Callable[[bytes], list[float]] | str = fake_decode,
) -> DataFrame:
    """Decode + feature-extract every payload via ``mapInPandas``.

    ``decoder`` is a bytes→features callable; passing a codec NAME
    (string) raises ``NotImplementedError`` until real codecs ship.
    Output: (media_id, n_bytes, sha256, features ARRAY<DOUBLE>).
    """
    if isinstance(decoder, str):
        raise NotImplementedError(
            f"real codec {decoder!r} not available in this environment; "
            "pass a bytes->features callable (see fake_decode)"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "n_bytes": payloads.map(len),
                    "sha256": payloads.map(lambda b: hashlib.sha256(b).hexdigest()),
                    "features": payloads.map(decoder),
                }
            )

    return media.select(id_col, payload_col).mapInPandas(run, _FEATURES_SCHEMA)


def sample_frames(
    media: DataFrame,
    every_ms: int = 1000,
    id_col: str = "media_id",
    meta_col: str = "meta",
) -> DataFrame:
    """Frame-sampling plan: one output row per sampled timestamp.

    The timestamp grid is pure column math (sequence over duration), so
    Spark parallelizes per-frame decode downstream; the actual frame
    grab is the stubbed decode step.

    Media with null duration (images, unparseable payloads) contribute
    NO frames — the sequence is guarded with an explicit isNotNull
    because Spark's ``greatest`` IGNORES nulls (greatest(NULL-1, 0) = 0,
    which would silently emit a phantom frame at t=0).
    """
    dur = F.col(f"{meta_col}.duration_ms")
    grid = F.when(
        dur.isNotNull(),
        F.sequence(F.lit(0), F.greatest(dur - 1, F.lit(0)), F.lit(every_ms)),
    )
    return media.select(id_col, F.explode(grid).alias("frame_ms"))


_RESIZED_SCHEMA = (
    "media_id BIGINT, payload BINARY, width INT, height INT, n_bytes BIGINT"
)


def fake_resample(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for a real image resampler: derives a
    pseudo-payload of size ∝ width×height from the source digest, so
    byte-budget accounting and downstream plumbing are exercised for
    real. Swap for PIL/libvips; the operator contract doesn't change."""
    seed = hashlib.sha256(payload + f"{width}x{height}".encode()).digest()
    n = max(1, (width * height) // 64)
    return (seed * (n // len(seed) + 1))[:n]


def resize_images(
    media: DataFrame,
    width: int,
    height: int,
    id_col: str = "media_id",
    payload_col: str = "payload",
    resampler: Callable[[bytes, int, int], bytes] | str = fake_resample,
) -> DataFrame:
    """Resize every image payload to (width, height) via ``mapInPandas``.

    Same batch-iterator shape as ``extract_features``: Arrow moves each
    payload into the Python worker once, the resampler runs per row, and
    the resized bytes stream back batch-by-batch — peak worker memory is
    one Arrow batch, never the partition. Passing a resampler NAME
    (string) raises ``NotImplementedError`` until real imaging libraries
    ship; the default produces deterministic size-proportional bytes so
    tests cover the full data path.
    """
    if isinstance(resampler, str):
        raise NotImplementedError(
            f"real resampler {resampler!r} not available in this environment; "
            "pass a (bytes, w, h)->bytes callable (see fake_resample)"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = pdf[payload_col].map(lambda b: resampler(b, width, height))
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "payload": resized,
                    "width": width,
                    "height": height,
                    "n_bytes": resized.map(len),
                }
            )

    return media.select(id_col, payload_col).mapInPandas(run, _RESIZED_SCHEMA)


_PHASH_SCHEMA = "media_id BIGINT, phash BIGINT"


def perceptual_hash(
    media: DataFrame,
    hash_w: int = 8,
    hash_h: int = 6,
    id_col: str = "media_id",
    payload_col: str = "payload",
    extra_col: str | None = None,
) -> DataFrame:
    """Average-hash (aHash) perceptual fingerprint of true image
    content: decode -> integer nearest-neighbor resample to
    (hash_w x hash_h) -> per-pixel gray = (r+g+b)//3 -> bit j set iff
    gray_j > floor(mean) -> hash = sum(bit_j << j), j row-major. Every
    step is integer arithmetic on the SAME sampling grid as
    ``nearest_resize``, so an oracle can replay the exact hash value.

    This is the image analogue of SimHash: near-identical images
    (re-encoded containers, small pixel perturbations) collapse to the
    same or Hamming-close hashes, where exact stat/byte dedup sees
    distinct content. Group equal hashes for exact perceptual dedup,
    or band the bits pigeonhole-style (dedup.simhash machinery) for
    Hamming-tolerant candidate pairs at scale. Arrow-batched map pass;
    needs hash_w*hash_h <= 63 so the hash fits a signed long.
    Output: (media_id, phash), plus ``extra_col`` passed through when
    set (an integer sub-key, e.g. a frame index for video shots).
    """
    if hash_w * hash_h > 63:
        raise ValueError("hash_w*hash_h must fit a signed 64-bit hash")

    import numpy as np

    keys = [id_col] + ([extra_col] if extra_col else [])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for tup in zip(*(pdf[k] for k in keys), pdf[payload_col]):
                payload = tup[-1]
                w, h, c, px = decode_pixels(bytes(payload))
                small = nearest_resize(px, w, h, c, hash_w, hash_h)
                a = np.frombuffer(small, dtype=np.uint8).reshape(
                    hash_h * hash_w, c
                )
                gray = (
                    a[:, :3].sum(axis=1, dtype=np.int64) // 3
                    if c >= 3
                    else a[:, 0].astype(np.int64)
                )
                mean = int(gray.sum()) // gray.size
                bits = gray > mean
                phash = int((bits.astype(np.int64) << np.arange(gray.size)).sum())
                row = dict(zip(keys, (int(v) for v in tup[:-1])))
                row["phash"] = phash
                rows.append(row)
            yield pd.DataFrame(rows, columns=keys + ["phash"])

    schema = ", ".join(f"{k} BIGINT" for k in keys) + ", phash BIGINT"
    return media.select(*keys, payload_col).mapInPandas(run, schema)


def shot_boundaries(
    frames: DataFrame,
    threshold_bits: int = 4,
    hash_w: int = 8,
    hash_h: int = 6,
    id_col: str = "media_id",
    frame_col: str = "frame_idx",
    payload_col: str = "payload",
) -> DataFrame:
    """Shot-boundary detection over decoded video frames: per-frame
    aHash (one Arrow map pass through :func:`perceptual_hash`), then a
    cut wherever the Hamming distance to the PREVIOUS frame's hash
    exceeds ``threshold_bits`` — consecutive non-cut frames merge into
    shots via a running cut-count (the gaps-and-islands move, all
    JVM-side: lag + bit_count(xor) + windowed sum). The standard
    frame-difference scene detector re-expressed on hashes, so the
    per-frame payload is touched exactly once and everything after the
    map pass is integer column math.

    Input: one row per (video, frame index, frame payload). Output one
    row per detected shot: (id, shot_id ascending from 1, start_frame,
    end_frame, n_frames, max_cut_bits — the Hamming jump that OPENED
    the shot, 0 for the first).

    Scale: decode cost is a map pass (embarrassingly parallel); the
    only shuffle is the per-video window, keyed on the video id —
    frame counts per video are bounded (minutes × fps), so no skew.
    Shot-sample one frame per shot downstream instead of a fixed time
    grid to cut near-duplicate frames from training corpora.
    """
    from pyspark.sql import Window

    hashed = perceptual_hash(
        frames,
        hash_w,
        hash_h,
        id_col=id_col,
        payload_col=payload_col,
        extra_col=frame_col,
    )
    w = Window.partitionBy(id_col).orderBy(frame_col)
    cuts = (
        hashed.withColumn("__prev", F.lag("phash").over(w))
        .withColumn(
            "__dist",
            F.when(F.col("__prev").isNull(), F.lit(0)).otherwise(
                F.bit_count(F.col("phash").bitwiseXOR(F.col("__prev")))
            ),
        )
        .withColumn(
            "__cut",
            F.when(
                F.col("__prev").isNull() | (F.col("__dist") > threshold_bits), 1
            ).otherwise(0),
        )
        .withColumn("shot_id", F.sum("__cut").over(w))
    )
    return (
        cuts.groupBy(id_col, "shot_id")
        .agg(
            F.min(frame_col).cast("long").alias("start_frame"),
            F.max(frame_col).cast("long").alias("end_frame"),
            F.count(F.lit(1)).cast("long").alias("n_frames"),
            F.max(F.when(F.col("__cut") == 1, F.col("__dist")).otherwise(0))
            .cast("long")
            .alias("cut_bits"),
        )
        .select(
            F.col(id_col),
            F.col("shot_id").cast("long").alias("shot_id"),
            "start_frame",
            "end_frame",
            "n_frames",
            "cut_bits",
        )
    )
