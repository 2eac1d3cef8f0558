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
* PIXEL/SAMPLE-level codec calls are STUBBED (image/audio libraries
  are not in this container): ``decoder`` defaults to a deterministic
  fake deriving pseudo-features from the bytes, and raises
  ``NotImplementedError`` when a real codec is requested. The
  Spark-side plumbing — schema, batching, partitioning — is real and
  tested.
"""

from __future__ import annotations

import hashlib
import struct as _struct
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

    Returns None for unrecognized/truncated payloads (callers keep the
    row with null metadata — the quarantine decision is theirs).
    """
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
    if payload[:3] == b"GIF" and len(payload) >= 10:
        w, h = _struct.unpack("<HH", payload[6:10])
        meta.update(media_type="image", format="gif", width=w, height=h)
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
    return None


_META_OUT_SCHEMA = T.StructType(
    [T.StructField("media_id", T.LongType()), T.StructField("meta", MEDIA_META_SCHEMA)]
)


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

    return media.select(id_col, payload_col).mapInPandas(run, _META_OUT_SCHEMA)


def make_png(width: int, height: int) -> bytes:
    """Minimal REAL PNG header bytes (signature + IHDR) — fixture builder
    for header-level decode paths; no pixel data, so not renderable."""
    ihdr = _struct.pack(">II", width, height) + b"\x08\x06\x00\x00\x00"
    return (
        b"\x89PNG\r\n\x1a\n"
        + _struct.pack(">I", 13) + b"IHDR" + ihdr + b"\x00\x00\x00\x00"
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
