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
* the actual codec calls are STUBBED here (image/audio libraries are
  not in this container): ``decoder`` defaults to a deterministic fake
  deriving pseudo-features from the bytes, and raises
  ``NotImplementedError`` when a real codec is requested. The
  Spark-side plumbing — schema, batching, partitioning — is real and
  tested.
"""

from __future__ import annotations

import hashlib
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
    """
    return media.select(
        id_col,
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col(f"{meta_col}.duration_ms") - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ms"),
    )


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
