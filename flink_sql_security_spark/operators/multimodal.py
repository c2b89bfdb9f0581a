"""Multimodal column plumbing: images/audio/video as opaque binary columns.

The Spark-side machinery is real and tested — schemas, Arrow-batched
``mapInPandas`` pipelines, partition sizing — while the actual media decode is
stubbed (no image/audio libraries in this container, driver brief): pass
``fake=True`` for a deterministic md5-derived feature vector, or get a
``NotImplementedError`` naming the real dependency.

Scale notes:
- binary payloads ride in their own column; metadata stays in typed columns so
  filters/pruning never touch the bytes
- ``mapInPandas`` streams Arrow record batches — memory is bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch``, not partition size
- repartition before decode so each task holds O(batch) media, not O(file)
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, StringType, StructField,
    StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", StringType(), False),
    StructField("kind", StringType(), False),       # image | audio | video
    StructField("content", BinaryType(), True),     # opaque payload
    StructField("mime", StringType(), True),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("duration_ms", IntegerType(), True),
])

FEATURE_DIM = 16

_FEATURES_SCHEMA = StructType([
    StructField("media_id", StringType(), False),
    StructField("kind", StringType(), False),
    StructField("n_bytes", IntegerType(), True),
    StructField("features", ArrayType(FloatType()), True),
])


def _fake_features(payload: bytes) -> list[float]:
    """Deterministic md5-derived pseudo-features (decode stand-in)."""
    digest = hashlib.md5(payload or b"").digest()
    return [b / 255.0 for b in digest[:FEATURE_DIM]]


def extract_features(df: DataFrame, fake: bool = False,
                     batch_partitions: int | None = None) -> DataFrame:
    """media rows → (media_id, kind, n_bytes, features[16]).

    Real Arrow-batched pipeline; the decode kernel is the only stub. With
    ``fake=True`` features are md5-derived (deterministic for tests).
    """
    if batch_partitions:
        df = df.repartition(batch_partitions, "media_id")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media decode requires Pillow/torchaudio/ffmpeg, not "
                    "available in this environment; pass fake=True for the "
                    "deterministic stub"
                )
            out = pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["content"].map(
                    lambda b: len(b) if b is not None else 0),
                "features": pdf["content"].map(
                    lambda b: _fake_features(bytes(b) if b is not None else b"")),
            })
            yield out

    return df.mapInPandas(decode, schema=_FEATURES_SCHEMA)


_DECODED_SCHEMA = StructType([
    StructField("media_id", StringType(), False),
    StructField("kind", StringType(), False),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("channels", IntegerType(), True),
    StructField("pixels", BinaryType(), True),      # H*W*C row-major bytes
])

_FAKE_DECODE_SIDE = 8  # stub decodes to an 8×8 RGB buffer


def decode_media(df: DataFrame, fake: bool = False) -> DataFrame:
    """media rows → decoded pixel buffers (media_id, kind, w, h, c, pixels).

    The decode kernel is the stubbed step (Pillow/ffmpeg absent here): with
    ``fake=True`` every payload deterministically becomes an 8×8×3 buffer
    whose bytes cycle the payload's md5 — stable across runs/engines, so
    downstream kernels (resize, features) are testable for real. The
    surrounding plumbing is production-shaped: Arrow batches in, explicit
    output schema, payload bytes never surface into JVM row objects larger
    than one batch.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        side = _FAKE_DECODE_SIDE
        npix = side * side * 3
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media decode requires Pillow/torchaudio/ffmpeg, not "
                    "available in this environment; pass fake=True for the "
                    "deterministic stub"
                )

            def buf(b):
                digest = hashlib.md5(bytes(b) if b is not None else b"").digest()
                return bytes(digest[i % len(digest)] for i in range(npix))

            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "width": side,
                "height": side,
                "channels": 3,
                "pixels": pdf["content"].map(buf),
            })

    return df.mapInPandas(decode, schema=_DECODED_SCHEMA)


def resize_plan(df: DataFrame, max_side: int = 224) -> DataFrame:
    """Target-dimension planning for aspect-preserving downscale — pure JVM
    arithmetic on metadata columns, no payload access, fully codegen'd
    (and therefore DuckDB-oracle-checkable).

    out = floor(dim · max_side / longest_side), clamped ≥1; rows already
    within bounds keep their dimensions. ``floor`` (not round) keeps the
    arithmetic unambiguous across engines.
    """
    w, h = F.col("width"), F.col("height")
    longest = F.greatest(w, h)
    scale_needed = longest > max_side
    out_w = F.when(scale_needed, F.greatest(
        F.lit(1), F.floor(w * max_side / longest).cast("int"))).otherwise(w)
    out_h = F.when(scale_needed, F.greatest(
        F.lit(1), F.floor(h * max_side / longest).cast("int"))).otherwise(h)
    return (
        df.where(w.isNotNull() & h.isNotNull())
        .select("media_id", "kind", "width", "height",
                out_w.alias("out_width"), out_h.alias("out_height"))
    )


def resize_media(decoded: DataFrame, out_side: int = 4) -> DataFrame:
    """Nearest-neighbor resize of decoded pixel buffers to out_side².

    Runs for real (numpy index-gather on the Arrow batch — no media lib
    needed once buffers are decoded); with the fake decode stub upstream
    this exercises the full decode→transform kernel chain end to end.
    """
    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for b, w, h, c in zip(pdf["pixels"], pdf["width"],
                                  pdf["height"], pdf["channels"]):
                if b is None:
                    outs.append(None)
                    continue
                arr = np.frombuffer(bytes(b), dtype=np.uint8).reshape(h, w, c)
                ys = (np.arange(out_side) * h) // out_side
                xs = (np.arange(out_side) * w) // out_side
                outs.append(arr[np.ix_(ys, xs)].tobytes())
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "width": out_side,
                "height": out_side,
                "channels": pdf["channels"],
                "pixels": outs,
            })

    return decoded.mapInPandas(kernel, schema=_DECODED_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Planning-only frame sampler: one row per (video, frame_ts) without
    touching payload bytes — metadata-driven explode, fully JVM-side."""
    return (
        df.where(F.col("kind") == "video")
        .where(F.col("duration_ms").isNotNull())
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )
