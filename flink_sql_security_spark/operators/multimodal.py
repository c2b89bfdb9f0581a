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
