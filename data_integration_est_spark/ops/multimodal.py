"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side machinery here is real and tested — schemas, Arrow-batched
``mapInPandas`` pipelines, partition sizing — while the actual media
decoding is STUBBED (this environment has no image/audio libraries).  Each
decoder raises ``NotImplementedError`` unless ``fake=True``, in which case
a deterministic fake (hash-derived) feature is produced so the distributed
plumbing can be exercised end-to-end.

Design for 100 TB: media bytes stay in executor memory only for the
duration of one Arrow batch; metadata/features (tiny) flow on; batch size
is bounded with ``spark.sql.execution.arrow.maxRecordsPerBatch`` so a
partition of large blobs cannot OOM an executor.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, DoubleType, IntegerType, LongType, StringType,
    StructField, StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),        # image | audio | video
    StructField("content", BinaryType(), True),       # opaque encoded bytes
    StructField("mime", StringType(), True),
    StructField("width", IntegerType(), True),        # typed metadata
    StructField("height", IntegerType(), True),
    StructField("duration_ms", IntegerType(), True),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),
    StructField("n_bytes", LongType(), True),
    StructField("feature", ArrayType(DoubleType()), True),
])


def _fake_feature(content: bytes | None, dim: int) -> list[float]:
    """Deterministic stand-in for a decoded-media feature vector: bytes of
    the blob's sha256, scaled to [0,1).  NOT a real decoder."""
    if content is None:
        return [0.0] * dim
    h = hashlib.sha256(content).digest()
    raw = (h * (dim // len(h) + 1))[:dim]
    return [b / 256.0 for b in raw]


def extract_features(
    df: DataFrame, dim: int = 16, fake: bool = False
) -> DataFrame:
    """Decode + featurize media blobs via Arrow-batched ``mapInPandas``.

    Real decode is environment-dependent and stubbed: raises
    ``NotImplementedError`` unless ``fake=True`` (deterministic fake)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media decoding requires image/audio libraries not present "
                    "in this environment; pass fake=True to exercise the "
                    "distributed plumbing with deterministic fake features"
                )
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["content"].map(lambda b: 0 if b is None else len(b)).astype("int64"),
                "feature": pdf["content"].map(lambda b: _fake_feature(b, dim)),
            })

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video rows: emits (media_id, frame_ts_ms)
    pairs from the typed metadata WITHOUT decoding — pure Column exprs, so
    the expensive decode fan-out can be scheduled independently."""
    return (
        df.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.coalesce(F.col("duration_ms"), F.lit(0)),
                           F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )
