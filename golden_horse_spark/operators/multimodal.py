"""Multimodal column handling: image/audio/video as opaque ``binary``
columns with typed metadata.

The decode kernels themselves are STUBBED (this container ships no
image/audio libraries — see ``_decode_image``), but all the Spark-side
plumbing is real and tested: schemas, Arrow batch shapes, mapInPandas
signatures, partition sizing. Swapping the stub for PIL/libsndfile is a
one-function change on executors.

Design: media payloads ride a separate table keyed by ``media_ref``
(documents carry only the reference — SURVEY.md §1.2), so the 100 TB of
bytes never flows through text-only stages; column pruning drops
``payload`` unless a decode stage asks for it.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_ref", StringType()),
        StructField("kind", StringType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_ref", StringType()),
        StructField("kind", StringType()),
        StructField("feature", ArrayType(FloatType())),
        StructField("feat_dim", IntegerType()),
    ]
)


def synthesize_media(spark: SparkSession, documents: DataFrame) -> DataFrame:
    """Deterministic fake media table for every media span in documents:
    payload = repeatable bytes derived from media_ref."""
    refs = (
        documents.select(F.explode("spans").alias("s"))
        .where(F.col("s.kind") != "text")
        .select(F.col("s.media_ref").alias("media_ref"), F.col("s.kind").alias("kind"))
        .distinct()
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, kind in pdf[["media_ref", "kind"]].itertuples(index=False, name=None):
                h = hashlib.sha256(ref.encode()).digest()
                rows.append(
                    {
                        "media_ref": ref,
                        "kind": kind,
                        "payload": h * 4,  # 128 deterministic bytes
                        "width": 16 + h[0] % 64,
                        "height": 16 + h[1] % 64,
                        "duration_ms": (h[2] * 100) if kind != "image" else 0,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA.fields])

    return refs.mapInPandas(gen, MEDIA_SCHEMA)


def _decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB: real impl would be PIL.Image.open(BytesIO(payload)).
    Deterministic fake: tile payload bytes into (h, w) grayscale."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    need = width * height
    tiled = np.tile(arr, need // len(arr) + 1)[:need]
    return tiled.reshape(height, width).astype(np.float32) / 255.0


def extract_media_features(media: DataFrame, feat_dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over media payloads.

    Per batch: decode (stub) → pooled statistics vector. The batch shape
    (pandas DataFrame of binary + ints) is exactly what a real decoder
    sees; sizing note — payloads make rows heavy, so upstream should
    ``repartition`` to keep ~64 MB per Arrow batch at real payload sizes.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, kind, payload, w, h in pdf[
                ["media_ref", "kind", "payload", "width", "height"]
            ].itertuples(index=False, name=None):
                img = _decode_image(bytes(payload), int(w), int(h))
                # pooled stats: mean/std/min/max + quadrant means
                qs = [
                    float(img[: h // 2, : w // 2].mean()),
                    float(img[: h // 2, w // 2 :].mean()),
                    float(img[h // 2 :, : w // 2].mean()),
                    float(img[h // 2 :, w // 2 :].mean()),
                ]
                feat = [
                    float(img.mean()),
                    float(img.std()),
                    float(img.min()),
                    float(img.max()),
                ] + qs
                rows.append(
                    {
                        "media_ref": ref,
                        "kind": kind,
                        "feature": feat[:feat_dim],
                        "feat_dim": feat_dim,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURES_SCHEMA.fields])

    return media.mapInPandas(run, FEATURES_SCHEMA)


def sample_video_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing (kind='video'): one output row per sampled
    timestamp; the decode is the same stub. Demonstrates 1→N mapInPandas
    fan-out shape for frame extraction."""
    frames_schema = StructType(
        [
            StructField("media_ref", StringType()),
            StructField("ts_ms", IntegerType()),
            StructField("frame_feature", ArrayType(FloatType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, payload, w, h, dur in pdf[
                ["media_ref", "payload", "width", "height", "duration_ms"]
            ].itertuples(index=False, name=None):
                for ts in range(0, max(int(dur), 1), every_ms):
                    img = _decode_image(bytes(payload) + ts.to_bytes(4, "little"), int(w), int(h))
                    rows.append(
                        {
                            "media_ref": ref,
                            "ts_ms": ts,
                            "frame_feature": [float(img.mean()), float(img.std())],
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in frames_schema.fields])

    return media.where(F.col("kind") == "video").mapInPandas(run, frames_schema)
