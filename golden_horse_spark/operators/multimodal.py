"""Multimodal column handling: image/audio/video as opaque ``binary``
columns with typed metadata.

Image decode is REAL for the uncompressed PPM/P6 format (pure-NumPy
header parse + raw RGB read — no codec library needed; the synthetic
media table emits genuine P6 payloads, and ``resize_images`` re-encodes
P6, so decode→resize→decode round-trips on real pixels). CODEC formats
(JPEG/PNG/audio containers) are the stubbed part — this container ships
no PIL/libsndfile — and fall back to a deterministic fake; swapping
that branch for PIL is a one-function change on executors. All the
Spark-side plumbing (schemas, Arrow batch shapes, mapInPandas
signatures, partition sizing) is real and tested either way.

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
                w, ht = 16 + h[0] % 64, 16 + h[1] % 64
                if kind == "image":
                    # REAL P6 payload: deterministic RGB pixels seeded
                    # from the ref hash — the decode path parses it
                    rng = np.random.RandomState(
                        int.from_bytes(h[:4], "little")
                    )
                    rgb = rng.randint(0, 256, size=(ht, w, 3), dtype=np.uint8)
                    payload = encode_ppm(rgb)
                else:
                    payload = h * 4  # 128 deterministic bytes (codec stub)
                rows.append(
                    {
                        "media_ref": ref,
                        "kind": kind,
                        "payload": payload,
                        "width": w,
                        "height": ht,
                        "duration_ms": (h[2] * 100) if kind != "image" else 0,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA.fields])

    return refs.mapInPandas(gen, MEDIA_SCHEMA)


def encode_ppm(rgb: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary PPM (P6, maxval 255)."""
    h, w = rgb.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + rgb.astype(np.uint8).tobytes()


def parse_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) → (h, w, 3) uint8. Pure NumPy/bytes — handles the
    whitespace/comment grammar of the header; raises on truncation."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 ppm")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            pos = payload.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval}")
    need = w * h * 3
    raster = payload[pos : pos + need]
    if len(raster) != need:
        raise ValueError("truncated ppm raster")
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)


def _decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    """Grayscale float32 in [0, 1]. REAL decode for P6/PPM payloads
    (``parse_ppm`` + Rec.601 luminance). CODEC formats (JPEG/PNG) are
    the stubbed branch — no PIL in this container — decoded as a
    deterministic fake (payload bytes tiled into (h, w))."""
    if payload[:2] == b"P6":
        rgb = parse_ppm(payload).astype(np.float32)
        lum = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        return (lum / 255.0).astype(np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8)
    need = width * height
    tiled = np.tile(arr, need // len(arr) + 1)[:need]
    return tiled.reshape(height, width).astype(np.float32) / 255.0


def _decode_audio(payload: bytes, duration_ms: int) -> np.ndarray:
    """STUB: real impl would be soundfile.read(BytesIO(payload)).
    Deterministic fake: payload bytes tiled to an 8 kHz mono waveform in
    [-1, 1] of the declared duration."""
    sr = 8000
    n = max(1, int(duration_ms) * sr // 1000)
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
    tiled = np.tile(arr, n // len(arr) + 1)[:n]
    return tiled / 127.5 - 1.0


def bilinear_resize(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """REAL bilinear resize (align_corners=False convention, the
    PIL/OpenCV default) — vectorized NumPy, no library needed. Only the
    codec decode is stubbed in this container; the geometry is exact."""
    in_h, in_w = img.shape
    ys = (np.arange(out_h) + 0.5) * in_h / out_h - 0.5
    xs = (np.arange(out_w) + 0.5) * in_w / out_w - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, in_h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, in_w - 1)
    y1 = np.clip(y0 + 1, 0, in_h - 1)
    x1 = np.clip(x0 + 1, 0, in_w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :]
    tl = img[np.ix_(y0, x0)]
    tr = img[np.ix_(y0, x1)]
    bl = img[np.ix_(y1, x0)]
    br = img[np.ix_(y1, x1)]
    top = tl * (1 - wx) + tr * wx
    bot = bl * (1 - wx) + br * wx
    return (top * (1 - wy) + bot * wy).astype(np.float32)


def resize_images(
    media: DataFrame, out_w: int = 32, out_h: int = 32
) -> DataFrame:
    """Arrow-batched image resize: decode (stub) → REAL bilinear resize →
    re-emit uint8 payload with the new dimensions. Output rides the same
    MEDIA_SCHEMA so downstream stages are unchanged — the standard
    normalize-resolution step of a multimodal training pipeline."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, kind, payload, w, h, dur in pdf[
                ["media_ref", "kind", "payload", "width", "height", "duration_ms"]
            ].itertuples(index=False, name=None):
                img = _decode_image(bytes(payload), int(w), int(h))
                resized = (
                    (bilinear_resize(img, out_h, out_w) * 255.0)
                    .round()
                    .astype(np.uint8)
                )
                # re-encode as P6 (grayscale replicated to RGB) so the
                # resized payload is itself decodable — the stage output
                # round-trips through the same decode path
                rows.append(
                    {
                        "media_ref": ref,
                        "kind": kind,
                        "payload": encode_ppm(
                            np.repeat(resized[:, :, None], 3, axis=2)
                        ),
                        "width": out_w,
                        "height": out_h,
                        "duration_ms": int(dur),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA.fields])

    return media.where(F.col("kind") == "image").mapInPandas(run, MEDIA_SCHEMA)


def extract_media_features(media: DataFrame, feat_dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over media payloads.

    Per batch: decode (stub) → pooled statistics vector; audio decodes
    to a waveform (RMS/zero-crossings), image/video frames to grayscale
    (pooled quadrant means). The batch shape (pandas DataFrame of binary
    + ints) is exactly what a real decoder sees; sizing note — payloads
    make rows heavy, so upstream should ``repartition`` to keep ~64 MB
    per Arrow batch at real payload sizes.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, kind, payload, w, h, dur in pdf[
                ["media_ref", "kind", "payload", "width", "height", "duration_ms"]
            ].itertuples(index=False, name=None):
                if kind == "audio":
                    wave = _decode_audio(bytes(payload), int(dur))
                    zcr = float(np.mean(np.abs(np.diff(np.sign(wave))) > 0))
                    feat = [
                        float(wave.mean()),
                        float(wave.std()),
                        float(wave.min()),
                        float(wave.max()),
                        float(np.sqrt(np.mean(wave**2))),  # RMS
                        zcr,
                        float(len(wave)),
                        0.0,
                    ]
                else:
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
