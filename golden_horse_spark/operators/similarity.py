"""Similarity search over embedding columns (array<float>).

* ``cosine_topk`` — exact brute-force top-k against a query vector:
  one narrow pass (zip_with/aggregate dot product, JVM codegen) + a
  top-k sort, which Spark executes as per-partition TakeOrdered + driver
  merge (no full shuffle).
* ``ivf_topk`` — the scale path: coarse quantization (IVF). Centroids
  come from a driver-side k-means on a sample (deterministic seed);
  vectors are assigned to their nearest centroid once (narrow), and a
  query probes only the closest ``n_probe`` cells — at 10^12 vectors the
  scan touches n_probe/n_cells of the data, and the cell assignment is
  the partition key so each probe is partition-pruned.
* ``lsh_bucket_topk`` — random-hyperplane LSH variant: sign-bit sketch
  via broadcast hyperplanes, candidates from matching buckets only.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(vec_col, query: Sequence[float]):
    q = F.array(*[F.lit(float(x)) for x in query])
    return F.aggregate(
        F.zip_with(vec_col, q, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(vec_col):
    return F.sqrt(
        F.aggregate(vec_col, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_topk(
    embeddings: DataFrame,
    query: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    qn = float(np.sqrt(np.dot(query, query))) or 1.0
    cos = _dot(F.col(vec_col), query) / (_norm(F.col(vec_col)) * F.lit(qn))
    return (
        embeddings.select(F.col(id_col), F.round(cos, 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def train_centroids(
    embeddings: DataFrame,
    n_cells: int = 16,
    sample: int = 2000,
    seed: int = 42,
    vec_col: str = "embedding",
) -> np.ndarray:
    """Driver-side mini k-means (Lloyd, fixed iters, seeded) on a sample.
    Centroid count is O(sqrt(N)) at scale; a few KB broadcast."""
    rows = embeddings.select(vec_col).limit(sample).collect()
    x = np.array([r[0] for r in rows], dtype=np.float64)
    rng = np.random.RandomState(seed)
    cents = x[rng.choice(len(x), size=min(n_cells, len(x)), replace=False)]
    for _ in range(8):
        d = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        for c in range(len(cents)):
            pts = x[assign == c]
            if len(pts):
                cents[c] = pts.mean(0)
    return cents


def assign_cells(
    embeddings: DataFrame, centroids: np.ndarray, vec_col: str = "embedding"
) -> DataFrame:
    """Add ``cell`` = argmin centroid distance. Pure column math: the
    per-centroid dot products unroll into codegen expressions (n_cells is
    small by construction).

    Shape notes (both measured): argmin via ``array_min`` over
    (rank, cell) structs — a chained ``F.when(cand < best, cand)
    .otherwise(best)`` duplicates the whole accumulated tree at every
    level (expression size 2^n_cells; showed up as multi-MB task
    binaries). And ‖x‖² is constant per row under argmin, so the rank is
    just ``c·c − 2·x·c`` — no per-centroid norm pass over the vector.
    """
    cands = [
        F.struct(
            (F.lit(float(np.dot(c, c))) - 2 * _dot(F.col(vec_col), c)).alias("d"),
            F.lit(ci).alias("c"),
        )
        for ci, c in enumerate(centroids)
    ]
    return embeddings.withColumn("cell", F.array_min(F.array(*cands))["c"])


def ivf_topk(
    embeddings_with_cells: DataFrame,
    centroids: np.ndarray,
    query: Sequence[float],
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe the n_probe nearest cells only (partition-prunable filter)."""
    q = np.asarray(query, dtype=np.float64)
    order = np.argsort(((centroids - q) ** 2).sum(1))[:n_probe]
    cand = embeddings_with_cells.where(F.col("cell").isin(*[int(c) for c in order]))
    return cosine_topk(cand, query, k, id_col, vec_col)


def lsh_bucket_topk(
    embeddings: DataFrame,
    query: Sequence[float],
    k: int = 10,
    n_planes: int = 12,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH: bucket = sign bits of dot with seeded
    hyperplanes; search only the query's bucket (fallback: whole table if
    the bucket is empty is the caller's policy)."""
    dim = len(query)
    rng = np.random.RandomState(seed)
    planes = rng.randn(n_planes, dim)
    bucket_expr = None
    for i, p in enumerate(planes):
        bit = F.when(_dot(F.col(vec_col), p) > 0, F.lit(1 << i)).otherwise(F.lit(0))
        bucket_expr = bit if bucket_expr is None else bucket_expr.bitwiseOR(bit)
    q_bucket = sum((1 << i) for i, p in enumerate(planes) if float(np.dot(p, query)) > 0)
    bucketed = embeddings.withColumn("bucket", bucket_expr)
    return cosine_topk(
        bucketed.where(F.col("bucket") == q_bucket), query, k, id_col, vec_col
    )
