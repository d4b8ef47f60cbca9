"""Mergeable sketches: exact heavy hitters, Bloom-filter joins, Count-Min.

The hot-surface-form problem from the other side: ``salting.py`` makes
skewed keys cheap to aggregate; this module FINDS them without paying a
full-corpus shuffle. Two passes:

1. **Candidates** — one ``mapInPandas`` sweep runs a Misra–Gries sketch
   (k counters) per PARTITION and emits its ≤ k surviving values. The
   guarantee is the textbook one, applied per partition and composed by
   pigeonhole: if a value's global count exceeds φ·N, then in at least
   one partition its local count exceeds φ·n_p (else the global sum
   could not reach φ·N), and Misra–Gries with k ≥ ⌈1/φ⌉ counters always
   retains any value whose local count exceeds n_p/(k+1) ≤ φ·n_p. So
   the candidate set is a SUPERSET of the true heavy hitters — never a
   miss, only false candidates.
2. **Exact verify** — the bounded candidate set (≤ k·partitions rows
   before distinct) broadcasts back; only matching rows aggregate, with
   map-side combine collapsing each task's contribution to ≤ |cands|
   partial rows. The final filter ``count > φ·N`` makes the output
   EXACT — which is why the DuckDB oracle is a plain GROUP BY/HAVING,
   not an approximation band.

At 10^12 rows the full stream is never shuffled: pass 1 is
shuffle-free (sketches live inside partitions), pass 2 shuffles only
per-task partials over ≤ |candidates| keys. The driver sees one scalar
(N) and the candidate list — both bounded by construction.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _misra_gries_update(counters: dict, values, k: int) -> dict:
    """Classic k-counter Misra–Gries step: after streaming any value
    sequence through, ``counters`` retains every value whose count in
    the stream so far exceeds n/(k+1). Incremental — pass the same dict
    across chunks of one stream."""
    for v in values:
        if v in counters:
            counters[v] += 1
        elif len(counters) < k:
            counters[v] = 1
        else:
            dead = [key for key in counters if counters[key] == 1]
            for key in counters:
                counters[key] -= 1
            for key in dead:
                del counters[key]
    return counters


def heavy_hitter_candidates(
    df: DataFrame, col: str, threshold_frac: float
) -> DataFrame:
    """Pass 1: per-partition Misra–Gries survivors — a guaranteed
    superset of all values with global frequency > ``threshold_frac``.
    One shuffle-free sweep; ≤ ⌈1/φ⌉ rows per partition."""
    if not 0 < threshold_frac < 1:
        raise ValueError(f"threshold_frac must be in (0, 1), got {threshold_frac}")
    k = int(1.0 / threshold_frac) + 1
    field = df.schema[col]
    out_schema = f"`{col}` {field.dataType.simpleString()}"

    def sketch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # stream the whole PARTITION through one sketch — mapInPandas
        # batches share this generator, so state carries across them
        counters: dict = {}
        for pdf in batches:
            _misra_gries_update(counters, pdf[col], k)
        yield pd.DataFrame({col: list(counters.keys())})

    return df.select(col).mapInPandas(sketch, out_schema).distinct()


def heavy_hitters(
    df: DataFrame, col: str, threshold_frac: float = 0.01
) -> DataFrame:
    """EXACT φ-heavy-hitters: every value of ``col`` whose row count
    exceeds ``threshold_frac``·N, with its exact count — ``(col, cnt)``,
    deterministic and partitioning-invariant (tested). See module
    docstring for the two-pass guarantee."""
    n = df.count()
    cands = heavy_hitter_candidates(df, col, threshold_frac)
    return (
        df.join(F.broadcast(cands), col, "left_semi")
        .groupBy(col)
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") > threshold_frac * n)
    )
