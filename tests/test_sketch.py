"""Exact heavy hitters (operators/sketch.py): Misra–Gries retention
property, candidate superset guarantee, exactness vs plain groupBy,
partitioning invariance."""

import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from golden_horse_spark.operators.sketch import (
    _misra_gries_update,
    heavy_hitter_candidates,
    heavy_hitters,
)

pytestmark = pytest.mark.spark


@given(
    st.lists(st.integers(min_value=0, max_value=20), min_size=1, max_size=500),
    st.integers(min_value=1, max_value=12),
)
@settings(max_examples=200, deadline=None)
def test_misra_gries_retention_property(stream, k):
    """Every value with count > n/(k+1) survives — the textbook bound,
    on arbitrary streams, including incremental chunked updates."""
    counters = {}
    mid = len(stream) // 2
    _misra_gries_update(counters, stream[:mid], k)
    _misra_gries_update(counters, stream[mid:], k)
    n = len(stream)
    for v in set(stream):
        if stream.count(v) > n / (k + 1):
            assert v in counters, (v, k, n)
    assert len(counters) <= k


def _skewed_corpus(seed, n=4000):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        r = rng.random()
        if r < 0.25:
            w = "hot"
        elif r < 0.32:
            w = "warm"
        else:
            w = f"tail{rng.randrange(500)}"
        rows.append((i, w))
    return rows


def test_heavy_hitters_exact_vs_groupby(spark):
    from pyspark.sql import functions as F

    rows = _skewed_corpus(5)
    df = spark.createDataFrame(rows, "id long, w string")
    phi = 0.05
    n = len(rows)
    want = sorted(
        (r["w"], r["cnt"])
        for r in df.groupBy("w").agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") > phi * n).collect()
    )
    got = sorted(tuple(r) for r in heavy_hitters(df, "w", phi).collect())
    assert got == want and ("hot", sum(1 for _, w in rows if w == "hot")) in got


def test_heavy_hitters_partitioning_invariant(spark):
    """The adversarial case for per-partition sketches: the hot value
    spread thin across many partitions. The pigeonhole superset
    guarantee means the RESULT cannot depend on partitioning."""
    rows = _skewed_corpus(11)
    results = []
    for parts in (1, 7, 32):
        df = spark.createDataFrame(rows, "id long, w string").repartition(parts)
        results.append(
            sorted(tuple(r) for r in heavy_hitters(df, "w", 0.05).collect())
        )
    assert results[0] == results[1] == results[2] and results[0]


def test_candidates_are_superset_and_bounded(spark):
    from pyspark.sql import functions as F

    rows = _skewed_corpus(23)
    df = spark.createDataFrame(rows, "id long, w string").repartition(8)
    phi = 0.05
    cands = {r["w"] for r in heavy_hitter_candidates(df, "w", phi).collect()}
    n = len(rows)
    true_hh = {
        r["w"]
        for r in df.groupBy("w").agg(F.count("*").alias("c"))
        .where(F.col("c") > phi * n).collect()
    }
    assert true_hh <= cands
    assert len(cands) <= 8 * (int(1 / phi) + 1)  # ≤ k per partition
    with pytest.raises(ValueError):
        heavy_hitter_candidates(df, "w", 1.5)
