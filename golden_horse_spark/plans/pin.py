"""Partitioning-preserving local checkpoints.

Spark 4 + AQE silently drops partitioning metadata at every
``localCheckpoint``: with adaptive execution enabled, the checkpointed
dataset's physical plan is an ``AdaptiveSparkPlan`` whose
``outputPartitioning`` is still unknown when ``LogicalRDD.fromDataset``
captures it, so the resulting scan reports no partitioning and every
downstream co-partitioned join/aggregate pays a redundant Exchange that
EnsureRequirements would otherwise elide. Measured on this repo's
pagerank: 4 scheduled shuffles per round instead of the 1 the operator
is designed for — at 100 TB that's 3 extra full shuffles of the rank
table per iteration, a scale-killer hiding behind a one-line API call.

``pin_checkpoint`` closes the gap: the checkpoint source is PLANNED
with AQE off (a per-plan property — the conf is flipped only around
plan creation and restored immediately), so the physical plan exposes
its real ``hashpartitioning`` and ``LogicalRDD`` keeps it; downstream
queries are planned with AQE on as usual and see a partitioned scan.
The trade: the checkpointed sub-plan itself (typically one exchange +
narrow ops in this package's loop bodies) runs without AQE's runtime
re-planning — exactly the plans that are intentionally pinned anyway.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

_AQE_KEY = "spark.sql.adaptive.enabled"
# one lock for ALL pin callers: streaming foreachBatch threads invoke
# pinned operators concurrently with the driver thread, and two
# overlapping flips could restore a stale conf value (round-6 ADVICE
# fix). The lock serializes flip→plan→restore windows so the restored
# value is always the true outer setting.
_PIN_LOCK = threading.RLock()


def pin_checkpoint(df: DataFrame, eager: bool = True) -> DataFrame:
    """``df.localCheckpoint(eager)`` that preserves hash partitioning
    (plans the checkpoint source with AQE off — see module docstring).
    Works for lazy checkpoints too: ``fromDataset`` forces planning at
    call time, inside the conf window.

    The conf flip is session-scoped for the duration of ONE plan
    construction (microseconds, restored in ``finally``) and serialized
    by ``_PIN_LOCK`` across threads, so overlapping pins can't restore
    a stale value. A non-pin query planned concurrently from another
    thread could still observe the microsecond window; callers that
    plan unrelated queries from other threads should scope with
    ``SparkSession.newSession()`` instead."""
    spark = df.sparkSession
    with _PIN_LOCK:
        prev = spark.conf.get(_AQE_KEY)
        spark.conf.set(_AQE_KEY, "false")
        try:
            return df.localCheckpoint(eager=eager)
        finally:
            spark.conf.set(_AQE_KEY, prev)


def pin(df: DataFrame) -> DataFrame:
    """``transform``-friendly eager form: ``df.transform(pin)``."""
    return pin_checkpoint(df, eager=True)


def pin_lazy(df: DataFrame) -> DataFrame:
    """``transform``-friendly lazy form: ``df.transform(pin_lazy)``."""
    return pin_checkpoint(df, eager=False)
