"""Physical-plan audit helpers: count the exchanges (shuffles) a
DataFrame's executed plan contains, so the per-operator shuffle-budget
claims documented across this package ("ONE hash exchange", "one
co-partitioned join + one aggregation exchange per round") are
testable facts instead of docstring promises.

``n_exchanges`` counts ``Exchange`` operators in the EXECUTED plan
string — with AQE enabled Spark may later replace some with local
reads at runtime, so the count is the upper bound the optimizer
schedules, which is exactly what the budget claims are about.
``BroadcastExchange`` nodes are counted separately: broadcasting a
bounded side is the cheap alternative TO a shuffle, so lumping them
together would penalize the pattern the package prefers."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_string(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def n_exchanges(df: DataFrame) -> dict:
    """Count scheduled exchanges in the executed plan: returns
    ``{"shuffle": n, "broadcast": m}`` — shuffle = hash/range/single
    partition exchanges, broadcast = BroadcastExchange."""
    plan = plan_string(df)
    broadcast = len(re.findall(r"BroadcastExchange", plan))
    total = len(re.findall(r"\bExchange\b", plan))
    return {"shuffle": total, "broadcast": broadcast}
