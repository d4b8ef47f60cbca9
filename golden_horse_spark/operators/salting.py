"""Hot-key salting for skewed aggregations (north_rule: "explicit salting
of hot surface-form keys"; SURVEY.md §4.2.1).

AQE's skew handling only splits skewed JOIN partitions; a skewed
``groupBy`` still funnels one hot key into one reducer. The classic fix
is two-phase aggregation: salt the key with ``pmod(hash(row), S)``,
pre-aggregate on (key, salt) — map-side combine already shrinks it —
then aggregate the S partials. For algebraic aggregates (count/sum/min/
max) this is exact.
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict,
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs``: {output_col: ("count"|"sum"|"min"|"max", input_col)}.
    Exact for these algebraic functions; the first phase groups on
    (keys, salt), the second merges partials.
    """
    # spread rows of the SAME key across buckets; any per-row value works
    # since algebraic partials merge exactly
    salt = F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(salt_buckets))
    phase1_aggs: List[Column] = []
    phase2_aggs: List[Column] = []
    for out, (fn, col) in aggs.items():
        if fn == "count":
            phase1_aggs.append(F.count(col).alias(f"__p_{out}"))
            phase2_aggs.append(F.sum(f"__p_{out}").alias(out))
        elif fn == "sum":
            phase1_aggs.append(F.sum(col).alias(f"__p_{out}"))
            phase2_aggs.append(F.sum(f"__p_{out}").alias(out))
        elif fn == "min":
            phase1_aggs.append(F.min(col).alias(f"__p_{out}"))
            phase2_aggs.append(F.min(f"__p_{out}").alias(out))
        elif fn == "max":
            phase1_aggs.append(F.max(col).alias(f"__p_{out}"))
            phase2_aggs.append(F.max(f"__p_{out}").alias(out))
        else:
            raise ValueError(f"non-algebraic aggregate {fn!r} cannot be salted")
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(*phase1_aggs)
    )
    return partial.groupBy(*keys).agg(*phase2_aggs)


def surface_form_counts(
    mentions: DataFrame, salt_buckets: int = 16
) -> DataFrame:
    """Mention-frequency per surface form — the designated hot-key case
    (one surface form can appear in ~10% of all docs)."""
    return salted_agg(
        mentions, ["surface"], {"n_mentions": ("count", "surface")}, salt_buckets
    ).orderBy(F.col("n_mentions").desc())


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str] | str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join (round 4): the EXPLICIT-salting complement to
    ``salted_agg`` for the join side of the north rule.

    AQE's skew-join split is reactive — it needs runtime partition
    stats, only fires on sort-merge joins past size thresholds, and is
    unavailable under Structured Streaming. When a hot key is KNOWN
    (one surface form in ~10% of mentions), the deterministic fix is:
    salt the BIG side with ``pmod(hash(id), S)`` and replicate the
    small side S× (one copy per salt value), joining on (key, salt).
    Every big row meets exactly ONE replica of each matching small row,
    so the result multiset is identical to the plain join — exact, not
    approximate — while the hot key's rows spread across S reducers.

    Supported ``how``: ``inner`` and ``left`` (each big row's match set
    is preserved exactly). ``right``/``full`` would need unmatched
    SMALL rows, which the replication distorts (an unmatched small row
    appears S times) — raises instead.

    Cost model vs alternatives: broadcast beats this when the small
    side fits in memory; salting wins when the dim is broadcast-too-big
    but still ≪ the fact side (replication costs S× the small side's
    shuffle volume, bounded and chosen, vs one reducer eating the hot
    key's entire fan-in, unbounded).
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'/'left', got {how!r} — "
            "right/full would replicate unmatched small-side rows S times"
        )
    keys = [on] if isinstance(on, str) else list(on)
    salt = F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(salt_buckets))
    big_s = big.withColumn("__salt", salt)
    small_s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = big_s.join(small_s, keys + ["__salt"], how)
    return out.drop("__salt")
