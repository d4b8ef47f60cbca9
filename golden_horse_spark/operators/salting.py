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


def gini(df: DataFrame, value_col: str) -> DataFrame:
    """Gini concentration index of a non-negative value column — the
    key-skew DIAGNOSTIC that decides whether a join/agg needs salting
    (G→0: uniform keys; G→1: one hot key owns the mass). Uses the
    rank formulation over ascending values:

        G = (2·Σ i·x_i) / (n·Σ x_i) − (n + 1)/n

    Intended input is an already-aggregated key-count table
    (vocabulary-sized — same bounded-sort class as the alias
    dictionaries), NOT raw rows: the one global-sort window is over
    |keys| rows. Returns one row with exact-long pins (``n``,
    ``total``, ``s1`` = Σ i·x_i — integer when the input is integer,
    so an oracle can replay the index to the last bit) plus the float
    ``gini`` computed once from the exact sums."""
    from pyspark.sql import Window

    ranked = df.select(
        F.col(value_col).alias("_x"),
        F.row_number().over(
            Window.orderBy(F.col(value_col).asc())
        ).alias("_i"),
    )
    return ranked.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("_x").cast("long").alias("total"),
        F.sum(F.col("_i") * F.col("_x")).cast("long").alias("s1"),
    ).select(
        "n",
        "total",
        "s1",
        F.when(
            (F.col("n") > 0) & (F.col("total") > 0),
            2.0 * F.col("s1") / (F.col("n") * F.col("total"))
            - (F.col("n") + 1.0) / F.col("n"),
        )
        .otherwise(F.lit(0.0))
        .alias("gini"),
    )


def mad_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    k: float = 3.0,
) -> DataFrame:
    """Robust per-group outlier flags by Median Absolute Deviation —
    the curation-QA check (flag documents whose quality/length/score
    deviates from their domain's typical value; median/MAD survive
    the heavy tails that wreck mean/stddev z-scores). Plain MAD, no
    1.4826 normal-consistency factor (thresholds are empirical here;
    documented so twins stay exact).

    Per group: med = exact interpolated median, mad = median(|x −
    med|), outlier ⇔ |x − med| > k·mad (ties at the threshold are
    inliers; mad = 0 degenerates to flagging any deviation). Two
    grouped exact-percentile aggregates + two co-keyed joins back —
    group count bounded rows in between, never a global sort of the
    raw table."""
    gc = list(group_cols)
    med = df.groupBy(*gc).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("_med")
    )
    j1 = df.join(med, gc) if gc else df.crossJoin(med)
    dev = j1.withColumn("_adev", F.abs(F.col(value_col) - F.col("_med")))
    mad = dev.groupBy(*gc).agg(
        F.expr("percentile(_adev, 0.5)").alias("_mad")
    )
    j2 = dev.join(mad, gc) if gc else dev.crossJoin(mad)
    return j2.select(
        *df.columns,
        F.col("_med").alias("med"),
        F.col("_mad").alias("mad"),
        (F.col("_adev") > F.lit(float(k)) * F.col("_mad")).alias(
            "is_outlier"
        ),
    )
