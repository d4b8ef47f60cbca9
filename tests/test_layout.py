"""Z-order layout: replay equality, both-dim span boundedness, approx path."""

import pytest

import pyspark.sql.functions as F

from golden_horse_spark.operators.layout import (
    layout_by_zorder,
    rank_codes,
    zorder_key,
)


def _py_morton(codes, bits):
    out = 0
    k = len(codes)
    for j, x in enumerate(codes):
        for b in range(bits):
            out |= ((x >> b) & 1) << (b * k + j)
    return out


def test_zorder_key_matches_python_replay(spark):
    rows = [(a, b, c) for a in range(7) for b in range(5) for c in range(3)]
    df = spark.createDataFrame(rows, "ca int, cb int, cc int")
    got = df.select(
        "ca", "cb", "cc",
        zorder_key(["ca", "cb", "cc"], bits=4).alias("z"),
    ).collect()
    for r in got:
        assert r["z"] == _py_morton((r["ca"], r["cb"], r["cc"]), 4)


def test_zorder_key_arg_validation(spark):
    with pytest.raises(ValueError):
        zorder_key(["a"], bits=8)
    with pytest.raises(ValueError):
        zorder_key(["a", "b"], bits=32)  # 64 bits > signed long


def test_rank_codes_exact_deterministic_and_bounded(spark):
    rows = [(i, (i * 37) % 101) for i in range(500)]
    df = spark.createDataFrame(rows, "pk int, v int")
    c1 = rank_codes(df, ["v"], order_by=["pk"], bits=4).collect()
    c2 = rank_codes(df, ["v"], order_by=["pk"], bits=4).collect()
    assert sorted((r["pk"], r["_code_v"]) for r in c1) == sorted(
        (r["pk"], r["_code_v"]) for r in c2
    )
    codes = {r["pk"]: r["_code_v"] for r in c1}
    assert all(0 <= c < 16 for c in codes.values())
    # rank codes are monotone in the value (ties broken by pk)
    by_val = sorted(rows, key=lambda t: (t[1], t[0]))
    seq = [codes[pk] for pk, _ in by_val]
    assert seq == sorted(seq)
    # equal-population cells: ntile spreads 500 rows over 16 codes
    from collections import Counter

    sizes = Counter(seq).values()
    assert max(sizes) - min(sizes) <= 1


def test_rank_codes_approx_close_to_exact(spark):
    rows = [(i, i * i % 997) for i in range(2000)]
    df = spark.createDataFrame(rows, "pk int, v int")
    ex = {
        r["pk"]: r["_code_v"]
        for r in rank_codes(df, ["v"], order_by=["pk"], bits=4).collect()
    }
    ap = {
        r["pk"]: r["_code_v"]
        for r in rank_codes(df, ["v"], bits=4, exact=False).collect()
    }
    assert all(0 <= c < 16 for c in ap.values())
    # approx boundaries land within one cell of exact rank codes
    assert all(abs(ap[pk] - ex[pk]) <= 1 for pk in ex)


def test_layout_by_zorder_bounds_every_dimension(spark):
    # 64x64 uniform grid -> 16 files: z-order bounds BOTH dims per
    # partition (~1/4 of the range); single-column range layout bounds
    # one dim (~1/16) and leaves the other at ~full range. This is the
    # min/max data-skipping claim, measured.
    rows = [(x, y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(rows, "x int, y int").repartition(8)
    z = layout_by_zorder(df, ["x", "y"], n_files=16, order_by=["x", "y"], bits=6)
    assert z.columns == ["x", "y"]  # helper columns dropped
    spans = (
        z.groupBy(F.spark_partition_id().alias("p"))
        .agg(
            (F.max("x") - F.min("x")).alias("sx"),
            (F.max("y") - F.min("y")).alias("sy"),
            F.count("*").alias("n"),
        )
        .collect()
    )
    assert sum(r["n"] for r in spans) == 64 * 64
    assert len(spans) == 16
    worst = max(max(r["sx"], r["sy"]) for r in spans)
    assert worst <= 32  # both dims bounded at <= half the range

    lin = (
        df.repartitionByRange(16, "x")
        .groupBy(F.spark_partition_id().alias("p"))
        .agg((F.max("y") - F.min("y")).alias("sy"))
        .collect()
    )
    # the un-clustered dimension stays (near) full-range per partition
    assert max(r["sy"] for r in lin) >= 60


def test_layout_plan_shape_single_range_exchange(spark):
    # the re-layout is ONE range exchange + one local sort — no hash
    # exchange, no extra shuffle beyond the repartitionByRange
    rows = [(x, (x * 7) % 50) for x in range(400)]
    df = spark.createDataFrame(rows, "x int, y int")
    out = layout_by_zorder(df, ["x", "y"], n_files=8, order_by=["x", "y"], bits=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("rangepartitioning") + plan.count("RangePartitioning") >= 1
    # exactly one exchange below the layout (the window's single-task
    # exchange is SinglePartition, not hashpartitioning on data keys)
    assert "hashpartitioning" not in plan


def test_rank_codes_approx_all_null_column(spark):
    """percentile_approx over an all-NULL column returns NULL — the
    approx path must fall back to cell 0 like the exact path's NULLS
    FIRST, not crash building the literal array (round-5 review fix)."""
    from golden_horse_spark.operators.layout import rank_codes

    df = spark.createDataFrame(
        [(None,), (None,), (None,)], "x double"
    )
    out = rank_codes(df, ["x"], bits=4, exact=False)
    assert [r["_code_x"] for r in out.collect()] == [0, 0, 0]
