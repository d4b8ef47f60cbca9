"""As-of and range join semantics + plan shape (operators/temporal.py)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from golden_horse_spark.operators.temporal import asof_join, range_join


def _ts(m, s=0):
    return dt.datetime(2024, 1, 1, 0, m, s)


@pytest.fixture(scope="module")
def tiny(spark):
    left = spark.createDataFrame(
        [(1, _ts(0), "a"), (1, _ts(5), "b"), (1, _ts(10), "c"), (2, _ts(3), "d")],
        "k int, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, _ts(0), 10.0), (1, _ts(5), None), (1, _ts(7), 30.0), (3, _ts(1), 99.0)],
        "k int, ts timestamp, v double",
    )
    return left, right


def _collect(df):
    return {
        r["tag"]: r["asof_v"]
        for r in df.select("tag", "asof_v").collect()
    }


def test_asof_backward_basic(tiny):
    left, right = tiny
    got = _collect(asof_join(left, right, on="k", value_cols=["v"]))
    # b matches the t=5 right row even though its VALUE is null — as-of
    # attaches the latest ROW, it does not skip to an older non-null one
    assert got == {"a": 10.0, "b": None, "c": 30.0, "d": None}


def test_asof_backward_strict(tiny):
    left, right = tiny
    got = _collect(
        asof_join(left, right, on="k", value_cols=["v"], strict=True)
    )
    # strict: a (t=0) no longer sees the equal-timestamp right row
    assert got == {"a": None, "b": 10.0, "c": 30.0, "d": None}


def test_asof_forward(tiny):
    left, right = tiny
    got = _collect(
        asof_join(left, right, on="k", value_cols=["v"], direction="forward")
    )
    assert got == {"a": 10.0, "b": None, "c": None, "d": None}


def test_asof_matches_sql_join_rank(spark):
    """Cross-check the union+window shape against the naive
    join-then-rank formulation on a bigger random slice."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    fast = (
        asof_join(ev, clicks, on="user_id", value_cols=["value"])
        .select("event_id", "asof_value")
    )
    ev.createOrReplaceTempView("_ev")
    clicks.createOrReplaceTempView("_cl")
    naive = spark.sql(
        """
        SELECT event_id, max_by(v, cts) AS asof_value FROM (
            SELECT e.event_id, c.value AS v, c.ts AS cts
            FROM _ev e LEFT JOIN _cl c
              ON e.user_id = c.user_id AND c.ts <= e.ts
        ) GROUP BY event_id
        """
    )
    a = {r["event_id"]: r["asof_value"] for r in fast.collect()}
    b = {r["event_id"]: r["asof_value"] for r in naive.collect()}
    assert a == b and len(a) > 100


def test_range_join_boundaries_and_long_intervals(spark):
    pts = spark.createDataFrame(
        [(1, _ts(0)), (1, _ts(10)), (1, _ts(30)), (1, _ts(59, 59)), (2, _ts(10))],
        "k int, ts timestamp",
    )
    iv = spark.createDataFrame(
        # 1-hour interval spans many 30s bins; endpoints inclusive
        [(1, "w", _ts(0), _ts(59, 59)), (2, "x", _ts(11), _ts(12))],
        "k int, iv string, t_start timestamp, t_end timestamp",
    )
    got = range_join(pts, iv, on="k", bin_width=30.0)
    rows = {(r["iv"], str(r["ts"])) for r in got.collect()}
    assert rows == {
        ("w", "2024-01-01 00:00:00"),
        ("w", "2024-01-01 00:10:00"),
        ("w", "2024-01-01 00:30:00"),
        ("w", "2024-01-01 00:59:59"),
    }


def test_temporal_plans_are_shuffle_safe(spark):
    """asof = window over one exchange (no join operator at all);
    range = equi-join (never BroadcastNestedLoop/Cartesian)."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    asof_plan = asof_join(
        ev, clicks, on="user_id", value_cols=["value"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in asof_plan
    assert "Window" in asof_plan

    iv = ev.select(
        "user_id",
        F.col("ts").alias("t_start"),
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("t_end"),
    )
    rng_plan = range_join(
        ev, iv, on="user_id"
    )._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in rng_plan and "Cartesian" not in rng_plan


def test_sessionize_gap_semantics(spark):
    from golden_horse_spark.operators.temporal import sessionize

    ev = spark.createDataFrame(
        [
            (1, _ts(0)), (1, _ts(10)), (1, _ts(45)),   # 35-min gap splits
            (1, _ts(50)), (2, _ts(0)),
            # exact-boundary cases: session_window semantics are
            # half-open [start, last_ts + gap), so a diff of EXACTLY
            # gap opens a new session while gap - 1s does not
            (3, _ts(0)), (3, _ts(30)),                 # diff == gap → new
            (4, _ts(0)), (4, _ts(29, 59)),             # diff == gap-1s → same
        ],
        "user_id int, ts timestamp",
    )
    got = {
        (r["user_id"], str(r["ts"])): r["session_seq"]
        for r in sessionize(ev, gap=1800.0).collect()
    }
    assert got == {
        (1, "2024-01-01 00:00:00"): 1,
        (1, "2024-01-01 00:10:00"): 1,
        (1, "2024-01-01 00:45:00"): 2,
        (1, "2024-01-01 00:50:00"): 2,
        (2, "2024-01-01 00:00:00"): 1,
        (3, "2024-01-01 00:00:00"): 1,
        (3, "2024-01-01 00:30:00"): 2,
        (4, "2024-01-01 00:00:00"): 1,
        (4, "2024-01-01 00:29:59"): 1,
    }


def test_asof_randomized_vs_python_reference(spark):
    """40 random scenarios batched into ONE job, each checked against a
    brute-force python as-of (backward and forward)."""
    import random

    rng = random.Random(7)
    left_rows, right_rows, seen = [], [], set()
    for scen in range(40):
        for i in range(rng.randint(0, 8)):
            left_rows.append((scen, rng.randint(0, 20), f"L{scen}-{i}"))
        for j in range(rng.randint(0, 6)):
            t = rng.randint(0, 20)
            if (scen, t) not in seen:       # unique right ts per key ⇒
                seen.add((scen, t))         # reference is unambiguous
                right_rows.append((scen, t, float(j)))
    left = spark.createDataFrame(
        [(s, _ts(t), tag) for s, t, tag in left_rows],
        "k int, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(s, _ts(t), v) for s, t, v in right_rows],
        "k int, ts timestamp, v double",
    )
    by_key = {}
    for s, t, v in right_rows:
        by_key.setdefault(s, []).append((t, v))

    for direction, cmp in (("backward", lambda rt, t: rt <= t),
                           ("forward", lambda rt, t: rt >= t)):
        got = {
            r["tag"]: r["asof_v"]
            for r in asof_join(
                left, right, on="k", value_cols=["v"], direction=direction
            ).collect()
        }
        assert len(got) == len(left_rows)
        for s, t, tag in left_rows:
            cands = [(rt, v) for rt, v in by_key.get(s, []) if cmp(rt, t)]
            if direction == "backward":
                want = max(cands)[1] if cands else None
            else:
                want = min(cands)[1] if cands else None
            assert got[tag] == want, (direction, tag, got[tag], want)


def test_range_join_randomized_vs_python_reference(spark):
    """30 random scenarios in one job vs brute-force interval scan."""
    import random

    rng = random.Random(11)
    pts, ivs = [], []
    for scen in range(30):
        for i in range(rng.randint(0, 10)):
            pts.append((scen, rng.randint(0, 40), f"P{scen}-{i}"))
        for j in range(rng.randint(0, 4)):
            a = rng.randint(0, 40)
            ivs.append((scen, f"I{scen}-{j}", a, a + rng.randint(0, 15)))
    points = spark.createDataFrame(
        [(k, _ts(0, t), tag) for k, t, tag in pts],
        "k int, ts timestamp, tag string",
    )
    intervals = spark.createDataFrame(
        [(k, iv, _ts(0, a), _ts(0, b)) for k, iv, a, b in ivs],
        "k int, iv string, t_start timestamp, t_end timestamp",
    )
    got = {
        (r["tag"], r["iv"])
        for r in range_join(points, intervals, on="k", bin_width=7.0).collect()
    }
    want = {
        (tag, iv)
        for k, t, tag in pts
        for k2, iv, a, b in ivs
        if k2 == k and a <= t <= b
    }
    assert got == want and len(want) > 20


def test_sessionize_randomized_vs_python_reference(spark):
    """Random event streams vs a sequential python gap scan."""
    import random

    from golden_horse_spark.operators.temporal import sessionize

    rng = random.Random(13)
    rows = []
    for user in range(25):
        ts = 0
        for _ in range(rng.randint(1, 15)):
            ts += rng.randint(1, 120)
            rows.append((user, ts))
    def sec(t):
        import datetime as dt

        return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=t)

    ev = spark.createDataFrame(
        [(u, sec(t)) for u, t in rows], "user_id int, ts timestamp"
    )
    got = {
        (r["user_id"], str(r["ts"])): r["session_seq"]
        for r in sessionize(ev, gap=60.0).collect()
    }
    by_user = {}
    for u, t in sorted(set(rows)):
        by_user.setdefault(u, []).append(t)
    for u, times in by_user.items():
        seq = 0
        prev = None
        for t in times:
            # >= gap splits (half-open session_window boundary)
            if prev is None or t - prev >= 60:
                seq += 1
            prev = t
            assert got[(u, str(sec(t)))] == seq, (u, t)


def test_asof_duplicate_right_ts_deterministic(spark):
    """Multiple right rows at the same (key, ts): the greatest value
    struct wins (window tie-break on the payload struct), independent of
    input partitioning / sort stability."""
    left = spark.createDataFrame(
        [(1, _ts(5), "a")], "k int, ts timestamp, tag string"
    )
    rows = [(1, _ts(3), float(v)) for v in (7, 2, 9, 4)]
    for parts in (1, 3, 8):
        right = spark.createDataFrame(
            rows, "k int, ts timestamp, v double"
        ).repartition(parts)
        got = _collect(asof_join(left, right, on="k", value_cols=["v"]))
        assert got == {"a": 9.0}, (parts, got)


def _py_coalesce(intervals):
    """reference: sort per key, sweep, merge touching/overlapping."""
    out = {}
    bykey = {}
    for k, s, e in intervals:
        bykey.setdefault(k, []).append((s, e))
    for k, ivs in bykey.items():
        ivs.sort()
        merged = []
        for s, e in ivs:
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
                merged[-1][2] += 1
            else:
                merged.append([s, e, 1])
        out[k] = [
            (i + 1, s, e, n) for i, (s, e, n) in enumerate(merged)
        ]
    return {
        (k, seq, s, e, n)
        for k, islands in out.items()
        for seq, s, e, n in islands
    }


def test_coalesce_intervals_randomized_vs_python_reference(spark):
    import random

    from golden_horse_spark.operators.temporal import coalesce_intervals

    rng = random.Random(20240819)
    rows = []
    for i in range(400):
        k = f"k{rng.randrange(6)}"
        s = rng.randrange(0, 1000)
        rows.append((k, s, s + rng.randrange(0, 60)))
    # edge shapes: touching, contained, identical, zero-length
    rows += [("t", 0, 10), ("t", 10, 20), ("t", 5, 7), ("t", 5, 7),
             ("t", 30, 30), ("t", 30, 30), ("t", 29, 31)]
    df = spark.createDataFrame(rows, "k string, s long, e long")
    got = {
        (r["k"], r["interval_seq"], r["s"], r["e"], r["n_source"])
        for r in coalesce_intervals(df, key="k", start_col="s",
                                    end_col="e").collect()
    }
    assert got == _py_coalesce(rows)


def test_coalesce_intervals_single_exchange(spark):
    from golden_horse_spark.operators.temporal import coalesce_intervals

    df = spark.createDataFrame(
        [("a", 1, 5), ("a", 3, 8), ("a", 20, 22)], "k string, s long, e long"
    )
    out = coalesce_intervals(df, key="k", start_col="s", end_col="e")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # window + groupBy must share one hash exchange on the key
    assert plan.count("Exchange hashpartitioning") == 1


def test_scd2_apply_randomized_vs_python_reference(spark):
    """Random change batches applied sequentially; final versioned dim
    must equal a python SCD2 sweep — exercises change/no-op/insert and
    multi-version histories."""
    import random

    from golden_horse_spark.operators.temporal import scd2_apply, scd2_init

    rng = random.Random(424242)
    keys = [f"k{i}" for i in range(30)]
    snap0 = {k: rng.randrange(5) for k in keys[:20]}

    # python reference dim: key -> list of [attr, vfrom, vto, cur]
    ref = {k: [[v, 0, None, True]] for k, v in snap0.items()}

    dim = scd2_init(
        spark.createDataFrame(
            [(k, v) for k, v in snap0.items()], "k string, a long"
        ),
        0,
    )
    for ts in (1, 2, 3):
        batch = {
            k: rng.randrange(5)
            for k in rng.sample(keys, 12)
        }
        for k, v in batch.items():
            if k in ref and ref[k][-1][3] and ref[k][-1][0] == v:
                continue  # no-op
            if k in ref and ref[k][-1][3]:
                ref[k][-1][2] = ts
                ref[k][-1][3] = False
            ref.setdefault(k, []).append([v, ts, None, True])
        changes = spark.createDataFrame(
            [(k, v) for k, v in batch.items()], "k string, a long"
        )
        dim = scd2_apply(dim, changes, ["k"], ["a"], ts)

    got = {
        (r["k"], r["a"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in dim.collect()
    }
    want = {
        (k, a, vf, vt, cur)
        for k, vers in ref.items()
        for a, vf, vt, cur in vers
    }
    assert got == want
    # exactly one current version per live key; intervals chain
    for k, vers in ref.items():
        assert sum(1 for v in vers if v[3]) == 1


def test_compact_changelog_latest_wins_and_tombstones(spark):
    from golden_horse_spark.operators.temporal import compact_changelog

    rows = [
        # key a: I then U -> latest U survives
        ("a", 1, 10, "I", 1.0), ("a", 2, 11, "U", 2.0),
        # key b: latest is a delete -> vanishes
        ("b", 1, 20, "I", 3.0), ("b", 3, 21, "D", 0.0),
        # key c: ts tie broken by change id (cid 31 wins)
        ("c", 5, 30, "U", 4.0), ("c", 5, 31, "U", 5.0),
        # key d: delete then re-insert -> re-insert survives
        ("d", 1, 40, "D", 0.0), ("d", 2, 41, "I", 6.0),
    ]
    log = spark.createDataFrame(
        rows, "k string, ts long, cid long, op string, val double"
    )
    got = {
        (r["k"], r["cid"], r["op"], r["val"])
        for r in compact_changelog(
            log, ["k"], ts_col="ts", op_col="op", tiebreak_cols=["cid"]
        ).collect()
    }
    assert got == {
        ("a", 11, "U", 2.0),
        ("c", 31, "U", 5.0),
        ("d", 41, "I", 6.0),
    }


# ---------- Allen interval algebra join ----------


def _allen_py(l, r, max_gap=None):
    """Brute-force Allen classifier over closed [s, e] intervals."""
    ls, le, rs, re = l[1], l[2], r[1], r[2]
    if max_gap is None:
        if not (ls <= re and rs <= le):
            return None
    else:
        if rs - le > max_gap or ls - re > max_gap:
            return None
    if ls == rs and le == re:
        return "equals"
    if le < rs:
        return "before"
    if re < ls:
        return "after"
    # structural equal-boundary relations precede meets/met_by: for
    # proper intervals the families are disjoint; a degenerate point
    # interval satisfies both and classifies by its shared endpoint
    if ls == rs:
        return "starts" if le < re else "started_by"
    if le == re:
        return "finishes" if ls > rs else "finished_by"
    if le == rs:
        return "meets"
    if re == ls:
        return "met_by"
    if ls > rs and le < re:
        return "during"
    if ls < rs and le > re:
        return "contains"
    return "overlaps" if ls < rs else "overlapped_by"


_LIV = [
    # (lid, s, e) — engineered to hit every relation vs _RIV
    (0, 100, 200), (1, 300, 400), (2, 500, 600), (3, 700, 800),
    (4, 100, 150), (5, 120, 180), (6, 100, 130), (7, 170, 200),
    (8, 1000, 5000), (9, 2000, 2100),
]
_RIV = [
    (100, 100, 200), (101, 200, 300), (102, 50, 90), (103, 650, 660),
    (104, 100, 180), (105, 90, 210), (106, 110, 190), (107, 130, 200),
    (108, 2000, 2100), (109, 960, 5100),
]


def test_allen_join_all_relations(spark):
    from golden_horse_spark.operators.temporal import allen_join

    ldf = spark.createDataFrame(
        [("k",) + t for t in _LIV], "g string, lid int, ls long, le long"
    )
    rdf = spark.createDataFrame(
        [("k",) + t for t in _RIV], "g string, rid int, rs long, re long"
    )
    got = {
        (r["lid"], r["rid"]): r["relation"]
        for r in allen_join(
            ldf, rdf, on="g", l_start="ls", l_end="le",
            r_start="rs", r_end="re", bin_width=100.0,
        ).collect()
    }
    want = {}
    for l in _LIV:
        for r in _RIV:
            rel = _allen_py(l, r)
            if rel is not None:
                want[(l[0], r[0])] = rel
    assert got == want
    # the fixture really exercises the full algebra (minus disjoint)
    assert set(want.values()) >= {
        "equals", "meets", "met_by", "starts", "started_by", "finishes",
        "finished_by", "during", "contains", "overlaps", "overlapped_by",
    }


def test_allen_join_max_gap(spark):
    from golden_horse_spark.operators.temporal import allen_join

    ldf = spark.createDataFrame(
        [("k",) + t for t in _LIV], "g string, lid int, ls long, le long"
    )
    rdf = spark.createDataFrame(
        [("k",) + t for t in _RIV], "g string, rid int, rs long, re long"
    )
    got = {
        (r["lid"], r["rid"]): r["relation"]
        for r in allen_join(
            ldf, rdf, on="g", l_start="ls", l_end="le",
            r_start="rs", r_end="re", max_gap=120.0, bin_width=75.0,
        ).collect()
    }
    want = {}
    for l in _LIV:
        for r in _RIV:
            rel = _allen_py(l, r, max_gap=120)
            if rel is not None:
                want[(l[0], r[0])] = rel
    assert got == want
    assert "before" in want.values() and "after" in want.values()


def test_allen_join_key_isolation_and_guard(spark):
    import pytest as _pt

    from golden_horse_spark.operators.temporal import allen_join

    ldf = spark.createDataFrame(
        [("a", 0, 0, 10), ("b", 1, 0, 10)],
        "g string, lid int, ls long, le long",
    )
    rdf = spark.createDataFrame(
        [("a", 100, 5, 15)], "g string, rid int, rs long, re long"
    )
    rows = allen_join(
        ldf, rdf, on="g", l_start="ls", l_end="le",
        r_start="rs", r_end="re",
    ).collect()
    assert [(r["lid"], r["rid"], r["relation"]) for r in rows] == [
        (0, 100, "overlaps")
    ]
    with _pt.raises(ValueError, match="max_gap"):
        allen_join(
            ldf, rdf, on="g", l_start="ls", l_end="le",
            r_start="rs", r_end="re", max_gap=-1,
        )


# ---------- funnel analysis ----------


def test_funnel_first_touch_ordering(spark):
    import pytest as _pt

    from golden_horse_spark.operators.temporal import funnel

    rows = [
        # u1 completes signup -> view -> buy in order
        (1, 10, "signup"), (1, 20, "view"), (1, 30, "buy"),
        # u2: view BEFORE signup doesn't count; no view after -> stops at signup
        (2, 10, "view"), (2, 20, "signup"),
        # u3: signup, view, but buy is BEFORE the view -> stops at view
        (3, 5, "signup"), (3, 8, "buy"), (3, 9, "view"),
        # u4: repeated events — first qualifying occurrence used
        (4, 1, "signup"), (4, 2, "signup"), (4, 3, "view"),
        (4, 4, "view"), (4, 5, "buy"),
        # u5: never signs up
        (5, 1, "view"), (5, 2, "buy"),
        # u6: same-ts tie is NOT strictly after -> view doesn't count
        (6, 7, "signup"), (6, 7, "view"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts long, event_type string")
    got = {
        r["step"]: (r["event_type"], r["n_users"])
        for r in funnel(ev, ["signup", "view", "buy"]).collect()
    }
    assert got == {
        1: ("signup", 5),   # u1 u2 u3 u4 u6
        2: ("view", 3),     # u1 u3 u4
        3: ("buy", 2),      # u1 u4
    }
    with _pt.raises(ValueError, match="step"):
        funnel(ev, [])


def test_allen_join_randomized_vs_brute(spark):
    import random

    from golden_horse_spark.operators.temporal import allen_join

    rng = random.Random(41)
    for trial, (gap, bw) in enumerate(
        [(None, 50.0), (200.0, 130.0), (75.0, 40.0)]
    ):
        liv = [
            (i, s, s + rng.randint(0, 400))
            for i, s in enumerate(
                rng.randint(0, 1000) for _ in range(14)
            )
        ]
        riv = [
            (100 + i, s, s + rng.randint(0, 400))
            for i, s in enumerate(
                rng.randint(0, 1000) for _ in range(14)
            )
        ]
        ldf = spark.createDataFrame(
            [("k",) + t for t in liv], "g string, lid int, ls long, le long"
        )
        rdf = spark.createDataFrame(
            [("k",) + t for t in riv], "g string, rid int, rs long, re long"
        )
        got = {
            (r["lid"], r["rid"]): r["relation"]
            for r in allen_join(
                ldf, rdf, on="g", l_start="ls", l_end="le",
                r_start="rs", r_end="re", max_gap=gap, bin_width=bw,
            ).collect()
        }
        want = {}
        for l in liv:
            for r in riv:
                rel = _allen_py(l, r, max_gap=gap)
                if rel is not None:
                    want[(l[0], r[0])] = rel
        assert got == want, (trial, gap, bw)


def test_allen_join_plan_is_equi_join(spark):
    """allen_join must compile to an equi-join on (key, bin) — never
    the nested-loop theta-join shape that dies at scale."""
    from golden_horse_spark.operators.temporal import allen_join

    ldf = spark.createDataFrame(
        [("k", 0, 0, 10)], "g string, lid int, ls long, le long"
    )
    rdf = spark.createDataFrame(
        [("k", 1, 5, 15)], "g string, rid int, rs long, re long"
    )
    out = allen_join(
        ldf, rdf, on="g", l_start="ls", l_end="le",
        r_start="rs", r_end="re", max_gap=100.0,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_exchange_budgets_are_facts(spark):
    """The 'ONE hash exchange' claims in the operator docstrings are
    pinned against the executed plan (plans/audit.n_exchanges): asof /
    sessionize / coalesce_intervals schedule exactly one shuffle;
    salted_agg exactly its two phases; stratified_sample and
    pack_chunks one window exchange each."""
    from golden_horse_spark.operators.salting import salted_agg
    from golden_horse_spark.operators.temporal import (
        asof_join,
        coalesce_intervals,
        sessionize,
    )
    from golden_horse_spark.operators.text_analysis import (
        pack_chunks,
        stratified_sample,
    )
    from golden_horse_spark.plans.audit import n_exchanges

    ev = spark.createDataFrame(
        [(1, 10, 1.0), (1, 20, 2.0)], "user_id long, ts long, value double"
    )
    cl = spark.createDataFrame(
        [(1, 5, 9.0)], "user_id long, ts long, value double"
    )
    assert n_exchanges(
        asof_join(ev, cl, on="user_id", value_cols=["value"])
    )["shuffle"] == 1
    assert n_exchanges(sessionize(ev, key="user_id", gap=30.0))[
        "shuffle"
    ] == 1
    iv = spark.createDataFrame(
        [(1, 0, 10)], "user_id long, valid_from long, valid_to long"
    )
    assert n_exchanges(coalesce_intervals(iv, key="user_id"))[
        "shuffle"
    ] == 1
    li = spark.createDataFrame(
        [("A", 1.0), ("B", 3.0)], "k string, v double"
    )
    assert n_exchanges(
        salted_agg(li, ["k"], {"n": ("count", "v")}, salt_buckets=4)
    )["shuffle"] == 2
    docs = spark.createDataFrame(
        [(0, "a"), (1, "b")], "doc_id long, source string"
    )
    assert n_exchanges(stratified_sample(docs, "source", 1))[
        "shuffle"
    ] == 1
    d2 = spark.createDataFrame(
        [(0, "a b c", "s")], "doc_id long, text string, split string"
    )
    assert n_exchanges(
        pack_chunks(d2, budget=4, n_shards=2, partition_cols=("split",))
    )["shuffle"] == 1


def test_asof_join_rejects_unknown_direction(spark):
    """A misspelled direction silently fell back to backward semantics
    (round-5 review fix)."""
    from golden_horse_spark.operators.temporal import asof_join

    left = spark.createDataFrame([("k", 10)], "k string, ts long")
    right = spark.createDataFrame([("k", 5, 1.0)], "k string, ts long, v double")
    with pytest.raises(ValueError, match="direction"):
        asof_join(left, right, on="k", direction="Forward")


def test_compact_changelog_null_op_is_not_a_tombstone(spark):
    """A malformed NULL op on the newest row must keep the key in the
    snapshot (round-5 review fix: plain != evaluated NULL and the key
    silently vanished as if deleted)."""
    from golden_horse_spark.operators.temporal import compact_changelog

    log = spark.createDataFrame(
        [("k1", 1, "I", 10.0), ("k1", 2, None, 20.0),
         ("k2", 1, "I", 1.0), ("k2", 2, "D", 2.0)],
        "key string, ts long, op string, v double",
    )
    got = {r["key"]: r["v"] for r in
           compact_changelog(log, key_cols=("key",), ts_col="ts").collect()}
    assert got == {"k1": 20.0}


def test_allen_join_preserves_duplicate_input_rows(spark):
    """Two IDENTICAL left fact rows are two facts — each must pair with
    the matching right interval (round-5 review fix: the full-row
    distinct merged them; the canonical-bin dedup does not)."""
    from golden_horse_spark.operators.temporal import allen_join

    left = spark.createDataFrame(
        [("k", 100.0, 200.0), ("k", 100.0, 200.0)],
        "k string, ls double, le double",
    )
    right = spark.createDataFrame(
        [("k", 150.0, 250.0)], "k string, rs double, re double"
    )
    out = allen_join(left, right, on="k", l_start="ls", l_end="le",
                     r_start="rs", r_end="re", bin_width=50.0)
    rows = out.collect()
    assert len(rows) == 2
    assert all(r["relation"] == "overlaps" for r in rows)


def test_allen_join_degenerate_point_intervals(spark):
    """Point intervals classify by shared endpoint STRUCTURE, not as a
    bare touch (round-5 review fix: meets/met_by preceded the
    starts/finishes family in the when-chain)."""
    from golden_horse_spark.operators.temporal import allen_join

    left = spark.createDataFrame(
        [("a", 3.0, 3.0), ("b", 1.0, 3.0), ("c", 3.0, 3.0), ("d", 3.0, 5.0)],
        "k string, ls double, le double",
    )
    right = spark.createDataFrame(
        [("a", 3.0, 5.0), ("b", 3.0, 3.0), ("c", 1.0, 3.0), ("d", 3.0, 3.0)],
        "k string, rs double, re double",
    )
    got = {r["k"]: r["relation"] for r in allen_join(
        left, right, on="k", l_start="ls", l_end="le",
        r_start="rs", r_end="re", bin_width=10.0,
    ).collect()}
    assert got == {"a": "starts", "b": "finished_by",
                   "c": "finishes", "d": "started_by"}
