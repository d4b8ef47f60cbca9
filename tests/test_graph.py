"""PageRank vs a dense NumPy power iteration (operators/graph.py)."""

import numpy as np
from pyspark.sql import functions as F

from golden_horse_spark.operators.graph import pagerank


def _numpy_pagerank(edges, n_nodes, damping=0.85, n_iter=10):
    """Dense reference: same fixed-iteration scheme incl. dangling
    redistribution."""
    out = {}
    for s, d in edges:
        out.setdefault(s, set()).add(d)
    r = np.full(n_nodes, 1.0 / n_nodes)
    for _ in range(n_iter):
        dangling = sum(r[v] for v in range(n_nodes) if v not in out)
        base = (1 - damping) / n_nodes + damping * dangling / n_nodes
        new = np.full(n_nodes, base)
        for s, ds in out.items():
            for d in ds:
                new[d] += damping * r[s] / len(ds)
        r = new
    return r


def test_pagerank_matches_numpy_with_dangling(spark):
    # node 3 is dangling; node 0 is a hub
    edges = [(0, 1), (0, 2), (1, 0), (2, 0), (2, 3), (4, 0)]
    df = spark.createDataFrame(edges, "src int, dst int")
    got = {
        r["node"]: r["rank"] for r in pagerank(df, n_iter=10).collect()
    }
    want = _numpy_pagerank(edges, 5, n_iter=10)
    assert set(got) == set(range(5))
    for v in range(5):
        assert abs(got[v] - want[v]) < 1e-9, (v, got[v], want[v])
    # rank mass is conserved (dangling correction)
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_symmetric_star(spark):
    # undirected star: center rank > leaves, leaves equal
    edges = [(0, i) for i in range(1, 5)]
    sym = edges + [(d, s) for s, d in edges]
    df = spark.createDataFrame(sym, "src int, dst int")
    got = {r["node"]: r["rank"] for r in pagerank(df, n_iter=10).collect()}
    leaves = [got[i] for i in range(1, 5)]
    assert got[0] > max(leaves)
    assert max(leaves) - min(leaves) < 1e-12


def test_triangle_count_known_and_random(spark):
    from itertools import combinations
    import random

    from golden_horse_spark.operators.graph import triangle_count

    def brute(edges):
        es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
        nodes = {n for e in es for n in e}
        return sum(
            1
            for tri in combinations(sorted(nodes), 3)
            if all(tuple(sorted(p)) in es for p in combinations(tri, 2))
        )

    # K4 = 4 triangles; star = 0 (hub contributes no wedges after
    # degree orientation); plus 10 random graphs
    cases = [
        [(a, b) for a in range(4) for b in range(4) if a < b],
        [(0, i) for i in range(1, 8)],
    ]
    rng = random.Random(3)
    for _ in range(10):
        n = rng.randint(4, 12)
        cases.append(
            [
                (rng.randint(0, n - 1), rng.randint(0, n - 1))
                for _ in range(rng.randint(3, 30))
            ]
        )
    for edges in cases:
        if not edges:
            continue
        df = spark.createDataFrame(edges, "src int, dst int")
        got = triangle_count(df).head()["n_triangles"]
        assert got == brute(edges), (edges, got)


def test_triangle_plan_no_cartesian(spark):
    from golden_horse_spark.operators.graph import triangle_count

    df = spark.createDataFrame(
        [(i, (i + 1) % 50) for i in range(50)], "src int, dst int"
    )
    plan = triangle_count(df)._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_k_core_vs_python_peel(spark):
    import random

    from golden_horse_spark.operators.graph import k_core

    def peel(edges, k):
        adj = {}
        for a, b in {tuple(sorted(e)) for e in edges if e[0] != e[1]}:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        changed = True
        while changed:
            changed = False
            for n in list(adj):
                if len(adj[n]) < k:
                    for m in adj.pop(n):
                        adj[m].discard(n)
                    changed = True
        return set(adj)

    # K5 + a tail chain: the 4-core is exactly the K5; chain peels away
    k5 = [(a, b) for a in range(5) for b in range(5) if a < b]
    tail = [(4, 10), (10, 11), (11, 12)]
    got = {r["node"] for r in k_core(
        spark.createDataFrame(k5 + tail, "src int, dst int"), k=4
    ).collect()}
    assert got == {0, 1, 2, 3, 4}

    rng = random.Random(5)
    for trial in range(5):
        n = rng.randint(6, 14)
        edges = [
            (rng.randint(0, n - 1), rng.randint(0, n - 1))
            for _ in range(rng.randint(5, 40))
        ]
        for k in (2, 3):
            got = {
                r["node"]
                for r in k_core(
                    spark.createDataFrame(edges, "src int, dst int"), k=k
                ).collect()
            }
            assert got == peel(edges, k), (trial, k, edges)
