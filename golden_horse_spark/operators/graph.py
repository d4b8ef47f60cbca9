"""Graph analytics over materialized KG tables: PageRank.

Second iterative graph operator beside connected components
(``canonicalize.connected_components``), with the same scale
discipline for relational iteration:

* the edge table (with out-degrees) is hash-partitioned on the PROBE
  key once and ``localCheckpoint``-pinned — every round's rank join
  reuses that exchange, so a round costs ONE shuffle (the contribution
  groupBy) instead of three;
* ``localCheckpoint`` per round keeps the plan O(1) in rounds;
* the only driver-side values are bounded scalars (node count, dangling
  rank mass — one double per round).

Dangling nodes (no out-edges) redistribute their mass uniformly, the
standard correction — without it rank mass leaks and sums drift below
1. Verified against a dense NumPy power iteration in tests/test_graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    n_iter: int = 10,
    num_partitions: int | None = None,
) -> DataFrame:
    """Directed edges(src, dst) → (node, rank), fixed ``n_iter`` power
    iterations (fixed count keeps the result deterministic for oracles;
    pass the symmetrized edge table for an undirected walk)."""
    spark = edges.sparkSession
    p = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))

    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).distinct()
    nodes = (
        e.select(F.col("s").alias("node"))
        .union(e.select(F.col("d").alias("node")))
        .distinct()
        .repartition(p, "node")
        .localCheckpoint()
    )
    n = nodes.count()
    deg = e.groupBy("s").agg(F.count("*").alias("deg"))
    ed = e.join(deg, "s").repartition(p, "s").localCheckpoint()
    has_out = deg.select(F.col("s").alias("node")).repartition(p, "node").localCheckpoint()

    # dangling MEMBERSHIP is static (who has out-edges never changes);
    # only its rank mass moves per round — so detect once, and a
    # symmetrized/dangling-free graph pays ZERO per-round driver jobs
    # for the correction
    dangling_nodes = (
        nodes.join(has_out, "node", "left_anti")
        .repartition(p, "node")
        .localCheckpoint()
    )
    n_dangling = dangling_nodes.count()

    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(n_iter):
        if n_dangling:
            dangling = (
                ranks.join(dangling_nodes, "node", "left_semi")
                .agg(F.sum("rank"))
                .first()[0]
                or 0.0
            )
        else:
            dangling = 0.0
        base = (1.0 - damping) / n + damping * dangling / n
        contribs = (
            ed.join(ranks.withColumnRenamed("node", "s"), "s")
            .select(
                F.col("d").alias("node"),
                (F.col("rank") / F.col("deg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("c"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("c"), F.lit(0.0))
                ).alias("rank"),
            )
            .repartition(p, "node")
            # lazy: the checkpoint still truncates the plan at the round
            # boundary, but on a dangling-free graph (no per-round
            # action) all rounds execute as ONE job wave instead of
            # n_iter eager materializations
            .localCheckpoint(eager=False)
        )
    return ranks
