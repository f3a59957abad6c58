"""Graph operators over similarity/near-dup edge lists.

``connected_components`` (operators/dedup.py) handles cluster membership;
this module adds fixed-iteration PageRank — a centrality score over the
near-dup graph that surfaces "template hub" documents (one boilerplate
page near-duplicating hundreds of others scores high and is a removal
candidate for training corpora).

Scale shape per iteration: one equi-join of (edge, rank) + one sum
aggregate — shuffles 16-byte (id, contribution) rows, text never moves.
A FIXED iteration count (not run-to-convergence) keeps the operator
deterministic and SQL-expressible: the oracle unrolls the same
iterations as chained CTEs, so results hash-match exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank(
    pairs: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """PageRank over an undirected pair list (id_a, id_b), fixed
    ``iterations``; ranks start at 1.0. Returns (id, rank) for every
    node appearing in a pair, rank rounded to 6 decimals.

    Symmetric edges mean every node has out-degree ≥ 1 — no dangling
    mass correction needed."""
    edges = pairs.select(F.col("id_a").alias("a"), F.col("id_b").alias("b")).union(
        pairs.select(F.col("id_b").alias("a"), F.col("id_a").alias("b"))
    ).localCheckpoint(eager=True)
    deg = edges.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
    ranks = deg.select("a", F.lit(1.0).alias("r"))
    for _ in range(iterations):
        contrib = (
            edges.join(ranks, "a")
            .join(deg, "a")
            .select(F.col("b").alias("id"), (F.col("r") / F.col("deg")).alias("c"))
        )
        ranks = (
            contrib.groupBy("id")
            .agg((F.lit(1.0 - damping) + F.lit(damping) * F.sum("c")).alias("r"))
            .select(F.col("id").alias("a"), "r")
            .localCheckpoint(eager=True)
        )
    return ranks.select(F.col("a").alias("id"), F.round("r", 6).alias("rank"))
