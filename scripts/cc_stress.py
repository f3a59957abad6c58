"""Stress connected-components iteration scaling (r03 verdict #7).

Three workloads at ~1M edges on local[32]:
  1. chain-1M      — diameter 1e6: the propagation worst case (it would
                     need 1e6 rounds; we run star only).
  2. clusters-1M   — 250k shallow 5-node clusters (near-dup shape):
                     both algorithms.
  3. chain-4k      — diameter 4096 sanity point for star round count
                     (star only; propagation's must-raise contract at
                     this depth is pinned by tests/test_cc.py).

Prints one line per (workload, algorithm): rounds, wall seconds.
Feeds the SCALE.md "connected components at depth" section.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vector_lake_spark.operators.dedup import (
    connected_components,
    connected_components_star,
)
from vector_lake_spark.session import get_spark

spark = get_spark("cc_stress")
spark.sparkContext.setLogLevel("ERROR")


def run(name, algo, pairs, nodes, **kw):
    t0 = time.time()
    stats = {}
    if algo == "star":
        out = connected_components_star(pairs, nodes, stats=stats, **kw)
    else:
        out = connected_components(pairs, nodes, **kw)
    n_clusters = out.select("cluster_id").distinct().count()
    dt = time.time() - t0
    print(
        f"{name:14s} {algo:11s} rounds={stats.get('rounds', '-'):>3} "
        f"wall={dt:7.1f}s clusters={n_clusters}",
        flush=True,
    )


N = 1_000_000

# 1. deep chain: nodes 0..N, edges (i, i+1)
chain = spark.range(N).selectExpr("id AS id_a", "id + 1 AS id_b")
chain_nodes = spark.range(N + 1).withColumnRenamed("id", "doc_id")
run("chain-1M", "star", chain, chain_nodes, max_iter=60)

# 2. shallow clusters: 250k clusters x 4 edges star-shaped (hub = 5k)
cl = spark.range(N).selectExpr(
    "CAST(FLOOR(id / 4) * 5 AS BIGINT) AS id_a",
    "CAST(FLOOR(id / 4) * 5 + (id % 4) + 1 AS BIGINT) AS id_b",
)
cl_nodes = spark.range(1_250_000).withColumnRenamed("id", "doc_id")
run("clusters-1M", "star", cl, cl_nodes)
run("clusters-1M", "propagation", cl, cl_nodes)

# 3. diameter-4096 chain, star only: propagation would need 4096 rounds
#    (~20 min at ~0.3 s/round) and raises by design — the must-raise
#    contract is pinned by tests/test_cc.py instead
c4 = spark.range(4096).selectExpr("id AS id_a", "id + 1 AS id_b")
c4_nodes = spark.range(4097).withColumnRenamed("id", "doc_id")
run("chain-4k", "star", c4, c4_nodes)

# 4. power-law hot-hub graph (r04 verdict #8): a Zipf-ish attachment
#    graph where a handful of hub nodes absorb most edges — the skew
#    adversary for the star-contraction min-aggregates. min() is
#    partial-aggregable (map-side combine), so a hub key's traffic
#    collapses to one row per map partition regardless of degree.
#    dst = floor(u^8 * id) concentrates ~20% of ALL edges on node 0
#    (measured hub degree ~2e5 at 1M edges; avg degree ~1).
hub = spark.range(N).selectExpr(
    "id + 1 AS id_a",
    "CAST(FLOOR(pow(rand(7), 8) * id) AS BIGINT) AS id_b",
)
hub_nodes = spark.range(N + 1).withColumnRenamed("id", "doc_id")
run("powerlaw-1M", "star", hub, hub_nodes)

spark.stop()
