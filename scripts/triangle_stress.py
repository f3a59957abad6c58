"""Adversarial triangle-census stress on a power-law hot-hub graph
(r05 verdict #7) — proves the degree-oriented wedge join avoids the d²
hub blow-up ON a graph that actually has one. Feeds SCALE.md "Graph
family".

Graph: the cc_stress powerlaw-1M shape, made deterministic (hash-based
attachment instead of rand): ~1M edges where node 0 absorbs a large
constant fraction — hub degree ~2×10⁵ while the average degree is ~2.

Measured:
  1. wedge count under NAIVE id-orientation (each edge points
     low-id → high-id): Σ_v C(outdeg(v), 2). The hub orients most of
     its edges outward → ~C(2e5, 2) ≈ 2×10¹⁰ wedges — the join that
     must never run.
  2. wedge count under DEGREE orientation (triangle_stats's rule: each
     edge points lower-(degree, id) → higher): out-degrees are bounded
     by ~sqrt(m), the hub is a wedge center only for its few
     higher-degree neighbors.
  3. the full degree-oriented census, end to end, with wall — the plan
     that 100 TB similarity graphs would run.

Both wedge counts are computed analytically (one aggregation each);
only the safe orientation's join executes.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from vector_lake_spark.operators.graph import triangle_stats
from vector_lake_spark.session import get_spark

N = int(os.environ.get("STRESS_EDGES", "1000000"))

spark = get_spark("triangle_stress")
spark.sparkContext.setLogLevel("ERROR")

# deterministic power-law attachment: u = hash(id)/2^64 in [0,1),
# dst = floor(u^8 * id) — node 0 receives ~a fifth of all edges.
# A second, uniform attachment per node closes actual triangles
# (i — hub — dst2(i) closes whenever dst2(i) also hits the hub), so the
# census has real work to count, not just wedges to avoid.
hub_edge = (
    "CAST(FLOOR(pow((CAST(xxhash64(id) AS DOUBLE) / 18446744073709551616.0)"
    " + 0.5, 8) * id) AS BIGINT)"
)
uni_edge = (
    "CAST(FLOOR(((CAST(xxhash64(id, 2) AS DOUBLE) / 18446744073709551616.0)"
    " + 0.5) * id) AS BIGINT)"
)
base = spark.range(1, N // 2 + 1)
raw = base.selectExpr("id AS id_a", f"{hub_edge} AS id_b").unionAll(
    base.selectExpr("id AS id_a", f"{uni_edge} AS id_b")
)
edges = (
    raw.filter("id_a <> id_b")
    .selectExpr("LEAST(id_a, id_b) AS id_a", "GREATEST(id_a, id_b) AS id_b")
    .distinct()
    .localCheckpoint(eager=True)
)
m = edges.count()
hub_deg = (
    edges.selectExpr("id_a AS n")
    .unionAll(edges.selectExpr("id_b AS n"))
    .groupBy("n")
    .count()
    .orderBy(F.col("count").desc())
    .limit(1)
    .collect()[0]
)
print(f"edges={m}  hub node {hub_deg['n']} degree={hub_deg['count']}")


def wedge_count(oriented):
    """Σ_v C(outdeg(v), 2) for an oriented edge list (src, dst)."""
    return (
        oriented.groupBy("src")
        .agg(F.count(F.lit(1)).alias("d"))
        .agg(F.sum(F.expr("d * (d - 1) / 2")).alias("w"))
        .collect()[0]["w"]
    )


naive = edges.selectExpr("id_a AS src", "id_b AS dst")  # low-id -> high-id
w_naive = wedge_count(naive)

deg = (
    edges.selectExpr("id_a AS node")
    .unionAll(edges.selectExpr("id_b AS node"))
    .groupBy("node")
    .agg(F.count(F.lit(1)).alias("deg"))
)
e = (
    edges.join(deg.selectExpr("node AS id_a", "deg AS da"), "id_a")
    .join(deg.selectExpr("node AS id_b", "deg AS db"), "id_b")
)
a_first = (F.col("da") < F.col("db")) | (
    (F.col("da") == F.col("db")) & (F.col("id_a") < F.col("id_b"))
)
oriented = e.select(
    F.when(a_first, F.col("id_a")).otherwise(F.col("id_b")).alias("src"),
    F.when(a_first, F.col("id_b")).otherwise(F.col("id_a")).alias("dst"),
)
w_deg = wedge_count(oriented)
print(
    f"wedges: naive id-orientation {w_naive:.3e} | "
    f"degree-orientation {w_deg:.3e} | ratio {w_naive / max(w_deg, 1):.0f}x"
)

t0 = time.time()
stats = triangle_stats(edges).collect()[0]
print(
    f"degree-oriented census: {stats['n_triangles']} triangles over "
    f"{stats['n_edges']} edges in {time.time() - t0:.1f}s "
    f"(the naive join at {w_naive:.1e} wedges is never executed)"
)

spark.stop()
