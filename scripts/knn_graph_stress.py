"""mult100 rung for the k-NN similarity-graph family AT THE REGISTRY
CONFIG (r11, VERDICT r10 #1).

r10 fixed vec_semantic_dedup's shallow-band density cliff by auto-sizing
band_bits from the corpus; the graph family's shared candidate stage
(queries._knn_candidate_pairs) kept the pinned shallow width until r11.
SCALE.md's existing "Similarity graph at 200k rows" rung was measured
under the PRODUCTION posture (8×6-bit bands) — this script measures the
registry posture itself: threshold-free banded candidates
(NEARDUP_N_BANDS bands, band_bits=None → ann.auto_band_bits) feeding
knn_edges(k=3), mutual k-NN, and the degree-oriented triangle census,
on the same 100×-replicated sf0.1 embedding corpus neardup_stress uses
(200k rows, dim 64, replicas are near-dups of their source).

Feeds SCALE.md "Similarity graph at 200k rows (registry config)".
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from vector_lake_spark import queries as Q
from vector_lake_spark.operators.ann import lsh_neardup_pairs
from vector_lake_spark.operators.graph import knn_edges, triangle_stats
from vector_lake_spark.session import get_spark

REPLICAS = int(os.environ.get("STRESS_REPLICAS", "100"))

spark = get_spark("knn_graph_stress")
spark.sparkContext.setLogLevel("ERROR")

emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
r = spark.range(REPLICAS).withColumnRenamed("id", "rep")
big = (
    emb.crossJoin(F.broadcast(r))
    .select(
        (F.col("vec_id") + F.col("rep") * 1_000_000).alias("vec_id"),
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x, i: x
            * (
                1.0
                + (F.pmod(F.xxhash64(F.col("vec_id"), F.col("rep"), i),
                          F.lit(1000)) - 500.0) / 100_000.0
            ),
        ).alias("embedding"),
    )
    .repartition(64)
    .localCheckpoint(eager=True)
)
n = big.count()
print(f"corpus: {n} rows, dim 64, registry config "
      f"(n_bands={Q.NEARDUP_N_BANDS}, band_bits=auto)", flush=True)


def candidates():
    return lsh_neardup_pairs(
        big,
        Q.H4,
        threshold=-2.0,
        n_bands=Q.NEARDUP_N_BANDS,
        band_bits=None,
        carry_vectors=True,
    )


t0 = time.time()
n_edges = knn_edges(candidates(), Q.GRAPH_KNN_K).count()
t1 = time.time()
print(f"graph_knn_edges: {n_edges} edges in {t1-t0:.1f}s", flush=True)

t0 = time.time()
n_mutual = knn_edges(candidates(), Q.GRAPH_KNN_K, mutual=True).count()
t1 = time.time()
print(f"graph_knn_mutual: {n_mutual} edges in {t1-t0:.1f}s", flush=True)

t0 = time.time()
stats = triangle_stats(knn_edges(candidates(), Q.GRAPH_KNN_K)).collect()
t1 = time.time()
print(f"graph_triangles: {stats[0].asDict()} in {t1-t0:.1f}s", flush=True)

spark.stop()
