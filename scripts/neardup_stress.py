"""At-scale stress for the banded-LSH near-dup + semantic-dedup path.

sf0.1 holds 2k embeddings; this synthesizes 100x (200k rows, dim 64) by
replicating with per-replica deterministic perturbation (pure expressions,
seeded by (vec_id, replica)), then measures:
  - banded lsh_neardup_pairs: wall, emitted pairs
  - end-to-end semantic dedup (pairs -> star CC): wall, clusters

Feeds SCALE.md "Dedup family" evidence that the banded join + star CC
hold when the corpus no longer fits a toy plan.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from vector_lake_spark import queries as Q
from vector_lake_spark.operators.ann import lsh_neardup_pairs
from vector_lake_spark.operators.dedup import connected_components_star
from vector_lake_spark.session import get_spark

REPLICAS = int(os.environ.get("STRESS_REPLICAS", "100"))
# band depth is THE scale knob: shallow bands (registry's band_bits=2,
# tuned for recall at the 0.35 toy threshold) make per-bucket cliques of
# corpus/(shards*2^bits) rows -- at 200k near-identical rows that candidate
# set exceeds local disk (measured: spill ENOSPC at >80 GB). Deep bands
# (band_bits=6) cut bucket width 16x and the same corpus completes locally.
# "auto" = the r10 registry default (band_bits=None -> ann.auto_band_bits
# sizes the width from the corpus: 2 at <=16k rows, 6 at 200k)
_bb_env = os.environ.get("STRESS_BAND_BITS", "auto")
BAND_BITS = None if _bb_env == "auto" else int(_bb_env)

spark = get_spark("neardup_stress")
spark.sparkContext.setLogLevel("ERROR")

emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
n0 = emb.count()

# replicate with a deterministic +-0.5% per-dim perturbation so replicas
# are near-duplicates of their source row (the realistic dedup shape)
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
                + (F.pmod(F.xxhash64(F.col("vec_id"), F.col("rep"), i), F.lit(1000))
                   - 500.0) / 100_000.0
            ),
        ).alias("embedding"),
    )
    .repartition(64)
    .localCheckpoint(eager=True)  # materialize so generation cost is excluded
)
n = big.count()
print(f"corpus: {n0} -> {n} rows, dim 64, band_bits={BAND_BITS}", flush=True)

t0 = time.time()
pairs = lsh_neardup_pairs(
    big,
    Q.H4,
    threshold=Q.NEARDUP_COS_THRESHOLD,
    n_bands=Q.NEARDUP_N_BANDS,
    band_bits=BAND_BITS,
    # replica-heavy corpus = DENSE candidates: vectors must ride the
    # bucket join (the default narrow strategy's pair-keyed vector
    # shuffle measured >80 GB spill here -> ENOSPC)
    carry_vectors=os.environ.get("STRESS_CARRY_VECTORS", "1") == "1",
)
n_pairs = pairs.count()
t_pairs = time.time() - t0
print(f"lsh_neardup_pairs: {n_pairs} pairs in {t_pairs:.1f}s", flush=True)

t0 = time.time()
stats = {}
labels = connected_components_star(
    pairs, big.select("vec_id"), id_col="vec_id", stats=stats
)
n_clusters = labels.select("cluster_id").distinct().count()
t_cc = time.time() - t0
print(
    f"star CC: {n_clusters} clusters, rounds={stats.get('rounds')}, "
    f"{t_cc:.1f}s (end-to-end {t_pairs + t_cc:.1f}s)",
    flush=True,
)
spark.stop()
