"""At-scale ladder for the perceptual image near-dup stack (r10).

Two measurements, matching how the stack splits at 100 TB:

1. FULL ENTRY (decode + hash + pair join) over the generated document
   corpora (localdata/sf0.1gen = 2k docs, localdata/sf1 = 20k): the
   codec work is embarrassingly parallel, so this rung shows the Arrow
   stage scaling ~linearly.
2. PAIR JOIN ONLY over synthetic signatures at 200k / 2M rows: random
   base signatures (xxhash64 of the id — realistic non-clustered
   background) with planted near-dup clusters (every 100th id spawns
   9 neighbors at Hamming distance 1..9, so recall work exists at
   every rung). Measured conclusions (SCALE.md "Image near-dup
   ladder"): minimal blocks (radius+1) win at every measured point —
   codegen streams candidate probes at ~2.5e8/s while every extra
   combination table multiplies a key-array-carrying sort — so
   `auto_hamming_blocks` stays minimal until the candidate estimate
   itself exceeds ~13 min of probing. Radius <= 4 (the re-encode/
   resize dup regime) is cheap at any measured scale; radius 7 at 2M
   uniform rows is candidate-bound (311 s) and the honest fix is a
   wider signature or a smaller radius, not more tables.

Set STRESS_CONFIGS to sweep, e.g. "7:8,7:9,3:4,3:5" (radius:blocks).
Feeds SCALE.md "Image near-dup ladder".
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from vector_lake_spark import queries as Q
from vector_lake_spark.operators.binary import hamming_neardup_pairs
from vector_lake_spark.session import get_spark

spark = get_spark("imagehash_stress")
spark.sparkContext.setLogLevel("ERROR")

for name, d in [("mult1", "localdata/sf0.1gen"), ("mult10", "localdata/sf1")]:
    if not os.path.isdir(d):
        print(f"{name}: {d} missing, skipped", flush=True)
        continue
    n = spark.read.parquet(f"{d}/documents.parquet").count()
    t0 = time.time()
    got = Q.q_mm_image_neardup(spark, d)
    got.write.mode("overwrite").format("noop").save()
    print(f"{name} full entry: {n} docs in {time.time()-t0:.1f}s", flush=True)

CONFIGS = [
    tuple(int(x) for x in c.split(":"))
    for c in os.environ.get("STRESS_CONFIGS", "7:8,3:4").split(",")
]

for name, n in [("200k", 200_000), ("2M", 2_000_000)]:
    # base: pseudo-random signature per id, bit 63 cleared so the SQL
    # twin (if ever needed) stays in signed range like the fixture
    base = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.xxhash64(F.col("id")).bitwiseAND(F.lit((1 << 63) - 1)).alias("sig"),
    )
    # planted clusters: every 100th id gets 9 neighbors at distance 1..9
    # (ids offset by n), flipping bit (id % 64)... bits d distinct flips
    seeds = base.filter(F.col("media_id") % 100 == 0)
    planted = seeds.crossJoin(
        F.broadcast(spark.range(1, 10).withColumnRenamed("id", "d"))
    ).selectExpr(
        f"media_id + {n}L * d AS media_id",
        # flip d consecutive bit positions starting at media_id % 50
        "aggregate(sequence(0, int(d - 1)), sig, (acc, j) -> "
        "acc ^ shiftleft(1L, int(media_id % 50) + j)) AS sig",
    )
    sigs = base.unionAll(planted).repartition(64).localCheckpoint(eager=True)
    total = sigs.count()
    for radius, blocks in CONFIGS:
        t0 = time.time()
        n_pairs = hamming_neardup_pairs(
            sigs, radius=radius, n_blocks=blocks
        ).count()
        print(
            f"pairs-only {name} radius={radius} blocks={blocks}: "
            f"{total} sigs -> {n_pairs} pairs in {time.time()-t0:.1f}s",
            flush=True,
        )

spark.stop()
