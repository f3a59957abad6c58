"""Wide-signature (256-bit, 4×int64) Hamming pair-join ladder (r11,
VERDICT r10 #4) — the rung that closes the 64-bit cliff.

SCALE.md "Image near-dup ladder" measured radius 7 on 64-bit dHash at
2.18M uniform rows as candidate-bound (311 s: minimal blocks carry
8-bit keys, so expected candidates ≈ 8·n²/2⁸). The honest guidance
there was "a wider signature"; this script measures it: the same
planted-cluster corpus shape, but 256-bit signatures, radius 7 minimal
config (b=8) → **32-bit block keys**, expected candidates ≈ 8·n²/2³².
Rungs at 2.18M and 10.9M rows — the second is PAST the corpus size
SCALE.md names as the 64-bit regime edge (≥10M).

Background: 4 independent xxhash64 longs per id (bit 63 of each long
cleared to stay in the fixture's signed-base convention); planted
clusters: every 100th id spawns 9 neighbors at Hamming distance 1..9,
flips spread across the 256-bit space (bit (id*7 + j*37) % 255 —
stride 37 ⟂ 255 keeps the d flips distinct).

Feeds SCALE.md "Image near-dup ladder" (wide rung).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from vector_lake_spark.operators.binary import hamming_neardup_pairs
from vector_lake_spark.session import get_spark

spark = get_spark("widehash_stress")
spark.sparkContext.setLogLevel("ERROR")

SIZES = [
    int(x) for x in os.environ.get(
        "STRESS_SIZES", "2180000,10900000"
    ).split(",")
]
RADIUS = int(os.environ.get("STRESS_RADIUS", "7"))
BLOCKS = int(os.environ.get("STRESS_BLOCKS", "8"))

for n in SIZES:
    base = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.array(
            *[
                F.xxhash64(F.col("id"), F.lit(j))
                .bitwiseAND(F.lit((1 << 63) - 1))
                for j in range(4)
            ]
        ).alias("sig"),
    )
    seeds = base.filter(F.col("media_id") % 100 == 0)
    planted = seeds.crossJoin(
        F.broadcast(spark.range(1, 10).withColumnRenamed("id", "d"))
    ).selectExpr(
        f"media_id + {n}L * d AS media_id",
        # flip d bits at positions (media_id*7 + j*37) % 255, j=0..d-1
        # (each position lands in long p/64, bit p%64)
        "transform(sig, (s, li) -> aggregate(sequence(0, int(d - 1)), s, "
        "(acc, j) -> CASE WHEN int((media_id * 7 + j * 37) % 255) div 64 "
        "= li THEN acc ^ shiftleft(1L, int((media_id * 7 + j * 37) % 255) "
        "% 64) ELSE acc END)) AS sig",
    )
    sigs = base.unionAll(planted).repartition(64).localCheckpoint(
        eager=True
    )
    total = sigs.count()
    t0 = time.time()
    n_pairs = hamming_neardup_pairs(
        sigs, radius=RADIUS, n_blocks=BLOCKS, n_longs=4
    ).count()
    print(
        f"wide pairs-only n={total} radius={RADIUS} blocks={BLOCKS} "
        f"(key bits={(256 // BLOCKS) * (BLOCKS - RADIUS)}): "
        f"{n_pairs} pairs in {time.time()-t0:.1f}s",
        flush=True,
    )

spark.stop()
