"""SimHash near-dup pair-join ladder (r12, VERDICT r11 #1) — evidence
that unifying ``simhash_neardup_pairs`` onto the banded-Hamming
machinery removed the repo's last fixed-band-width cliff.

The legacy path pinned 4×15-bit bands over the 60-bit fingerprint, so
per-band bucket density grew as n/2¹⁵ — fine at the 500k-doc rung
class, quadratic at multi-million docs. The unified path
(``binary.hamming_neardup_pairs`` with ``total_bits=60`` and
``auto_hamming_blocks`` sizing) keeps the identical exact pair set at
every block count (pigeonhole) and lets the sizer trade candidate
probes against table count from ONE corpus count.

This ladder measures the CANDIDATE-JOIN stage the flag was about —
synthetic 60-bit fingerprints (xxhash64 masked to 60 bits; tokenizing
multi-million real documents would measure the tokenizer, not the
join), planted near-dup clusters: every 100th id spawns 3 neighbors at
Hamming distance 1..3 (flip positions (id·7 + j·13) % 60, stride
13 ⟂ 60 keeps flips distinct).

Rungs at 1M / 5M / 11M rows — past the ≥5–10M regime the r11 verdict
named as the legacy cliff. At these sizes the auto sizer still
resolves to the minimal 4-block config (its measured candidate budget
2·10¹¹ ≈ 13 min of XOR probing is crossed only near ~40M uniform
rows), so the rung ALSO validates that minimal blocks are genuinely
cheap here: expected candidates 4·n²/2¹⁵ ≈ 1.5·10¹⁰ at 11M rows →
~60 s of probing at the measured 2.5·10⁸/s codegen rate. Pass
STRESS_BLOCKS to pin a wider layout and compare.

Feeds SCALE.md "SimHash near-dup at multi-million docs".
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from vector_lake_spark.operators.binary import (
    auto_hamming_blocks,
    hamming_neardup_pairs,
)
from vector_lake_spark.session import get_spark

spark = get_spark("simhash_stress")
spark.sparkContext.setLogLevel("ERROR")

SIZES = [
    int(x) for x in os.environ.get(
        "STRESS_SIZES", "1000000,5000000,11000000"
    ).split(",")
]
RADIUS = int(os.environ.get("STRESS_RADIUS", "3"))
BLOCKS = os.environ.get("STRESS_BLOCKS")

for n in SIZES:
    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.xxhash64(F.col("id"))
        .bitwiseAND(F.lit((1 << 60) - 1))
        .alias("simhash"),
    )
    seeds = base.filter(F.col("doc_id") % 100 == 0)
    planted = seeds.crossJoin(
        F.broadcast(spark.range(1, 4).withColumnRenamed("id", "d"))
    ).selectExpr(
        f"doc_id + {n}L * d AS doc_id",
        "aggregate(sequence(0, int(d - 1)), simhash, (acc, j) -> "
        "acc ^ shiftleft(1L, int((doc_id * 7 + j * 13) % 60))) "
        "AS simhash",
    )
    sigs = base.unionAll(planted).repartition(64).localCheckpoint(
        eager=True
    )
    total = sigs.count()
    blocks = (
        int(BLOCKS)
        if BLOCKS
        else auto_hamming_blocks(total, RADIUS, total_bits=60)
    )
    t0 = time.time()
    n_pairs = hamming_neardup_pairs(
        sigs,
        radius=RADIUS,
        sig_col="simhash",
        id_col="doc_id",
        n_blocks=blocks,
        total_bits=60,
    ).count()
    print(
        f"simhash pairs n={total} radius={RADIUS} blocks={blocks} "
        f"(key bits={(60 // blocks) * (blocks - RADIUS)}): "
        f"{n_pairs} pairs in {time.time()-t0:.1f}s",
        flush=True,
    )

spark.stop()
