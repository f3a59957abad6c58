#!/usr/bin/env python3
"""Scaling measurement for the r06 retrieval wave (r06 verdict #6).

Benches the PQ / IVF-PQ / RRF / MaxSim / batched-hamming retrieval
entries, plus the new ann_lsh_recall audit, on the statistically-matched
generated embeddings (`scripts/gen_testdata.py`) at mult=1 (≈sf0.1,
2k vectors) and mult=10 (≈sf1, 20k vectors) — same methodology as
`wave4_scale.py` (min of N runs, noop sink, local[32]).

Usage: SPARK_GRAFT_CPUS=32 python scripts/retrieval_scale.py [runs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vector_lake_spark import queries as Q
from vector_lake_spark.session import get_spark

OPS = [
    "vec_topk_pq",
    "ann_ivfpq_topk",
    "vec_topk_rrf",
    "vec_maxsim_topk",
    "vec_topk_hamming_batch",
    "ann_lsh_recall",
]

TIERS = [
    ("mult1", "localdata/sf0.1gen"),
    ("mult10", "localdata/sf1"),
]


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    results: dict[str, dict[str, float]] = {}
    for tier, rel in TIERS:
        sf = os.path.join(root, rel)
        if not os.path.isdir(sf):
            print(f"skip {tier}: {sf} missing")
            continue
        for name in OPS:
            best = float("inf")
            for _ in range(runs):
                t0 = time.time()
                Q.QUERIES[name](spark, sf).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.time() - t0)
            results.setdefault(name, {})[tier] = round(best, 3)
            print(f"{tier:8s} {name:24s} {best:.3f}s", flush=True)
    print()
    for name, vals in results.items():
        if "mult1" in vals and "mult10" in vals and vals["mult1"] > 0:
            ratio = vals["mult10"] / vals["mult1"]
            print(f"{name:24s} mult1 {vals['mult1']:.3f}s  "
                  f"mult10 {vals['mult10']:.3f}s  ratio {ratio:.2f}x")
    spark.stop()


if __name__ == "__main__":
    main()
