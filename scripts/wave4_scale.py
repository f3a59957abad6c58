#!/usr/bin/env python3
"""Scaling measurement for the wave-4 analytics ops (r06).

Benches the seven wave-4 queries on the statistically-matched generated
data (`scripts/gen_testdata.py`) at mult=1 (≈sf0.1) and mult=10 (≈sf1),
plus the five event ops at mult=100 events (localdata/sf10ev), printing
the wall ratio per 10× data step — the same methodology as BASELINE.md's
"sf1 scaling" section (min of N runs, noop sink, local[32]).

Usage: SPARK_GRAFT_CPUS=32 python scripts/wave4_scale.py [runs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vector_lake_spark import queries as Q
from vector_lake_spark.session import get_spark

DOC_OPS = ["pipe_weighted_sample", "text_entropy"]
EV_OPS = [
    "ev_trend_per_user",
    "ev_anomaly_mad",
    "ev_transition_matrix",
    "ev_twap",
    "drift_psi",
]

TIERS = [
    ("mult1", "localdata/sf0.1gen", DOC_OPS + EV_OPS),
    ("mult10", "localdata/sf1", DOC_OPS + EV_OPS),
    ("mult100ev", "localdata/sf10ev", EV_OPS),
]


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    results: dict[str, dict[str, float]] = {}
    for tier, rel, ops in TIERS:
        sf = os.path.join(root, rel)
        if not os.path.isdir(sf):
            print(f"skip {tier}: {sf} missing")
            continue
        for name in ops:
            best = float("inf")
            for _ in range(runs):
                t0 = time.time()
                Q.QUERIES[name](spark, sf).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.time() - t0)
            results.setdefault(name, {})[tier] = round(best, 3)
            print(f"{tier:10s} {name:24s} {best:.3f}s", flush=True)

    print("\n| query | mult1 s | mult10 s | ratio | mult100ev s | ratio/step |")
    print("|---|---|---|---|---|---|")
    for name, r in results.items():
        m1, m10 = r.get("mult1"), r.get("mult10")
        m100 = r.get("mult100ev")
        r10 = round(m10 / m1, 1) if m1 and m10 else "-"
        r100 = round(m100 / m10, 1) if m10 and m100 else "-"
        print(
            f"| {name} | {m1} | {m10} | {r10}× | "
            f"{m100 if m100 is not None else '-'} | {r100}× |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
