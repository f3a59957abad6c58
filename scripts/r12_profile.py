#!/usr/bin/env python3
"""Per-query isolation harness for the r12 optimization round (guide §1).

For each named registry entry: build the DataFrame (plan-construction
cost), run `.explain("formatted")` (analysis+optimization cost, captured
to plans/r12/<name>_<tag>.txt), then execute N noop-sink runs (min =
engine cost). Prints one line per entry:

    name  build_s  explain_s  runs=[...]  min_s

Usage:
    python scripts/r12_profile.py [--tag before] [--runs 3] name [name...]
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vector_lake_spark import queries as Q
from vector_lake_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--plans-dir", default=os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r12"))
    args = ap.parse_args()

    os.makedirs(args.plans_dir, exist_ok=True)
    spark = get_spark("r12_profile")
    # warm: JVM + file listing + Python workers
    spark.read.parquet(f"{args.sf}/documents.parquet").count()

    for name in args.names:
        fn = Q.QUERIES[name]
        spark.sparkContext.setJobDescription(f"{name}: build+explain")
        t0 = time.perf_counter()
        df = fn(spark, args.sf)
        t1 = time.perf_counter()
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        t2 = time.perf_counter()
        with open(os.path.join(args.plans_dir, f"{name}_{args.tag}.txt"), "w") as f:
            f.write(buf.getvalue())
        runs = []
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"{name}: run {i}")
            r0 = time.perf_counter()
            # fresh plan per run, matching bench.py methodology
            fn(spark, args.sf).write.mode("overwrite").format("noop").save()
            runs.append(round(time.perf_counter() - r0, 3))
        print(
            f"{name:28s} build={t1-t0:6.3f} explain={t2-t1:6.3f} "
            f"runs={runs} min={min(runs):.3f}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
