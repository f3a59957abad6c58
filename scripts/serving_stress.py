#!/usr/bin/env python3
"""Scaling measurement for the r06 serving-layer family.

Times the six new registry entries at sf0.1 (driver data, events 100k)
and sf1 (self-generated 10x, localdata/sf1, events 1M), reporting the
10x-wall ratio per query — sub-linear-to-linear is the pass bar (all
are one-or-two-exchange plans).

Also measures the Z-order layout job itself at 4M rows (256x256 grid,
64 rows per cell) and counts, from parquet footer stats alone, how many
files a mid-domain point predicate on EACH dimension could prune —
z-order should leave only ~sqrt(n_files) files matching per dimension,
the naive layout none.

Usage: python scripts/serving_stress.py
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from vector_lake_spark.session import get_spark
from vector_lake_spark import queries as Q

QUERIES = [
    "ev_rollup_merge",
    "ev_status_islands",
    "cdc_latest_state",
    "sketch_distinct_users",
    "sketch_user_overlap",
    "zorder_events",
]


def time_query(spark, name, sf_dir, reps=2):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        Q.QUERIES[name](spark, sf_dir).count()
        best = min(best, time.perf_counter() - t0)
    return best


def layout_stress(spark, n_files=16, n=256, per_cell=64):
    grid = spark.range(n * n * per_cell).select(
        ((F.col("id") / per_cell).cast("long") % n).alias("x"),
        (F.col("id") / (n * per_cell)).cast("long").alias("y"),
        F.col("id").alias("payload"),
    )
    from vector_lake_spark.operators.layout import zorder_layout

    out = tempfile.mkdtemp(prefix="layout_stress_")
    try:
        t0 = time.perf_counter()
        zorder_layout(grid, F.col("x"), F.col("y"), n_files).write.parquet(
            out + "/z"
        )
        z_wall = time.perf_counter() - t0
        t0 = time.perf_counter()
        grid.repartition(n_files).write.parquet(out + "/naive")
        naive_wall = time.perf_counter() - t0

        def files_matching(path, col, point):
            """Files whose footer [min,max] contains the point — the files
            a reader must open for `col = point`; the rest are pruned."""
            total = match = 0
            for f in glob.glob(path + "/*.parquet"):
                md = pq.ParquetFile(f).metadata
                idx = {
                    md.schema.column(i).name: i
                    for i in range(md.num_columns)
                }[col]
                lo = min(
                    md.row_group(rg).column(idx).statistics.min
                    for rg in range(md.num_row_groups)
                )
                hi = max(
                    md.row_group(rg).column(idx).statistics.max
                    for rg in range(md.num_row_groups)
                )
                total += 1
                match += int(lo <= point <= hi)
            return match, total

        mid = n // 2
        zx = files_matching(out + "/z", "x", mid)
        zy = files_matching(out + "/z", "y", mid)
        nx = files_matching(out + "/naive", "x", mid)
        ny = files_matching(out + "/naive", "y", mid)
        rows = n * n * per_cell
        print(f"layout stress ({rows} rows, {n_files} files):")
        print(f"  zorder write wall {z_wall:.1f}s  naive write wall {naive_wall:.1f}s")
        print(f"  files a point-predicate must open — x={mid}: zorder {zx[0]}/{zx[1]}, naive {nx[0]}/{nx[1]}")
        print(f"                                      y={mid}: zorder {zy[0]}/{zy[1]}, naive {ny[0]}/{ny[1]}")
    finally:
        shutil.rmtree(out, ignore_errors=True)


def main():
    spark = get_spark("serving_stress")
    spark.sparkContext.setLogLevel("ERROR")
    sf01 = os.environ.get("SF01", "/root/testdata/sf0.1")
    sf1 = os.environ.get("SF1", "localdata/sf1")
    print(f"{'query':26s} {'sf0.1':>8s} {'sf1':>8s} {'10x ratio':>9s}")
    for name in QUERIES:
        a = time_query(spark, name, sf01)
        b = time_query(spark, name, sf1)
        print(f"{name:26s} {a:8.2f} {b:8.2f} {b / a:9.1f}")
    layout_stress(spark)
    spark.stop()


if __name__ == "__main__":
    main()
