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
    # r06 wave 2
    "cdc_scd2_intervals",
    "vec_maxsim_topk",
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


def ivm_stress(spark, base_n=5_000_000, delta_n=50_000, n_cust=100_000):
    """The IVM claim measured directly: with the base partials
    MATERIALIZED, refreshing the join-agg view for a fixed-size delta
    must cost the same whether the fact history is N or 10N — while the
    full recompute grows with the history.  Synthetic orders/customer
    (uniform keys/dates) at base_n and 10*base_n; delta fixed."""
    from pyspark.sql import functions as F

    out = tempfile.mkdtemp(prefix="ivm_stress_")

    def gen_orders(n, seed_off=0):
        return spark.range(n).select(
            (F.col("id") + seed_off).alias("o_orderkey"),
            F.pmod(F.xxhash64(F.col("id") + seed_off), F.lit(n_cust)).alias(
                "o_custkey"
            ),
            (
                F.pmod(F.xxhash64(F.col("id") + seed_off + 1), F.lit(10000))
                / 100.0
            ).alias("o_totalprice"),
            F.timestamp_seconds(
                F.lit(788918400)  # 1995-01-01
                + F.pmod(
                    F.xxhash64(F.col("id") + seed_off + 2),
                    F.lit(200_000_000),
                )
            ).alias("o_orderdate"),
        )

    cust = spark.range(n_cust).select(
        F.col("id").alias("c_custkey"),
        F.concat(
            F.lit("SEG"), F.pmod(F.col("id"), F.lit(5)).cast("string")
        ).alias("c_mktsegment"),
    )
    cust.write.parquet(out + "/customer")
    cust = spark.read.parquet(out + "/customer")
    month = F.date_format("o_orderdate", "yyyy-MM")

    def partial(facts):
        return (
            facts.join(F.broadcast(cust), facts["o_custkey"] == cust["c_custkey"])
            .groupBy(month.alias("month"), "c_mktsegment")
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.sum("o_totalprice").alias("rev"),
            )
        )

    delta = gen_orders(delta_n, seed_off=10**9)
    delta.write.parquet(out + "/delta")
    delta = spark.read.parquet(out + "/delta")

    print(
        f"ivm stress (delta fixed at {delta_n} rows; customer {n_cust}):"
    )
    try:
        for mult in (1, 20):
            n = base_n * mult
            gen_orders(n).write.parquet(out + f"/orders_{mult}")
            base = spark.read.parquet(out + f"/orders_{mult}")
            # materialize the base partials once (the persisted view)
            partial(base).write.parquet(out + f"/partials_{mult}")
            partials = spark.read.parquet(out + f"/partials_{mult}")

            t0 = time.perf_counter()
            (
                partials.unionByName(partial(delta))
                .groupBy("month", "c_mktsegment")
                .agg(F.sum("cnt").alias("n"), F.sum("rev").alias("rev"))
                .count()
            )
            refresh = time.perf_counter() - t0

            t0 = time.perf_counter()
            (
                partial(base.unionByName(delta))
                .groupBy("month", "c_mktsegment")
                .agg(F.sum("cnt").alias("n"), F.sum("rev").alias("rev"))
                .count()
            )
            recompute = time.perf_counter() - t0
            print(
                f"  base {n:>9d} rows: incremental refresh {refresh:5.2f}s"
                f"   full recompute {recompute:5.2f}s"
            )
    finally:
        shutil.rmtree(out, ignore_errors=True)


def scd2_stress(spark, sf1="localdata/sf1", n_batches=10, n_buckets=32):
    """Fold sf1 events through SCD2Ingest in time-ordered batches and
    report the per-batch wall — flat means batch cost doesn't grow with
    accumulated history (worst case here: few entities, so every batch
    touches every bucket and rewrites the whole table)."""
    from pyspark.sql import functions as F

    from vector_lake_spark.sources import normalize_event_ts
    from vector_lake_spark.streaming.scd2 import SCD2Ingest

    e = normalize_event_ts(
        spark.read.parquet(f"{sf1}/events.parquet")
    ).localCheckpoint(eager=True)
    n = e.count()
    cuts = e.approxQuantile(
        "event_id", [i / n_batches for i in range(1, n_batches)], 0.0
    )
    work = tempfile.mkdtemp(prefix="scd2_stress_")
    ingest = SCD2Ingest(
        spark, work + "/iv", work + "/quar", n_buckets=n_buckets
    )
    lo, walls = None, []
    try:
        for i, c in enumerate(cuts + [None]):
            cond = (
                F.lit(True) if lo is None else F.col("event_id") > F.lit(lo)
            )
            if c is not None:
                cond = cond & (F.col("event_id") <= F.lit(c))
            b = e.filter(cond).localCheckpoint(eager=True)
            t0 = time.perf_counter()
            ingest.process_batch(b, i)
            walls.append(time.perf_counter() - t0)
            lo = c
        rows = ingest.intervals().count()
    finally:
        shutil.rmtree(work, ignore_errors=True)
    print(
        f"scd2 fold stress ({n} events, {n_batches} batches, "
        f"{n_buckets} buckets): walls "
        + " ".join(f"{w:.2f}" for w in walls)
        + f"  -> {rows} interval rows"
    )


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
    ivm_stress(spark)
    scd2_stress(spark, sf1)
    spark.stop()


if __name__ == "__main__":
    main()
