#!/usr/bin/env python3
"""Measure the binary-signature scan economics behind ``vec_topk_hamming``.

The registry query computes signatures inline (so the DuckDB oracle can
mirror the arithmetic), but the 100 TB posture is a PERSISTED signature
column: 2×BIGINT (16 B logical, 8 B of entropy) per vector instead of a
64-float array.  This script measures that posture directly:

1. Generate N synthetic 64-dim vectors; persist BOTH layouts —
   ``full/`` (vec_id, embedding array<double>) and ``sig/``
   (vec_id, two packed BIGINT halves) — as parquet.
2. Time coarse candidate generation over each layout:
   full-precision cosine top-50 scan over ``full/`` vs XOR+popcount
   Hamming top-50 over ``sig/`` (+ a 50-row join back to ``full/`` for
   the exact re-rank, i.e. the complete staged query).
3. Report parquet bytes at rest for each layout — the scan-volume ratio
   a 1000-executor cluster would see.

Timings are min-of-3 warm runs (same policy as bench.py store anchors).
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from vector_lake_spark.functions.vectors import (
    cosine_similarity,
    lit_vector,
    to_double_array,
)
from vector_lake_spark.operators.binary import (
    hamming_from_exprs,
    pack_query_sig,
    sig_exprs,
)
from vector_lake_spark.queries import QUERY_VEC
from vector_lake_spark.session import get_spark

N = int(os.environ.get("HAMMING_BENCH_N", 2_000_000))
POOL = 50
K = 10


def dir_bytes(path: str) -> int:
    return sum(
        os.path.getsize(p)
        for p in glob.glob(os.path.join(path, "**"), recursive=True)
        if os.path.isfile(p)
    )


def timed(fn, runs: int = 3) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    spark = get_spark()
    root = tempfile.mkdtemp(prefix="hamming_bench_")
    try:
        _run(spark, root)
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


def _run(spark, root: str) -> None:
    full_path, sig_path = f"{root}/full", f"{root}/sig"
    qsig = pack_query_sig(QUERY_VEC)

    # deterministic synthetic corpus (seeded rand, zero-centered dims so
    # signatures carry real entropy)
    vecs = spark.range(N).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[F.rand(seed=i) - F.lit(0.5) for i in range(64)]
        ).alias("embedding"),
    )
    vecs.write.mode("overwrite").parquet(full_path)

    full = spark.read.parquet(full_path)
    v = to_double_array(F.col("embedding"))

    # persisted-signature layout: computed ONCE at ingest with the shared
    # packing kernel (operators/binary.py — the SignatureIndex write)
    full.select(
        "vec_id",
        *[
            e.alias(f"sig_{h}")
            for h, e in enumerate(sig_exprs(v, len(QUERY_VEC)))
        ],
    ).write.mode("overwrite").parquet(sig_path)
    sigs = spark.read.parquet(sig_path)

    full_bytes, sig_bytes = dir_bytes(full_path), dir_bytes(sig_path)

    # (a) full-precision coarse scan: cosine over every float vector
    def cosine_scan():
        (
            full.select(
                "vec_id",
                F.round(
                    cosine_similarity(v, lit_vector(QUERY_VEC)), 6
                ).alias("score"),
            )
            .orderBy(F.col("score").desc(), "vec_id")
            .limit(POOL)
            .write.format("noop").mode("overwrite").save()
        )

    # (b) signature coarse scan + 50-row exact re-rank (the staged query)
    def hamming_staged():
        ham = hamming_from_exprs(
            [F.col("sig_0"), F.col("sig_1")], qsig
        )
        cand = (
            sigs.select("vec_id", ham.alias("hamming"))
            .orderBy(F.col("hamming").asc(), "vec_id")
            .limit(POOL)
        )
        exact = F.round(cosine_similarity(v, lit_vector(QUERY_VEC)), 6)
        (
            cand.join(full, "vec_id")
            .select("vec_id", exact.alias("score"))
            .orderBy(F.col("score").desc(), "vec_id")
            .limit(K)
            .write.format("noop").mode("overwrite").save()
        )

    t_cos = timed(cosine_scan)
    t_ham = timed(hamming_staged)

    print(f"N={N:,} rows")
    print(
        f"at-rest bytes: full={full_bytes/1e6:.1f} MB  "
        f"sig={sig_bytes/1e6:.1f} MB  ratio={full_bytes/sig_bytes:.1f}x"
    )
    print(f"coarse cosine scan (floats):        {t_cos:.2f} s")
    print(f"hamming scan + 50-row exact rerank: {t_ham:.2f} s")
    print(f"speedup: {t_cos/t_ham:.2f}x")


if __name__ == "__main__":
    main()
