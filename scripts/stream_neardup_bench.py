"""Throughput probe for the three streaming near-dup ingest variants
(SCALE.md "Events / streaming" evidence, r05 verdict #1; hybrid ladder
r07 verdict #6):

  - stateful  : stream_neardup_candidates (applyInPandasWithState,
                numpy-vectorized kernel, state grows with corpus)
  - bounded   : NearDupIngest (foreachBatch + parquet band-key history,
                zero streaming state)
  - hybrid    : HybridNearDup with a TTL SHORTER than the stream so
                evictions fire mid-run (hot stateful kernel + parquet
                eviction history + new-vs-evicted recovery join); the
                emitted pair set must still equal the other two

Corpus: the statistically-matched generated embeddings from
``scripts/gen_testdata.py`` — ``localdata/sf0.1gen`` (2k rows, dim 64)
and ``localdata/sf1`` (20k rows) — the SAME inputs the r05 SCALE.md
numbers used, so rounds compare like-for-like. Each run drains the
corpus as 4 parquet files / 4 micro-batches with availableNow and
reports wall + emitted candidate pairs (both variants must emit the
identical pair set; asserted).
"""

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from vector_lake_spark import queries as Q
from vector_lake_spark.functions.vectors import to_double_array
from vector_lake_spark.session import get_spark
from vector_lake_spark.streaming.neardup import (
    HybridNearDup,
    NearDupIngest,
    banded_keys,
    stream_neardup_candidates,
)

spark = get_spark("stream_neardup_bench")
spark.sparkContext.setLogLevel("ERROR")

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def corpus(sub):
    return spark.read.parquet(
        f"{ROOT}/localdata/{sub}/embeddings.parquet"
    ).select("vec_id", to_double_array(F.col("embedding")).alias("embedding"))


def keyed_stream(src):
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    shard, bkeys = banded_keys(
        F.col("embedding"), Q.H4, Q.NEARDUP_BANDS
    )
    return stream.select(
        "vec_id", shard.alias("shard"), bkeys.alias("bkeys")
    )


def run_stateful(src):
    cands = stream_neardup_candidates(
        keyed_stream(src), Q.NEARDUP_N_BANDS, state_ttl_ms=None  # bounded bench
    )
    name = f"sb_{int(time.time() * 1000)}"
    q = (
        cands.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def run_bounded(src, tmp):
    ingest = NearDupIngest(
        spark, f"{tmp}/history", f"{tmp}/pairs", Q.NEARDUP_N_BANDS
    )
    ingest.run(keyed_stream(src), checkpoint=f"{tmp}/ckpt")
    return ingest.pairs()


def run_hybrid(src, tmp):
    """TTL 1s vs a multi-second 4-micro-batch run: buckets untouched for
    one batch interval evict mid-stream, so the recovery join is load-
    bearing, not idle. Returns (pairs_df, n_evicted_rows)."""
    hybrid = HybridNearDup(
        spark,
        f"{tmp}/h_history",
        f"{tmp}/h_pairs",
        Q.NEARDUP_N_BANDS,
        state_ttl_ms=1_000,
    )
    hybrid.run(keyed_stream(src), checkpoint=f"{tmp}/h_ckpt")
    hist = spark.read.parquet(f"{tmp}/h_history")
    return hybrid.pairs(), hist.count()


def summarize(pairs_df):
    """(count, order-insensitive checksum) computed DISTRIBUTED — the
    equality evidence without collecting millions of pairs to the
    driver (driver collection would dominate the wall being measured)."""
    row = pairs_df.agg(
        F.count(F.lit(1)).alias("n"),
        # pmod keeps the per-pair term < 2^30 so the ANSI long sum can
        # never overflow at any realistic pair count
        F.sum(F.pmod(F.xxhash64("id_a", "id_b"), F.lit(1 << 30))).alias("ck"),
    ).collect()[0]
    return row["n"], row["ck"]


for label, df in [("2k", corpus("sf0.1gen")), ("20k", corpus("sf1"))]:
    tmp = tempfile.mkdtemp(prefix=f"snb_{label}_")
    src = f"{tmp}/src"
    df.repartition(4).write.parquet(src)
    n = spark.read.parquet(src).count()

    t0 = time.time()
    n_state, ck_state = summarize(run_stateful(src))
    t_state = time.time() - t0

    t0 = time.time()
    n_bound, ck_bound = summarize(run_bounded(src, tmp))
    t_bound = time.time() - t0

    t0 = time.time()
    hybrid_pairs, n_evicted = run_hybrid(src, tmp)
    n_hyb, ck_hyb = summarize(hybrid_pairs)
    t_hyb = time.time() - t0

    assert (n_state, ck_state) == (n_bound, ck_bound), (
        f"variant disagreement at {label}: "
        f"{(n_state, ck_state)} vs {(n_bound, ck_bound)}"
    )
    assert (n_state, ck_state) == (n_hyb, ck_hyb), (
        f"hybrid disagreement at {label}: "
        f"{(n_state, ck_state)} vs {(n_hyb, ck_hyb)}"
    )
    assert n_evicted > 0, (
        f"hybrid ladder at {label} measured nothing: no evictions fired "
        f"(TTL not shorter than the stream?)"
    )
    print(
        f"{label}: {n} rows, {n_state} pairs | "
        f"stateful {t_state:.1f}s ({n / t_state:.0f} rows/s) | "
        f"bounded {t_bound:.1f}s ({n / t_bound:.0f} rows/s) | "
        f"hybrid {t_hyb:.1f}s ({n / t_hyb:.0f} rows/s, "
        f"{n_evicted} evicted bucket rows)",
        flush=True,
    )
    shutil.rmtree(tmp, ignore_errors=True)

spark.stop()
