#!/usr/bin/env python3
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the noop sink (full execution, no
driver-side collect bottleneck).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from vector_lake_spark import queries as Q
from vector_lake_spark.session import get_spark

HEADLINE = [
    "vec_topk_cosine",
    "vec_topk_batch",
    "lsh_shard_hist",
    "ann_lsh_topk",
    "hybrid_topk",
    # near-dup headline is the LSH shard-bucketed scale path; the O(n²)
    # exact variant (vec_neardup_pairs) stays oracle-checked but is a
    # small-sf baseline, not a headline (VERDICT r01 #5)
    "vec_neardup_lsh",
    "ann_ivf_topk",
    "ann_ivf_stored",
    "ann_ivf_quantized",
    "vec_topk_pq",
    "ann_ivfpq_topk",
    "vec_centroid_by_label",
    "vec_dim_stats",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_jaccard_deep",
    "dedup_containment",
    "dedup_clusters",
    "dedup_simhash",
    # dedup_minhash (Spark ML approxSimilarityJoin) stays registry/oracle-
    # covered but out of the headline: the native-expression variant below
    # computes the same banding ~2x faster and is the recommended path
    "dedup_minhash_native",
    "graph_triangles",
    "graph_knn_mutual",
    "text_stats_by_lang",
    "text_boilerplate_ngrams",
    "text_quality",
    "text_token_top20",
    "text_tfidf_top20",
    "pipe_clean_corpus",
    "pipe_pack_sequences",
    "pipe_contamination",
    "pipe_stratified_sample",
    "pipe_domain_mix",
    "pipe_shuffle_shards",
    "text_redact_pii",
    "text_repetition",
    "text_chunk_windows",
    "pipe_quality_filter",
    "pipe_curation_e2e",
    "text_lm_surprisal",
    "ev_anomaly_zscore",
    "vec_semantic_dedup",
    "vec_quantize_int8",
    "q1_pricing",
    "q3_top_orders",
    "q5_nation_revenue",
    "q7_nation_volume",
    "q10_returned_items",
    "q13_customer_distribution",
    "q18_large_orders",
    # r06 decathlon completions — the heavier three (Q2 correlated min,
    # Q9 five-table profit, Q21 semi+anti self-joins)
    "q2_min_cost_supplier",
    "q9_product_profit",
    "q21_waiting_suppliers",
    "agg_rollup",
    "win_running_total",
    "win_top3_per_nation",
    "join_anti",
    "ev_tumbling",
    "ev_sliding",
    "ev_sessionize",
    "ev_gapfill_locf",
    "mm_binary_stats",
    # r06 serving-layer additions
    "ev_rollup_merge",
    "ev_stream_rollup",
    "ev_status_islands",
    "cdc_latest_state",
    "sketch_distinct_users",
    "sketch_value_percentiles",
    "zorder_events",
    # r06 wave 2: SCD2 history rebuild, incremental join-agg view
    # maintenance, late-interaction multi-vector scoring
    "cdc_scd2_intervals",
    "cdc_diff_snapshots",
    "ev_stream_scd2",
    "ivm_join_agg",
    "vec_maxsim_topk",
    # r06 wave 3: binary-signature retrieval, rank fusion, data mixing
    "vec_topk_hamming",
    "vec_topk_hamming_stored",
    "vec_topk_hamming_batch",
    "vec_hamming_recall",
    "ann_ivf_recall",
    # r07 wave 5: audit completion (LSH + PQ recall), embedding OOD,
    # Zipf corpus health, dedup funnel report, sketch-merged rolling DAU
    "ann_lsh_recall",
    "vec_pq_recall",
    "vec_ood_score",
    "text_zipf_fit",
    "pipe_dedup_report",
    "sketch_rolling_dau",
    # r07: CMS heavy hitters, exact-overlap decontamination, GIF codec
    # round trip at table scale
    "sketch_heavy_hitters",
    "pipe_decontaminate",
    "mm_gif_roundtrip",
    "mm_media_probe",
    # r08: all-three-container mux+probe, WebP header math, VP8L codec
    "mm_container_probe",
    "mm_webp_probe",
    "mm_webp_roundtrip",
    "mm_wav_depths",
    "mm_webp_anim",
    "mm_flac_roundtrip",
    "pipe_warc_extract",
    "text_html_extract",
    # r09: tiled/striped TIFF codec matrix, composed crawl front door,
    # 12-bit extended-sequential JPEG
    "mm_tiff_roundtrip",
    "pipe_crawl_e2e",
    "mm_jpeg12_roundtrip",
    "mm_rle8_roundtrip",
    "pipe_url_dedup",
    "text_gopher_rules",
    # late r09: audio-probe pair (route-without-decode for crawl audio)
    "mm_mp3_probe",
    "mm_ogg_probe",
    # r10: perceptual image near-dup (dHash -> banded-Hamming pairs),
    # EXIF probe, and the composed rotate-before-hash pipeline
    "mm_image_neardup",
    "mm_exif_probe",
    "mm_image_orient",
    # r11: wide (256-bit) perceptual signatures, the composed image
    # curation pipeline, and the audio + video fingerprint near-dup legs
    "mm_image_neardup_wide",
    "pipe_image_dedup_e2e",
    "mm_audio_neardup",
    "mm_video_neardup",
    # r12: long-form (windowed) audio near-dup, the DCT pHash leg, and
    # the repeated-span duplication audit
    "mm_audio_neardup_long",
    "mm_image_phash",
    "pipe_span_dedup",
    "dq_lineitem_report",
    "vec_topk_rrf",
    "pipe_token_budget",
    "pipe_temperature_mix",
    # r06 wave 4: weighted selection, per-key trends, entropy quality,
    # robust anomalies, sequence transitions, TWAP, drift monitoring
    "pipe_weighted_sample",
    "ev_trend_per_user",
    "text_entropy",
    "ev_anomaly_mad",
    "ev_transition_matrix",
    "ev_twap",
    "drift_psi",
]


def bench_store(spark, timings: dict, runs: int = 2) -> None:
    """Store lifecycle vs the reference's measured anchor (BASELINE.md):
    ingest 50k dim-5 vectors (reference: ~32s at 1,544 vec/s + 0.65s
    persist) and a 1000-query routed batch against the same store
    (reference: 5.5 ms/query warm → 5.5s for 1000)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from vector_lake_spark.store import SparkVectorLake

    loc = tempfile.mkdtemp(prefix="vlake_bench_") + "/lake"
    lake = SparkVectorLake(spark, loc, dimension=5, approx_shards=243)

    t0 = time.perf_counter()
    vecs = spark.range(50_000).select(
        F.col("id").cast("string").alias("id"),
        F.array(*[F.rand(seed=i) for i in range(5)]).alias("vector"),
    )
    lake.add_dataframe(vecs)
    lake.persist()
    timings["store_ingest_50k"] = round(time.perf_counter() - t0, 3)

    queries = spark.range(1_000).select(
        F.col("id").alias("query_id"),
        F.array(*[F.rand(seed=100 + i) for i in range(5)]).alias("qv"),
    )
    # warm the Python workers (Arrow scoring path) before timing — the
    # reference anchor is explicitly the WARM per-query latency
    # (BASELINE.md: "Query latency (warm)") — then min over the same
    # number of runs as the headline queries (single-shot timing is
    # hostage to host contention spikes)
    lake.query_batch(queries.limit(10), k=4).write.mode("overwrite").format(
        "noop"
    ).save()
    best = None
    # this is the one entry compared head-to-head against the reference's
    # measured anchor — floor of 3 runs so a single host-contention spike
    # (observed 1.9-10s for identical code) can't masquerade as engine cost
    for _ in range(max(runs, 3)):
        t0 = time.perf_counter()
        lake.query_batch(queries, k=4).write.mode("overwrite").format(
            "noop"
        ).save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    timings["store_query_batch_1k"] = round(best, 3)
    shutil.rmtree(loc, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("vector_lake_spark_bench")

    # warmup: JVM/codegen/file-listing (lineitem absent in self-generated
    # scale dirs — scripts/gen_testdata.py emits docs/embeddings/events)
    warm = (
        "lineitem"
        if os.path.exists(f"{sf_dir}/lineitem.parquet")
        else "documents"
    )
    spark.read.parquet(f"{sf_dir}/{warm}.parquet").count()

    # min over N runs: the container shows heavy run-to-run variance from
    # host CPU contention (same query: 1.5-8.5s across runs); the minimum
    # reflects engine cost rather than neighbor noise. Default 5 per the
    # r03 verdict. Scale runs (self-generated sf1 dirs via
    # scripts/gen_testdata.py, r05) use BENCH_RUNS=2 + the query subset
    # below; results in BASELINE.md "sf1 scaling".
    runs = max(1, int(os.environ.get("BENCH_RUNS", "5")))
    # optional subset (comma-separated query names): the sf1+ scaling
    # bench runs only the >=1s entries against self-generated data dirs
    # that carry docs/embeddings/events but no TPC-H tables
    subset_env = os.environ.get("SPARK_GRAFT_BENCH_QUERIES", "")
    subset = [q for q in subset_env.split(",") if q] or None
    if subset:
        unknown = [q for q in subset if q not in HEADLINE and q != "store"]
        if unknown:
            raise SystemExit(
                f"SPARK_GRAFT_BENCH_QUERIES names not in the bench "
                f"headline: {unknown} — a typo here would otherwise "
                f"bench nothing and report total=0 as if measured"
            )
    headline = [q for q in HEADLINE if subset is None or q in subset]
    timings: dict[str, float] = {}
    for name in headline:
        fn = Q.QUERIES[name]
        best = None
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    if subset is None or "store" in subset:
        bench_store(spark, timings, runs)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
