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
    "vec_neardup_pairs",
    "vec_centroid_by_label",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_minhash",
    "text_stats_by_lang",
    "text_quality",
    "text_token_top20",
    "q1_pricing",
    "q3_top_orders",
    "q5_nation_revenue",
    "agg_rollup",
    "win_running_total",
    "win_top3_per_nation",
    "join_anti",
    "ev_tumbling",
    "ev_sliding",
    "ev_sessionize",
    "mm_binary_stats",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("vector_lake_spark_bench")

    # warmup: JVM/codegen/file-listing
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = Q.QUERIES[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        timings[name] = round(time.perf_counter() - t0, 3)

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
