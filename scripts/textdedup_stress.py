"""Text-dedup pipeline stress at 100× the driver's sf0.1 (r05).

500k documents (scripts/gen_testdata.py --mult 100) through the full
scale-posture dedup pipeline:

  5-word shingle Jaccard pairs (the deep-shingle config the sf1 scaling
  analysis measured — candidates near-linear on the fixed-vocab
  synthetic corpus, vs quadratic at 3-word shingles; BASELINE.md
  "sf1 scaling") → star-contraction connected components → keep-best
  representative per cluster.

Prints pair count, cluster rounds, survivor count, and per-stage wall.
Feeds the SCALE.md dedup section. Run:

    python scripts/gen_testdata.py --out localdata/sf10 --mult 100 --skip-events
    python scripts/textdedup_stress.py localdata/sf10
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from vector_lake_spark.operators.dedup import (
    connected_components_star,
    ngram_jaccard_pairs,
)
from vector_lake_spark.session import get_spark

SHINGLE_N = 5
THRESHOLD = 0.5
MAX_SHINGLE_FREQ = 1000


def main():
    base = sys.argv[1] if len(sys.argv) > 1 else "localdata/sf10"
    spark = get_spark("textdedup_stress")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{base}/documents.parquet").select(
        "doc_id", "text"
    )
    n_docs = docs.count()
    spread = spark.sparkContext.defaultParallelism
    print(f"docs={n_docs}", flush=True)

    t0 = time.time()
    pairs = ngram_jaccard_pairs(
        docs,
        n=SHINGLE_N,
        threshold=THRESHOLD,
        max_shingle_freq=MAX_SHINGLE_FREQ,
        repartition_input=spread,
    ).localCheckpoint(eager=True)
    n_pairs = pairs.count()
    t_pairs = time.time() - t0
    print(f"pairs={n_pairs} wall={t_pairs:.1f}s", flush=True)

    t0 = time.time()
    nodes = docs.select("doc_id")
    stats: dict = {}
    labels = connected_components_star(
        pairs.select(F.col("id_a"), F.col("id_b")), nodes, stats=stats
    )
    n_clusters = labels.select("cluster_id").distinct().count()
    t_cc = time.time() - t0
    print(
        f"cc rounds={stats.get('rounds')} clusters={n_clusters} "
        f"wall={t_cc:.1f}s",
        flush=True,
    )

    t0 = time.time()
    survivors = (
        labels.groupBy("cluster_id")
        .agg(F.min("doc_id").alias("keep_id"))
        .count()
    )
    print(
        f"survivors={survivors} wall={time.time() - t0:.1f}s "
        f"total={t_pairs + t_cc:.1f}s",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
