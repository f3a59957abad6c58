"""IVF recall/cost curve: nprobe x n_centroids sweep (r04 verdict #6).

Two regimes, because the synthetic driver embeddings are near-uniform on
the sphere — the WORST case for any locality index — while production
embedding corpora are clustered (that is what makes them embeddings):

- ``uniform``: the driver's sf0.01 embeddings table as-is.
- ``clustered``: seeded Gaussian mixture (20 clusters, sigma=0.08) at the
  same row count/dimension — the realistic case.

For each (n_centroids, nprobe) cell we report mean recall@10 vs exact
brute force over N_QUERIES held-out queries drawn from the same
distribution, plus the scanned-fraction cost (rows in probed partitions /
total rows — at 100 TB this IS the I/O bill, since the index layout
prunes at planning time).

Output: a markdown table for SCALE.md. Run:
    python scripts/ivf_recall_curve.py [sf_dir]
"""

import sys

import numpy as np

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from vector_lake_spark.operators.ann import ivf_build, ivf_topk  # noqa: E402
from vector_lake_spark.operators.topk import topk_cosine  # noqa: E402
from vector_lake_spark.session import get_spark  # noqa: E402

K = 10
N_QUERIES = 20
CENTROID_GRID = [16, 64]
NPROBE_GRID = [1, 2, 4, 8]


def clustered_embeddings(spark, n_rows: int, dim: int, n_clusters: int = 20):
    rng = np.random.RandomState(7)
    centers = rng.randn(n_clusters, dim)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.randint(0, n_clusters, n_rows)
    vecs = centers[assign] + 0.08 * rng.randn(n_rows, dim)
    rows = [(int(i), [float(x) for x in vecs[i]]) for i in range(n_rows)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # held-out queries from the same mixture
    qassign = rng.randint(0, n_clusters, N_QUERIES)
    qs = centers[qassign] + 0.08 * rng.randn(N_QUERIES, dim)
    return df, [q.tolist() for q in qs]


def uniform_case(spark, sf_dir: str):
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    rng = np.random.RandomState(7)
    dim = len(df.select("embedding").first()[0])
    qs = rng.randn(N_QUERIES, dim)
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)
    return df, [q.tolist() for q in qs]


def sweep(spark, name: str, df, queries):
    df = df.cache()
    total = df.count()
    brute = {
        i: [r["vec_id"] for r in topk_cosine(df, q, K).collect()]
        for i, q in enumerate(queries)
    }
    print(f"\n### IVF recall@{K} — {name} ({total} rows, {len(queries)} queries)\n")
    print("| n_centroids | nprobe | scanned_frac | mean recall |")
    print("|---|---|---|---|")
    for n_c in CENTROID_GRID:
        assigned, centroids = ivf_build(df, n_centroids=n_c)
        assigned = assigned.cache()
        sizes = {
            r["centroid_id"]: r["n"]
            for r in assigned.groupBy("centroid_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        for nprobe in NPROBE_GRID:
            if nprobe > n_c:
                continue
            recalls, scanned = [], []
            for i, q in enumerate(queries):
                from vector_lake_spark.operators.ann import nearest_centroids

                probes = nearest_centroids(q, centroids, nprobe)
                scanned.append(sum(sizes.get(p, 0) for p in probes) / total)
                got = [
                    r["vec_id"]
                    for r in ivf_topk(assigned, centroids, q, K, nprobe=nprobe).collect()
                ]
                recalls.append(len(set(got) & set(brute[i])) / K)
            print(
                f"| {n_c} | {nprobe} | {np.mean(scanned):.3f} "
                f"| {np.mean(recalls):.2f} |"
            )
        assigned.unpersist()
    df.unpersist()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("ivf_recall_curve")
    udf_df, uq = uniform_case(spark, sf_dir)
    sweep(spark, f"uniform ({sf_dir})", udf_df, uq)
    n = udf_df.count()
    dim = len(udf_df.select("embedding").first()[0])
    cdf, cq = clustered_embeddings(spark, n, dim)
    sweep(spark, "clustered (20-component Gaussian mixture)", cdf, cq)


if __name__ == "__main__":
    main()
