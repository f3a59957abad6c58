"""Persisted IVF index: partition pruning + recall contracts.

The IVF partition layout must behave as an index: probe queries read only
the probed centroid directories (PartitionFilters at planning time), a
full probe is exactly brute force, and a small probe keeps useful recall.
"""

import pytest

from vector_lake_spark import queries as Q
from vector_lake_spark.operators.ann import IVFIndex
from vector_lake_spark.operators.topk import topk_cosine
from vector_lake_spark.plans import plan_string

SF = "/root/testdata/sf0.001"
K = 10


@pytest.fixture(scope="module")
def ivf(spark, tmp_path_factory):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    loc = str(tmp_path_factory.mktemp("ivf") / "index")
    return IVFIndex.build(spark, loc, emb, n_centroids=16)


def _ids(df):
    return [r["vec_id"] for r in df.collect()]


def test_ivf_prunes_partitions(spark, ivf):
    df = ivf.topk(Q.QUERY_VEC, K, nprobe=2)
    plan = plan_string(df)
    assert "PartitionFilters" in plan
    assert "centroid_id" in plan.split("PartitionFilters")[1].split("\n")[0]


def test_ivf_full_probe_is_exact(spark, ivf):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    brute = _ids(topk_cosine(emb, Q.QUERY_VEC, K))
    full = _ids(ivf.topk(Q.QUERY_VEC, K, nprobe=16))
    assert full == brute


def test_ivf_partial_probe_recall(spark, ivf):
    """Recall vs brute force must grow with nprobe and stay useful at a
    half probe — deterministic given seed-42 k-means on the fixed
    testdata (measured: 0.3 / 0.4 / 0.8 at nprobe 2/4/8; the synthetic
    embeddings are near-uniform, the worst case for any locality index,
    so these are floor values)."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    brute = set(_ids(topk_cosine(emb, Q.QUERY_VEC, K)))

    def recall(nprobe):
        probed = set(_ids(ivf.topk(Q.QUERY_VEC, K, nprobe=nprobe)))
        return len(brute & probed) / K

    r4, r8 = recall(4), recall(8)
    assert r4 >= 0.3
    assert r8 >= 0.6
    assert r8 >= r4


def test_ivf_reopen_from_disk(spark, ivf):
    reopened = IVFIndex(spark, ivf.location)
    assert reopened.centroids == ivf.centroids
    assert _ids(reopened.topk(Q.QUERY_VEC, K, nprobe=16)) == _ids(
        ivf.topk(Q.QUERY_VEC, K, nprobe=16)
    )


def test_ivf_recall_on_clustered_embeddings(spark):
    """The uniform testdata is the worst case for any locality index; a
    realistic embedding corpus is clustered. On a seeded 20-component
    Gaussian mixture, a single-probe query must already recover most of
    the exact top-k (measured 0.96 mean recall scanning ~8% of rows —
    full curve in SCALE.md 'IVF recall/cost curve')."""
    import numpy as np

    rng = np.random.RandomState(7)
    dim, n_rows, n_clusters = 32, 2000, 20
    centers = rng.randn(n_clusters, dim)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.randint(0, n_clusters, n_rows)
    vecs = centers[assign] + 0.08 * rng.randn(n_rows, dim)
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in vecs[i]]) for i in range(n_rows)],
        "vec_id long, embedding array<double>",
    ).cache()

    from vector_lake_spark.operators.ann import ivf_build, ivf_topk

    assigned, centroids = ivf_build(df, n_centroids=16)
    assigned = assigned.cache()
    qs = centers[rng.randint(0, n_clusters, 10)] + 0.08 * rng.randn(10, dim)
    recalls = []
    for q in qs:
        brute = set(_ids(topk_cosine(df, q.tolist(), K)))
        got = set(_ids(ivf_topk(assigned, centroids, q.tolist(), K, nprobe=1)))
        recalls.append(len(brute & got) / K)
    assert sum(recalls) / len(recalls) >= 0.85
    df.unpersist()
    assigned.unpersist()


def test_append_equals_fresh_rebuild(spark, tmp_path):
    """Incremental maintenance (r05 verdict #3): with the pinned
    codebook, build(half) + append(half) must answer probes identically
    to a fresh build over the union — assignment is a pure function of
    (vector, codebook), so the partition layout converges to the same
    thing either way. The sidecar's counts track the appends and
    drift() vouches for them."""
    from vector_lake_spark.operators.ivf_centroids import IVF_CENTROIDS

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    first = emb.filter("vec_id % 2 = 0")
    second = emb.filter("vec_id % 2 = 1")

    inc_loc = str(tmp_path / "incremental")
    inc = IVFIndex.build(spark, inc_loc, first, centroids=IVF_CENTROIDS)
    report = inc.append(second)
    assert sum(report["appended"].values()) == second.count()
    assert report["drift"]["counts_match_sidecar"]
    assert report["drift"]["total_rows"] == emb.count()

    fresh_loc = str(tmp_path / "fresh")
    fresh = IVFIndex.build(spark, fresh_loc, emb, centroids=IVF_CENTROIDS)

    for nprobe in (2, 4, 16):
        assert _ids(inc.topk(Q.QUERY_VEC, K, nprobe=nprobe)) == _ids(
            fresh.topk(Q.QUERY_VEC, K, nprobe=nprobe)
        )

    # reopen sees the post-append counts; external mutation is detected
    reopened = IVFIndex(spark, inc_loc)
    assert reopened.drift()["counts_match_sidecar"]
    spark.read.parquet(f"{inc_loc}/data").limit(10).write.mode(
        "append"
    ).partitionBy("centroid_id").parquet(f"{inc_loc}/data")
    assert not reopened.drift()["counts_match_sidecar"]
