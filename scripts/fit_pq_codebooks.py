"""Regenerate the pinned product-quantization codebooks.

PQ splits the dim-64 embedding into M=8 contiguous 8-dim subvectors and
learns K=16 centroids per subspace (seeded numpy Lloyd's k-means on the
sf0.01 embeddings — deterministic, no sklearn dependency). The fitted
codebooks are frozen as source literals
(``vector_lake_spark/operators/pq_codebooks.py``) so PQ encode / ADC
scoring is a pure deterministic expression in BOTH engines — the same
pinning discipline as the IVF codebook (``fit_ivf_centroids.py``): the
iterative fit stays offline (at 100 TB: fit on a sample once, encode
the corpus with a fixed codebook forever — re-fitting would silently
re-encode history).

Run: ``python scripts/fit_pq_codebooks.py``  (rewrites the module in place)
"""

import os

import numpy as np
import pyarrow.parquet as pq

SF_DIR = os.environ.get("SPARK_GRAFT_FIT_SF", "/root/testdata/sf0.01")
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "vector_lake_spark",
    "operators",
    "pq_codebooks.py",
)
M, K, ITERS = 8, 16, 25


def kmeans(x: np.ndarray, k: int, iters: int, rng: np.random.RandomState):
    """Plain seeded Lloyd's: deterministic init (random distinct rows),
    empty clusters re-seeded to the farthest point."""
    centers = x[rng.choice(len(x), size=k, replace=False)].copy()
    for _ in range(iters):
        d = ((x[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for j in range(k):
            members = x[assign == j]
            if len(members):
                centers[j] = members.mean(axis=0)
            else:
                centers[j] = x[d.min(axis=1).argmax()]
    return centers


def main():
    emb = np.stack(
        pq.read_table(f"{SF_DIR}/embeddings.parquet")
        .column("embedding")
        .to_pylist()
    ).astype(np.float64)
    dim = emb.shape[1]
    assert dim % M == 0, (dim, M)
    sub = dim // M
    rng = np.random.RandomState(42)
    books = []
    for m in range(M):
        centers = kmeans(emb[:, m * sub : (m + 1) * sub], K, ITERS, rng)
        books.append([[round(float(v), 6) for v in c] for c in centers])

    blocks = []
    for m, book in enumerate(books):
        rows = ",\n".join(
            "        [" + ", ".join(repr(v) for v in c) + "]" for c in book
        )
        blocks.append(f"    [  # subspace {m}: dims {m*sub}..{(m+1)*sub-1}\n{rows},\n    ]")
    joined = ",\n".join(blocks)
    body = f'''"""Pinned product-quantization codebooks (seed-42 numpy k-means).

M={M} contiguous subspaces of {sub} dims, K={K} centroids each, fitted
once on ``{SF_DIR}/embeddings.parquet`` by
``scripts/fit_pq_codebooks.py`` and frozen as literals so PQ encode /
ADC scoring is pure deterministic arithmetic in BOTH engines (Spark and
the DuckDB oracle). Regenerate with the script if the testdata changes.
"""

PQ_M = {M}
PQ_K = {K}
PQ_SUB = {sub}

# PQ_CODEBOOKS[m][k] = the k-th centroid of subspace m ({sub} floats)
PQ_CODEBOOKS = [
{joined},
]
'''
    with open(OUT, "w") as f:
        f.write(body)
    print(f"wrote {OUT}: M={M} K={K} sub={sub}")


if __name__ == "__main__":
    main()
