"""Regenerate the pinned IVF centroid codebook.

Fits the seeded (seed=42, k=16) k-means once on the sf0.01 embeddings and
emits ``vector_lake_spark/operators/ivf_centroids.py``. Pinning the fitted
centroids as source literals makes the IVF probe + exact re-rank fully
deterministic and SQL-expressible, so the driver can hash-check
``ann_ivf_topk`` / ``ann_ivf_stored`` against a DuckDB oracle — the
iterative *fit* stays offline, which is also the honest 100 TB posture
(fit on a sample once, assign/probe with a fixed codebook forever).

Run: ``python scripts/fit_ivf_centroids.py``  (rewrites the module in place)
"""

import os

from pyspark.sql import SparkSession

from vector_lake_spark.operators.ann import ivf_build

SF_DIR = os.environ.get("SPARK_GRAFT_FIT_SF", "/root/testdata/sf0.01")
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "vector_lake_spark",
    "operators",
    "ivf_centroids.py",
)

spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .getOrCreate()
)
emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
_, centroids = ivf_build(emb, n_centroids=16, seed=42)
# 6-dp decimal literals: compact, and both engines parse the same decimal
# string to the same float64, so assignment arithmetic is bit-identical.
rounded = [[round(float(x), 6) for x in c] for c in centroids]

rows = ",\n".join(
    "    [" + ", ".join(repr(x) for x in c) + "]" for c in rounded
)
body = f'''"""Pinned IVF centroid codebook (seed-42 k-means, k=16, dim=64).

Fitted once on ``{SF_DIR}/embeddings.parquet`` by
``scripts/fit_ivf_centroids.py`` and frozen as literals so that IVF
assignment / probe / re-rank is a pure deterministic expression in BOTH
engines (Spark and the DuckDB oracle) — no iterative ML in any query
path. Regenerate with the script if the testdata ever changes.
"""

IVF_CENTROIDS = [
{rows},
]
'''
with open(OUT, "w") as f:
    f.write(body)
print(f"wrote {OUT} ({len(rounded)} centroids x dim {len(rounded[0])})")
spark.stop()
