"""Runnable demo — parity with the reference's ``vector_lake/__main__.py``
(build a store, add vectors, query):

    python -m vector_lake_spark [location]

Builds an LSH-sharded store (dim 5, approx_shards=243 → 256 shards, the
reference demo's config), ingests 100 random vectors, persists, and runs
a routed top-4 query, printing the hits.
"""

from __future__ import annotations

import sys
import tempfile


def main(location: str | None = None) -> list:
    import numpy as np

    from vector_lake_spark.session import get_spark
    from vector_lake_spark.store import SparkVectorLake

    spark = get_spark("vector_lake_spark_demo")
    location = location or tempfile.mkdtemp(prefix="vlake_demo_") + "/db"

    db = SparkVectorLake(spark, location, dimension=5, approx_shards=243)
    rng = np.random.RandomState(0)
    db.add_batch(rng.rand(100, 5).tolist())
    db.persist()

    hits = db.query(
        [0.56325391, 0.1500543, 0.88579166, 0.73536349, 0.7719873], k=4
    ).collect()
    for h in hits:
        print(f"id={h['id']} score={h['score']}")
    return hits


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
