"""Reference `examples/s3_lake.py` rewritten for the Spark engine.

The reference adds 100 vectors one-by-one into an LSH-sharded store,
persists, reopens, and queries (`/root/reference/examples/s3_lake.py`).
Here the same flow is batch-first; swap the local path for
`s3a://vector-lake` (with the hadoop-aws jar — docs/S3.md) or mirror via
`sources.s3sync.S3StoreSync` in jar-less environments.

    python examples/lake.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from vector_lake_spark.session import get_spark
from vector_lake_spark.store import SparkVectorLake

if __name__ == "__main__":
    spark = get_spark("example_lake")
    location = "/tmp/vector-lake-example"

    db = SparkVectorLake(spark, location, dimension=5, approx_shards=243)
    embeddings = np.random.rand(100, 5)
    db.add_batch(embeddings.tolist(), documents=["some document"] * 100)
    db.persist()

    # re-open from disk (fresh object): seeded hyperplanes → same routing
    db = SparkVectorLake(spark, location, dimension=5, approx_shards=243)
    hits = db.query(
        [0.56325391, 0.1500543, 0.88579166, 0.73536349, 0.7719873], k=4
    )
    hits.show(truncate=False)
    db.delete()
