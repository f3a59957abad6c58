"""Reference `examples/partition.py` for the Spark engine: an explicit
partition-key store instead of LSH routing.

    python examples/partition.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from vector_lake_spark.session import get_spark
from vector_lake_spark.store import SparkPartition

if __name__ == "__main__":
    spark = get_spark("example_partition")
    db = SparkPartition(
        spark, "/tmp/vector-lake-partition", partition_key="feature", dimension=5
    )
    db.add_batch(np.random.rand(100, 5).tolist(), documents=["some document"] * 100)
    db.persist()

    db = SparkPartition(
        spark, "/tmp/vector-lake-partition", partition_key="feature", dimension=5
    )
    db.query([0.56325391, 0.1500543, 0.88579166, 0.73536349, 0.7719873]).show()
    db.delete()
