"""S3 mirroring without the hadoop-aws jar: the boto3 staging layer
(reference `S3Bucket` semantics — upload-on-sync / restore / remote
delete). Point LOCALSTACK_ENDPOINT_URL at localstack/minio, or run
against real AWS with the default credential chain.

    LOCALSTACK_ENDPOINT_URL=http://localhost:4566 python examples/s3_staging.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from vector_lake_spark.session import get_spark
from vector_lake_spark.sources.s3sync import S3StoreSync
from vector_lake_spark.store import SparkVectorLake

if __name__ == "__main__":
    # no endpoint configured? fall back to an in-process moto S3 so the
    # example runs anywhere (same mock the test suite uses)
    if not os.environ.get("LOCALSTACK_ENDPOINT_URL"):
        import boto3
        from moto import mock_aws

        _mock = mock_aws()
        _mock.start()
        boto3.client("s3", region_name="us-east-1").create_bucket(
            Bucket="vector-lake"
        )
        print("(no LOCALSTACK_ENDPOINT_URL -> using in-process moto S3)")

    spark = get_spark("example_s3")
    location = "/tmp/vector-lake-s3-staged"

    db = SparkVectorLake(spark, location, dimension=5, approx_shards=16)
    db.add_batch(np.random.rand(100, 5).tolist())
    db.persist()

    sync = S3StoreSync(location, bucket="vector-lake", prefix="lake")
    print("uploaded files:", sync.sync_up())

    # on another host: restore and query
    restored = S3StoreSync("/tmp/vector-lake-restored", "vector-lake", "lake")
    print("downloaded files:", restored.sync_down())
    SparkVectorLake(
        spark, "/tmp/vector-lake-restored", dimension=5, approx_shards=16
    ).query([0.5, 0.1, 0.9, 0.7, 0.8], k=4).show()
