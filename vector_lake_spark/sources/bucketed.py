"""Bucketed-table materialization — co-located joins without shuffles.

At 100 TB the dominant recurring cost of the relational core is the
shuffle on join keys. Bucketing pre-pays it once at write time:
``bucketBy(n, key)`` hash-clusters and sort-orders each bucket file, so a
join between two tables bucketed on the same key by the same bucket count
plans as a zero-Exchange sort-merge join — every subsequent join of the
fact tables is shuffle-free. This is the Spark-native equivalent of the
co-located join layouts warehouse engines build with distribution keys.

The reference has no notion of this (single-process, one file per shard);
it matters only at the rebuild's target scale. Demonstrated and
plan-pinned in ``tests/test_bucketed.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 16,
) -> None:
    """Materialize ``df`` as a bucketed+sorted managed table. One shuffle
    now (the bucketing write) buys shuffle-free equi-joins on
    ``bucket_col`` for every future query against the table."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table_name)
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key_left: str, key_right: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket keys. With matching
    bucket specs Catalyst satisfies both sides' distribution requirements
    from the table layout — the physical plan contains NO Exchange."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[key_left] == right[key_right])
