"""Skew-resistant aggregation helpers.

``groupBy`` already does map-side partial aggregation, which covers most
skew for algebraic aggregates; these helpers cover the cases it doesn't:

- ``salted_count``: two-stage count keyed by (key, input-partition) — the
  hot key's reducer receives one partial row per upstream partition
  instead of every record. Deterministic (spark_partition_id as salt, no
  RNG), so results are exactly equal to the direct groupBy and remain
  oracle-checkable.
- ``salted_distinct_count``: exact distinct count via dedup-then-count —
  the (key, value) dedup stage spreads a hot key across value-hash
  partitions before the per-key count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def salted_count(df: DataFrame, key_cols: list[str], out_col: str = "n") -> DataFrame:
    partial = (
        df.withColumn("__salt", F.spark_partition_id())
        .groupBy(*key_cols, "__salt")
        .agg(F.count(F.lit(1)).alias("__pc"))
    )
    return partial.groupBy(*key_cols).agg(F.sum("__pc").cast("long").alias(out_col))


def salted_distinct_count(
    df: DataFrame, key_cols: list[str], value_col: str, out_col: str = "n_distinct"
) -> DataFrame:
    deduped = df.select(*key_cols, value_col).distinct()
    return deduped.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias(out_col)
    )
