"""Point-in-interval (range) join — bucketed, non-cartesian.

Spark plans a plain ``p.ts BETWEEN i.start AND i.end`` theta join as a
broadcast-nested-loop — O(|points|·|intervals|) comparisons, hopeless at
scale. The bucketed formulation discretizes time into fixed buckets,
explodes each interval into the buckets it overlaps, and equi-joins on
(key, bucket) before the exact containment filter: work becomes
O(|points| + Σ interval_buckets + |true-ish matches|), an ordinary
shuffled hash join. Bucket width trades explode factor vs join
selectivity; choose ≈ median interval length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    key: str | None = None,
    point_ts: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Inner join of points to containing intervals
    (``start ≤ ts ≤ end``, inclusive both ends). Returns all point and
    interval columns (caller projects/aggregates)."""
    b = F.lit(bucket_seconds)
    iv = intervals.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col).cast("long") / b),
                F.floor(F.col(end_col).cast("long") / b),
            )
        ),
    )
    pt = points.withColumn("__b", F.floor(F.col(point_ts).cast("long") / b))
    on = ["__b"] if key is None else [key, "__b"]
    return (
        pt.join(iv, on)
        .filter(
            (F.col(point_ts) >= F.col(start_col))
            & (F.col(point_ts) <= F.col(end_col))
        )
        .drop("__b")
    )
