"""Table sources for the test corpus (and the same layout at scale).

One place knows the physical quirks of each input so queries stay purely
logical: the ``events`` table ships nanosecond parquet timestamps (which
Spark's vectorized reader rejects) and is normalized to microsecond
``TimestampType`` here. ``register_views`` exposes everything to the SQL
API. Any ``fsspec``-style URI works as ``base`` (local path, ``s3a://``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, base: str, name: str) -> DataFrame:
    if name == "events":
        return load_events(spark, base)
    return spark.read.parquet(f"{base}/{name}.parquet")


def load_events(spark: SparkSession, base: str) -> DataFrame:
    """events ships TIMESTAMP(NANOS) parquet: read nanos as long
    (runtime-settable legacy conf — works on any caller's session) and
    floor-convert to microsecond TimestampType."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{base}/events.parquet")
    if dict(raw.dtypes).get("ts") == "bigint":
        raw = raw.withColumn(
            "ts", F.timestamp_micros(F.floor(F.col("ts") / 1000).cast("long"))
        )
    return raw


def register_views(spark: SparkSession, base: str, suffix: str = "") -> None:
    """Register every table as a temp view (``lineitem`` etc.) for the
    SQL API — same names the DuckDB oracles use."""
    for name in TABLES:
        load_table(spark, base, name).createOrReplaceTempView(name + suffix)
