"""Structured Streaming variants of the batch event operators.

Same logical transformations as ``operators/events`` exposed over an
unbounded source: watermarked tumbling aggregation and native
``session_window`` sessionization. The batch module is the oracle-checked
source of truth; these are the production streaming path (the reference has
no streaming at all — SURVEY.md §2.A.1; its closest analog is the ingest
watermark at index.py:289).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def stream_tumbling_agg(
    events: DataFrame,
    duration: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Watermarked tumbling aggregation; late rows beyond ``watermark`` are
    dropped and window state is evictable — bounded state at any scale."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), duration).alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 2).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), key_col, "n_events", "sum_value")
    )


def stream_sliding_agg(
    events: DataFrame,
    duration: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Watermarked sliding-window aggregation (each row lands in
    duration/slide windows; state per open window, evicted past the
    watermark)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), duration, slide).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 2).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
    )


def stream_sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Native session windows (gap-close semantics identical to the batch
    gap-and-islands formulation for on-time data)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("w"), F.col(user_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            user_col,
            "n_events",
            "sum_value",
        )
    )


def run_events_stream_demo(spark, source_dir: str, checkpoint_dir: str, out_dir: str):
    """File-source streaming demo: read parquet as a stream, watermarked
    tumbling agg, parquet sink. Used by tests to prove the streaming path
    executes (availableNow → bounded run)."""
    schema = spark.read.parquet(source_dir).schema
    stream = spark.readStream.schema(schema).parquet(source_dir)
    agg = stream_tumbling_agg(stream)
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir)
