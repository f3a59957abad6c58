"""Streaming drift monitoring — incremental PSI maintenance.

``DriftMonitor`` keeps the per-(event_type, bucket) period counts that
``operators.drift.psi_from_counts`` folds into PSI, maintained from a
stream under the same exactly-once discipline as ``RollupIngest``
(streaming/rollup.py): each micro-batch partial-aggregates ITS OWN rows
(``operators.drift.bucket_counts`` — the single shared kernel with the
batch query) and lands them in an ``ingest_batch=N`` partition via
dynamic partition overwrite, so a crashed-and-replayed batch overwrites
its earlier attempt instead of double-counting.  The streaming state
store holds nothing.

Serving re-sums the partials (counts are decomposable, so batch-arrival
order is irrelevant) and applies the identical PSI fold — the registry's
``drift_stream_psi`` runs the events table through this module as a
bounded file stream and shares the BATCH entry's DuckDB oracle, so a
green hash proves the stream-maintained monitor equals the full
recompute.

At 100 TB: the counts table is ≤ |types| × 10 rows per batch partition
— a drift dashboard refreshes from it in milliseconds without ever
rescanning raw events, and ``RollupIngest.compact_partials``'s
fold-all-but-newest discipline applies verbatim if the batch-partition
count ever matters (here it is bounded by batches × 50 rows, so it
rarely does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from vector_lake_spark.operators.drift import bucket_counts, psi_from_counts


class DriftMonitor:
    """Exactly-once incremental maintenance of the PSI bucket-count
    table, foreachBatch-driven; serve PSI from the maintained counts."""

    def __init__(self, spark, counts_path: str):
        self.spark = spark
        self.counts_path = str(counts_path)

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        if batch_id < 0:
            raise ValueError(f"batch_id must be >= 0 (got {batch_id})")
        (
            bucket_counts(batch)
            .withColumn("ingest_batch", F.lit(batch_id).cast("long"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch")
            .parquet(self.counts_path)
        )

    def attach(self, stream_df: DataFrame, checkpoint_dir: str, **kwargs):
        """Wire a streaming events DataFrame into the monitor.  Returns
        the started StreamingQuery."""
        return (
            stream_df.writeStream.foreachBatch(
                lambda b, bid: self.process_batch(b, bid)
            )
            .option("checkpointLocation", str(checkpoint_dir))
            .trigger(**(kwargs or {"availableNow": True}))
            .start()
        )

    def counts(self) -> DataFrame | None:
        from vector_lake_spark.fsutil import read_if_exists

        return read_if_exists(self.spark, self.counts_path)

    def serve_psi(self) -> DataFrame:
        """PSI per event_type from the maintained counts — identical
        fold (and output schema) to the batch ``drift_psi`` query, so
        the two share an oracle."""
        parts = self.counts()
        if parts is None:
            raise ValueError(f"no drift counts table at {self.counts_path}")
        return psi_from_counts(
            parts.select("event_type", "bucket", "n_ref", "n_cur")
        )
