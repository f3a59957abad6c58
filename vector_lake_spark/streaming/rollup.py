"""Streaming materialized-rollup maintenance — the incremental half of
the merge-on-read rollup story (``queries.q_ev_rollup_merge``).

``RollupIngest`` maintains a persisted parquet table of DECOMPOSABLE
aggregate partials — (day, event_type) → (cnt, sv) — under the same
exactly-once discipline as ``NearDupIngest`` (streaming/neardup.py):
each micro-batch partial-aggregates ITS OWN rows and lands them in the
table's ``ingest_batch=N`` partition via dynamic partition overwrite,
so a crashed-and-replayed batch overwrites its earlier attempt with the
identical deterministic result instead of double-counting. The
streaming state store holds nothing; executor memory holds nothing
between batches.

Serving is a pure merge: SUM the partials per serving key (here weekly)
— count/sum are associative/commutative, so partials merged in any
batch-arrival order equal the direct aggregate over all raw events.
That equality is oracle-gated: the registry's ``ev_stream_rollup`` runs
the events table through this module as a bounded file stream and is
checked against the SAME DuckDB oracle as the batch entry
(``SQL_EV_ROLLUP_MERGE`` — a direct weekly GROUP BY over raw events).

At 100 TB: the partials table is a few bytes per (day, type) per batch
— compaction (``compact_partials``) merges all batch partitions into
one row per (day, type) (the reserved ``ingest_batch=-1`` partition),
so the table's steady-state size is the key-space, not the ingest
history. Raw events are NEVER rescanned to serve an aggregate; a
late-arriving batch just lands more partials for old days and the merge
stays exact (contrast with watermark-bounded streaming aggregation,
which must eventually drop late rows — see streaming/events.py for that
trade-off).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

COMPACTED_BATCH = -1  # reserved partition; streaming batch ids are >= 0


class RollupIngest:
    """Exactly-once incremental maintenance of a (day, event_type)
    partial-aggregate table, foreachBatch-driven."""

    def __init__(self, spark, rollup_path: str):
        self.spark = spark
        self.rollup_path = str(rollup_path)

    # -- ingest ---------------------------------------------------------

    @staticmethod
    def partial_agg(events: DataFrame) -> DataFrame:
        """The per-batch partial: decomposable (count, sum) by
        (day, event_type). The single shared definition —
        ``q_ev_rollup_merge`` imports this same function for its
        history/delta legs, so stream-vs-batch oracle equality can't
        drift (r06 review)."""
        return events.groupBy(
            F.to_date("ts").alias("day"), "event_type"
        ).agg(F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("sv"))

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        """foreachBatch hook: land this batch's partials in its own
        ``ingest_batch=batch_id`` partition (dynamic overwrite →
        idempotent replay)."""
        if batch_id < 0:
            raise ValueError(
                f"batch_id must be >= 0 (got {batch_id}); "
                f"{COMPACTED_BATCH} is reserved for compacted partials"
            )
        (
            self.partial_agg(batch)
            .withColumn("ingest_batch", F.lit(batch_id).cast("long"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch")
            .parquet(self.rollup_path)
        )

    def attach(self, stream_df: DataFrame, checkpoint_dir: str, **kwargs):
        """Wire a streaming events DataFrame into the maintainer.
        Returns the started StreamingQuery (caller controls trigger /
        awaitTermination)."""
        return (
            stream_df.writeStream.foreachBatch(
                lambda b, bid: self.process_batch(b, bid)
            )
            .option("checkpointLocation", str(checkpoint_dir))
            .trigger(**(kwargs or {"availableNow": True}))
            .start()
        )

    # -- serve ----------------------------------------------------------

    def partials(self) -> DataFrame | None:
        from vector_lake_spark.fsutil import read_if_exists

        return read_if_exists(self.spark, self.rollup_path)

    def serve_weekly(self, delta: DataFrame | None = None) -> DataFrame:
        """Weekly totals from the maintained partials, optionally merged
        with a raw not-yet-ingested tail (``delta``) — the exact
        merge-on-read shape of ``q_ev_rollup_merge``, same output
        schema/rounding so the two share an oracle."""
        parts = self.partials()
        if parts is None:
            raise ValueError(f"no rollup table at {self.rollup_path}")
        merged = parts.select("day", "event_type", "cnt", "sv")
        if delta is not None:
            merged = merged.unionByName(self.partial_agg(delta))
        return (
            merged.groupBy(
                F.date_format(
                    F.date_trunc("week", F.col("day").cast("timestamp")),
                    "yyyy-MM-dd",
                ).alias("week_start"),
                "event_type",
            )
            .agg(
                F.sum("cnt").alias("n_events"),
                F.round(F.sum("sv"), 2).alias("sum_value"),
            )
        )

    # -- maintenance ----------------------------------------------------

    def compact_partials(self) -> int:
        """Merge batch partitions into ONE row per (day, type) in the
        reserved ``ingest_batch=-1`` partition — rollup compaction both
        defragments (one file) and SHRINKS (decomposable partials
        re-aggregate), so steady-state size is the key space, not the
        ingest history. Crash-safety via the shared staged-write +
        rename swap (``fsutil.staged_replace``).

        **Replay safety (r06 review fix):** the NEWEST batch partition
        is left unfolded — only the newest batch can be
        crashed-but-uncommitted (Structured Streaming commits N before
        starting N+1), and folding it would double-count that batch
        when its replay re-creates the partition beside the already-
        merged ``-1`` copy. Strictly-older partitions are committed and
        can never replay, so folding them is always safe. Returns the
        compacted table's row count."""
        from vector_lake_spark.fsutil import staged_replace

        parts = self.partials()
        if parts is None:
            return 0
        real = [
            r[0]
            for r in parts.select("ingest_batch").distinct().collect()
            if r[0] >= 0
        ]
        newest = max(real) if real else None
        foldable = (
            parts
            if newest is None
            else parts.filter(F.col("ingest_batch") != F.lit(newest))
        )
        data = (
            foldable.groupBy("day", "event_type")
            .agg(F.sum("cnt").alias("cnt"), F.sum("sv").alias("sv"))
            .withColumn("ingest_batch", F.lit(COMPACTED_BATCH).cast("long"))
        )
        if newest is not None:
            data = data.unionByName(
                parts.filter(F.col("ingest_batch") == F.lit(newest))
            )
        data = data.localCheckpoint(eager=True)  # pin BEFORE the swap
        n = data.count()

        def write_staged(staging: str) -> None:
            data.repartition("ingest_batch").write.partitionBy(
                "ingest_batch"
            ).parquet(staging)

        staged_replace(self.spark, self.rollup_path, write_staged)
        return n
