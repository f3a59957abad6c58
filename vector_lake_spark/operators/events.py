"""Event-time operators over the ``events`` table (batch formulation).

The reference has no streaming/windowing at all (SURVEY.md §2.A.1). These
implement the classical event-time surface batch-first with ``F.window``
and gap-and-islands sessionization; ``streaming/`` exposes the same
transformations over ``readStream`` with watermarks.

Window starts are emitted as formatted strings ('yyyy-MM-dd HH:mm:ss') so
the DuckDB oracle comparison is precision- and timezone-proof.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

TS_FMT = "yyyy-MM-dd HH:mm:ss"


def tumbling_agg(
    df: DataFrame,
    duration: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Tumbling-window aggregation: (window_start, key) → count, sum, avg.
    Map-side partial aggregation makes this one shuffle of (start,key)
    pairs regardless of input size."""
    w = F.window(F.col(ts_col), duration)
    return (
        df.groupBy(w.alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 2).alias("sum_value"),
            F.round(F.avg(value_col), 6).alias("avg_value"),
        )
        .select(
            F.date_format(F.col("w.start"), TS_FMT).alias("window_start"),
            key_col,
            "n_events",
            "sum_value",
            "avg_value",
        )
    )


def sliding_agg(
    df: DataFrame,
    duration: str = "1 hour",
    slide: str = "30 minutes",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Sliding-window aggregation (each event lands in duration/slide
    windows)."""
    w = F.window(F.col(ts_col), duration, slide)
    return (
        df.groupBy(w.alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 2).alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), TS_FMT).alias("window_start"),
            "n_events",
            "sum_value",
        )
    )


def sessionize(
    df: DataFrame,
    gap_minutes: int = 30,
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Gap-based sessionization (gap-and-islands): a new session starts when
    the per-user inter-event gap exceeds ``gap_minutes``. Per session:
    start, end, event count, total value, duration.

    One shuffle on user_id; the two windows share the same partitioning so
    Catalyst plans a single exchange. Equivalent streaming formulation:
    ``F.session_window`` (streaming/ module)."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col("event_id"))
    gap_s = gap_minutes * 60
    with_flag = df.withColumn(
        "new_session",
        F.when(
            F.col(ts_col).cast("long")
            - F.lag(F.col(ts_col).cast("long")).over(w)
            > gap_s,
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("long"),
    )
    with_sid = with_flag.withColumn(
        "session_seq",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        with_sid.groupBy(user_col, "session_seq")
        .agg(
            F.date_format(F.min(ts_col), TS_FMT).alias("session_start"),
            F.date_format(F.max(ts_col), TS_FMT).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 2).alias("sum_value"),
            (F.max(F.col(ts_col).cast("long")) - F.min(F.col(ts_col).cast("long")))
            .alias("duration_sec"),
        )
        .select(
            user_col,
            "session_seq",
            "session_start",
            "session_end",
            "n_events",
            "sum_value",
            "duration_sec",
        )
    )
