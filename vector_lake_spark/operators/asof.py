"""As-of (point-in-time) join — an operator Spark has no built-in for.

Semantics: for each left row, attach the most recent right row with
``r.ts < l.ts`` (strict) for the same key. Implemented as a composition of
built-in operators (SURVEY-style custom-operator path (a)): tag the two
sides, union, and carry the right side's values forward with a
``last(ignorenulls)`` window — one shuffle on (key), no join explosion,
no per-row Python.

Scale shape: the union shuffles once on the key; window state is a single
carried row per partition position. Compare: a naive theta-join
(l.key = r.key AND r.ts < l.ts) + max() produces |matches| intermediate
rows — quadratic per key for dense keys.

Determinism contract (shared with the DuckDB ``ASOF JOIN`` oracle, which
leaves same-timestamp ties unspecified): right rows are first reduced to
one per (key, ts) — max event id wins — and equal-timestamp right rows do
NOT match (strict inequality).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_col: str = "ts",
    right_vals: list[str] | None = None,
    right_id: str | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Left rows + most recent strictly-earlier right row per key.

    ``right_vals``: right columns to carry (renamed ``{prefix}{col}``);
    ``{prefix}ts`` (the matched right timestamp) is always attached.
    ``right_id``: unique right column used to break same-(key, ts) ties
    deterministically (greatest wins) before the join.
    """
    right_vals = right_vals or []
    r = right.select(key, ts_col, *(right_vals + ([right_id] if right_id else [])))
    if right_id:
        w_dedup = Window.partitionBy(key, ts_col).orderBy(F.col(right_id).desc())
        r = (
            r.withColumn("__rn", F.row_number().over(w_dedup))
            .filter(F.col("__rn") == 1)
            .drop("__rn", *( [right_id] if right_id not in right_vals else []))
        )
    # Sort key is (ts, side) with left=0, right=1: a left row's (-∞, -1)
    # frame then contains exactly the right rows with r.ts < l.ts — a
    # right row at the SAME ts sorts after the left row and is excluded,
    # giving the strict-inequality semantics the oracle uses.
    #
    # Left payload columns ride through the union (NULL on right rows),
    # so the result needs no join-back on a synthetic row id — one
    # exchange on (key) total. Two left rows tied on (key, ts) carry the
    # same value regardless of their relative order: only right rows
    # populate the __r_* columns the frame reads.
    left_types = dict(left.dtypes)
    r_types = dict(r.dtypes)
    left_payload = [c for c in left.columns if c not in (key, ts_col)]
    tagged_l = left.select(
        F.col(key),
        F.col(ts_col),
        *[F.col(c) for c in left_payload],
        F.lit(0).alias("__side"),
        F.lit(None).cast(r_types[ts_col]).alias("__r_ts"),
        *[F.lit(None).cast(r_types[c]).alias(f"__r_{c}") for c in right_vals],
    )
    tagged_r = r.select(
        F.col(key),
        F.col(ts_col),
        *[F.lit(None).cast(left_types[c]).alias(c) for c in left_payload],
        F.lit(1).alias("__side"),
        F.col(ts_col).alias("__r_ts"),
        *[F.col(c).alias(f"__r_{c}") for c in right_vals],
    )
    unioned = tagged_l.unionByName(tagged_r)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts_col), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carried = unioned.select(
        "*",
        F.last("__r_ts", ignorenulls=True).over(w).alias(f"{prefix}ts"),
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"{prefix}{c}")
            for c in right_vals
        ],
    ).filter(F.col("__side") == 0)
    return carried.select(
        key,
        ts_col,
        *left_payload,
        f"{prefix}ts",
        *[f"{prefix}{c}" for c in right_vals],
    )
