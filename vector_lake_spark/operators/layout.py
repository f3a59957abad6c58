"""Multi-dimensional data layout: Z-order (Morton) clustering.

The reference stores vectors in LSH-sharded parquet (one clustering
dimension — the hyperplane shard, ``vector_lake/core/lsh.py``).  Real
lakehouse tables are queried along SEVERAL dimensions (user AND day,
order AND part); clustering on one leaves the other un-prunable.
Z-ordering interleaves the bits of two (or more) key columns into a
single sort key, so a range-partition + in-file sort on the Morton code
keeps every file narrow in EVERY interleaved dimension at once — parquet
min/max row-group stats then prune scans for predicates on any of them.
This is the standard layout trick (Delta/Iceberg ``OPTIMIZE ZORDER BY``)
re-expressed as plain Spark: one ``repartitionByRange`` shuffle on the
Morton code, then ``sortWithinPartitions`` (sort only, no extra
shuffle), then a normal parquet write.

Everything is codegen'd column arithmetic (shifts/and/or unrolled over a
fixed bit budget) — no UDFs, no driver work, scale-independent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# 16 bits per dimension -> 32-bit Morton code in a long: plenty for
# layout purposes (a file holds one narrow range of the 2^32 codes).
DEFAULT_BITS = 16


def morton2(x: Column, y: Column, bits: int = DEFAULT_BITS) -> Column:
    """Interleave the low ``bits`` bits of two non-negative integer
    columns into a Morton (Z-order) code: bit i of ``x`` lands at
    position 2i, bit i of ``y`` at 2i+1.  Unrolled shift/and/or terms —
    stays inside whole-stage codegen."""
    xb = x.cast("long")
    yb = y.cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(xb, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(yb, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def sql_morton2(x: str, y: str, bits: int = DEFAULT_BITS) -> str:
    """DuckDB SQL mirroring :func:`morton2` bit-for-bit (both engines:
    arithmetic shifts + AND/OR on 64-bit integers)."""
    xb = f"CAST({x} AS BIGINT)"
    yb = f"CAST({y} AS BIGINT)"
    terms = []
    for i in range(bits):
        terms.append(f"((({xb} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({yb} >> {i}) & 1) << {2 * i + 1})")
    return "CAST((" + " | ".join(terms) + ") AS BIGINT)"


def zorder_layout(
    df: DataFrame,
    x: Column,
    y: Column,
    n_files: int,
    bits: int = DEFAULT_BITS,
) -> DataFrame:
    """Return ``df`` re-laid-out for 2-D pruning: range-partitioned into
    ``n_files`` splits of the Morton code of ``(x, y)`` and sorted by it
    within each partition.  Write the result with a plain
    ``df.write.parquet`` — each output file then covers a contiguous
    Z-curve segment, i.e. a small rectangle in (x, y) space, and parquet
    min/max stats prune scans filtered on either column.

    One shuffle (the range partition — sampled range bounds handle skew);
    the in-partition sort is shuffle-free.  At 100 TB this is the
    compaction job's layout step: run it per partition-of-the-table
    (e.g. per day) rather than globally, and pick ``n_files`` so files
    land near the target file size (~1 GB).
    """
    zcol = morton2(x, y, bits).alias("__z")
    return (
        df.withColumn("__z", zcol)
        .repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
    )
