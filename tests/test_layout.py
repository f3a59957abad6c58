"""Z-order layout: Morton code correctness and the actual pruning effect.

The registry entry ``zorder_events`` hash-checks the Morton arithmetic
against the DuckDB oracle; these tests verify the LAYOUT property the
code exists for — after ``zorder_layout`` each parquet file covers a
narrow range of BOTH interleaved dimensions (so parquet min/max stats
prune scans filtered on either), where a single-column sort only
narrows one.
"""

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from vector_lake_spark.operators.layout import morton2, sql_morton2, zorder_layout

SF_DIR = "/root/testdata/sf0.001"


def _interleave_py(x: int, y: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_morton2_matches_python_reference(spark):
    rows = [(3, 5), (0, 0), (65535, 65535), (1, 0), (0, 1), (12345, 54321)]
    df = spark.createDataFrame(rows, "x int, y int").select(
        "x", "y", morton2(F.col("x"), F.col("y")).alias("z")
    )
    for x, y, z in df.collect():
        assert z == _interleave_py(x, y)


def test_sql_morton2_matches_python_reference(duck):
    expr = sql_morton2("x", "y")
    got = duck.execute(
        f"SELECT {expr} AS z FROM (SELECT 12345 AS x, 54321 AS y)"
    ).fetchone()[0]
    assert got == _interleave_py(12345, 54321)


def _file_ranges(path: str, col_a: str, col_b: str):
    """Per-parquet-file (min, max) of two columns from footer stats only."""
    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        mins = {col_a: None, col_b: None}
        maxs = {col_a: None, col_b: None}
        for rg in range(md.num_row_groups):
            for c in (col_a, col_b):
                st = md.row_group(rg).column(names[c]).statistics
                assert st is not None and st.has_min_max
                mins[c] = st.min if mins[c] is None else min(mins[c], st.min)
                maxs[c] = st.max if maxs[c] is None else max(maxs[c], st.max)
        out.append(((mins[col_a], maxs[col_a]), (mins[col_b], maxs[col_b])))
    return out


@pytest.mark.parametrize("n_files", [16])
def test_zorder_narrows_both_dimensions(spark, tmp_path, n_files):
    """After zorder_layout on a 256x256 (x, y) grid, the average
    per-file span of EACH dimension is well below the full domain span —
    the property parquet min/max pruning needs.  The comparison layouts
    show why: a single-column sort narrows x but leaves every file
    spanning all of y; a naive (hash) layout narrows neither.

    (A controlled grid rather than the sf0.001 events table: with only
    15 distinct user_ids there, a 16-file split can't show per-file
    narrowing of that dimension at all.)"""
    n = 256
    grid = spark.range(n * n).select(
        (F.col("id") % n).alias("x"),
        (F.col("id") / n).cast("long").alias("y"),
    )
    naive_dir = str(tmp_path / "naive")
    xsort_dir = str(tmp_path / "xsort")
    z_dir = str(tmp_path / "zorder")
    grid.repartition(n_files).write.parquet(naive_dir)
    grid.repartitionByRange(n_files, "x").sortWithinPartitions(
        "x"
    ).write.parquet(xsort_dir)
    zorder_layout(grid, F.col("x"), F.col("y"), n_files).write.parquet(z_dir)

    span = n - 1

    def avg_spans(path):
        ranges = _file_ranges(path, "x", "y")
        assert len(ranges) >= n_files // 2  # range partitioner may merge a few
        ax = sum(hi - lo for (lo, hi), _ in ranges) / len(ranges)
        ay = sum(hi - lo for _, (lo, hi) in ranges) / len(ranges)
        return ax, ay

    nx, ny = avg_spans(naive_dir)
    sx, sy = avg_spans(xsort_dir)
    zx, zy = avg_spans(z_dir)
    # naive: both dimensions ~full span per file
    assert nx > 0.9 * span and ny > 0.9 * span
    # x-sort: x narrow, y still ~full span
    assert sx < 0.2 * span and sy > 0.9 * span
    # z-order: BOTH dimensions narrow at once (16 files ~ 4x4 squares of
    # the curve -> ideal span ~ span/4 each; allow generous slack for
    # unaligned range-partition boundaries)
    assert zx < 0.5 * span
    assert zy < 0.5 * span


def test_zorder_layout_round_trips_rows(spark, tmp_path):
    e = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "user_id",
        F.dayofmonth("ts").cast("long").alias("day_no"),
    )
    out = str(tmp_path / "z")
    zorder_layout(e, F.col("user_id"), F.col("day_no"), 4).write.parquet(out)
    back = spark.read.parquet(out)
    assert back.count() == e.count()
    assert sorted(back.columns) == sorted(e.columns)
    assert back.select(F.sum("event_id")).first()[0] == e.select(
        F.sum("event_id")
    ).first()[0]
