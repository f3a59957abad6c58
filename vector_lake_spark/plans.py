"""Physical-plan inspection helpers.

Used by tests to pin the plan *shapes* the engine is designed around
(SCALE.md): top-k must plan as ``TakeOrderedAndProject`` (bounded heap,
no global sort), dimension joins must broadcast, store queries must hit
Parquet partition pruning, and scans must prune columns. A passing result
set with the wrong plan is a scale regression — these catch it locally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    """The full formatted physical plan (captured from df.explain)."""
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def assert_in_plan(df: DataFrame, *needles: str) -> None:
    plan = plan_string(df)
    missing = [n for n in needles if n not in plan]
    assert not missing, f"plan missing {missing}:\n{plan[:4000]}"


def assert_not_in_plan(df: DataFrame, *needles: str) -> None:
    plan = plan_string(df)
    present = [n for n in needles if n in plan]
    assert not present, f"plan unexpectedly contains {present}:\n{plan[:4000]}"
