"""Vector math as native Spark column expressions.

Replaces the reference's numpy kernels (``/root/reference/vector_lake/core/
hnsw.py:12-17`` — ``l2_distance`` / ``cosine_distance``) with JVM-side
higher-order array expressions: ``zip_with`` + ``aggregate`` stay inside
whole-stage codegen, so the hot scoring path never crosses into Python.
All math is float64 — testdata ships ``array<float>`` and must be cast
before scoring or results drift vs the float64 oracle (SURVEY.md §7).

NB: the reference's ``cosine_distance`` actually returns raw cosine
*similarity* and its query path minimizes it (SURVEY.md §3.2 — verified
bug). We implement the documented intent: similarity, maximized.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, functions as F


def to_double_array(col: Column | str) -> Column:
    """Cast an array<float> column to array<double> (exact widening)."""
    return F.col(col).cast("array<double>") if isinstance(col, str) else col.cast("array<double>")


def lit_vector(values: Sequence[float]) -> Column:
    """A literal array<double> column from Python floats (broadcast to executors
    as part of the plan — no shuffle, no closure serialization per row)."""
    return F.array(*[F.lit(float(v)) for v in values])


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ as a sequential fold (deterministic order ⇒ stable vs oracle)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    """Raw cosine similarity a·b / (‖a‖‖b‖). Zero-norm inputs yield NULL
    (``try_divide`` — ANSI-mode safe) rather than the reference's NaN crash
    (`tests/test_properties.py:88` skipped zero-vector case)."""
    return F.try_divide(dot(a, b), norm(a) * norm(b))


def cosine_distance(a: Column, b: Column) -> Column:
    """1 − cosine similarity (the metric the reference *intended*)."""
    return F.lit(1.0) - cosine_similarity(a, b)


def l2_distance(a: Column, b: Column) -> Column:
    """Euclidean distance ‖a−b‖ (reference hnsw.py:12-13 semantics)."""
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
