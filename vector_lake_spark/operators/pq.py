"""Product quantization (PQ): 64-dim float vectors → M=8 4-bit codes.

The third point on the repo's compression/recall curve (after int8
scalar quantization, ``vec_quantize_int8``, and IVF pruning,
``operators/ann.IVFIndex``): PQ encodes each vector as its nearest
centroid per SUBSPACE — 8 contiguous 8-dim slices, 16 centroids each —
so a 512-byte float64 vector becomes 8 nibbles (64× smaller), and query
scoring (ADC, asymmetric distance computation) is 8 table lookups per
vector instead of 64 multiply-adds.

Everything follows the pinned-codebook discipline that makes this repo's
ANN oracle-checkable (``operators/ann.assign_centroid_expr``): codebooks
are fitted ONCE offline (``scripts/fit_pq_codebooks.py``, seeded numpy
Lloyd's) and frozen as literals; encode and ADC are pure column
arithmetic — per-subspace rounded squared-L2 argmin with lowest-index
ties, mirrored term-for-term in DuckDB SQL — so the staged PQ query
(``vec_topk_pq``) hash-checks end to end.

100 TB posture: encode once at ingest (one scan, no shuffle — codes are
a tinyint array column beside or instead of the raw vector), fit on a
sample, never re-fit (a new codebook silently re-encodes history —
version codebooks like the IVF sidecar versions its centroid counts).
ADC scans read ONLY the 8-byte code column: a 100 TB vector corpus
becomes a ~1.6 TB scan, and the exact re-rank touches full vectors for
just the candidate pool. Compose with IVF pruning for the standard
IVF-PQ cascade (prune partitions → ADC rank codes → exact re-rank).
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import Column, functions as F

from vector_lake_spark.functions.vectors import sql_double_lit
from vector_lake_spark.operators.ann import SCORE_DECIMALS
from vector_lake_spark.operators.pq_codebooks import (
    PQ_CODEBOOKS,
    PQ_K,
    PQ_M,
    PQ_SUB,
)


def pq_code_expr(vec: Column, m: int) -> Column:
    """Nearest-centroid code for subspace ``m`` (0..PQ_K-1): rounded
    squared-L2 argmin, lowest index on ties — the IVF assignment rule
    per subspace.

    Expression shape matters here: ONE ``transform`` over the 16-row
    codebook literal, with the subvector sliced once. The fully-unrolled
    literal form (8 subspaces × 16 centroids × 8 dims ≈ 3k expression
    nodes in one projection) blew past the codegen method-size cliff
    into interpreted evaluation (measured 15.6 s at sf0.1); 128 separate
    zip_with/aggregate kernels still re-sliced per centroid (8.0 s); the
    single-transform form is ~1 s for identical arithmetic. Fold order
    is dim-ascending, matching the left-associative `+` chain in
    ``sql_pq_code`` term-for-term."""
    sub = F.slice(vec, m * PQ_SUB + 1, PQ_SUB)
    # ONE F.expr parse for the 16×8 codebook literal: the per-element
    # F.lit/F.array construction was ~1 s of py4j round-trips per query
    # build (r12 optimization; see functions.vectors.lit_vector)
    book = F.expr(
        "array("
        + ",".join(
            "array("
            + ",".join(sql_double_lit(v) for v in PQ_CODEBOOKS[m][k])
            + ")"
            for k in range(PQ_K)
        )
        + ")"
    )
    dists = F.transform(
        book,
        lambda c: F.round(
            F.aggregate(
                F.zip_with(sub, c, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            SCORE_DECIMALS,
        ),
    )
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def pq_codes_expr(vec: Column) -> Column:
    """Full PQ code word: array<int> of PQ_M codes (persist as the
    stored representation — 8 small ints per vector)."""
    return F.array(*[pq_code_expr(vec, m) for m in range(PQ_M)])


def spark_sql_pq_code(vec_sql: str, m: int) -> str:
    """Spark-SQL text of ``pq_code_expr`` over a vector SQL fragment —
    the single-parse fast path (r12 optimization): the DSL construction
    costs ~50 ms of py4j round-trips per subspace, charged to every
    query build; this text parses in one call to the identical
    expression (equivalence pinned by tests/test_pq.py)."""
    sub = f"slice({vec_sql}, {m * PQ_SUB + 1}, {PQ_SUB})"
    book = (
        "array("
        + ",".join(
            "array("
            + ",".join(sql_double_lit(v) for v in PQ_CODEBOOKS[m][k])
            + ")"
            for k in range(PQ_K)
        )
        + ")"
    )
    dists = (
        f"transform({book}, c -> round(aggregate("
        f"zip_with({sub}, c, (x, y) -> (x - y) * (x - y)), 0.0D, "
        f"(acc, x) -> acc + x), {SCORE_DECIMALS}))"
    )
    return f"CAST(array_position({dists}, array_min({dists})) - 1 AS INT)"


def spark_sql_pq_adc(vec_sql: str, query: Sequence[float]) -> str:
    """Spark-SQL text of ``pq_adc_expr(pq_codes_expr(vec), query)`` with
    the code extraction pre-folded (``codes[m]`` over the literal code
    array is what Catalyst's SimplifyExtractValueOps folds to anyway):
    same optimized plan, one parse instead of ~2 s of py4j calls."""
    lut = _lut(query)
    terms = [
        f"element_at(array("
        + ",".join(sql_double_lit(v) for v in lut[m])
        + f"), {spark_sql_pq_code(vec_sql, m)} + 1)"
        for m in range(PQ_M)
    ]
    chain = reduce(lambda a, b: f"({a} + {b})", terms)
    return f"round({chain}, {SCORE_DECIMALS})"


def pq_adc_codes_expr(vec_sql: str, query: Sequence[float]) -> Column:
    """``pq_adc_expr(pq_codes_expr(vec), query)`` built in ONE ``F.expr``
    parse — the construction fast path for the query registry."""
    return F.expr(spark_sql_pq_adc(vec_sql, query))


def _lut(query: Sequence[float]) -> list[list[float]]:
    """ADC lookup table: lut[m][k] = round(dot(query_sub_m, centroid),
    SCORE_DECIMALS). Rounded literals so both engines sum identical
    doubles in the same (subspace) order."""
    q = [float(x) for x in query]
    out = []
    for m in range(PQ_M):
        base = m * PQ_SUB
        out.append(
            [
                round(
                    sum(
                        q[base + d] * PQ_CODEBOOKS[m][k][d]
                        for d in range(PQ_SUB)
                    ),
                    SCORE_DECIMALS,
                )
                for k in range(PQ_K)
            ]
        )
    return out


def pq_adc_expr(codes: Column, query: Sequence[float]) -> Column:
    """ADC approximate dot(query, vector) from the code word alone:
    Σ_m lut[m][codes[m]] — 8 literal-array lookups per row, the raw
    vector is never read."""
    lut = _lut(query)
    terms = [
        F.element_at(
            F.expr(
                "array(" + ",".join(sql_double_lit(v) for v in lut[m]) + ")"
            ),
            codes[m] + F.lit(1),
        )
        for m in range(PQ_M)
    ]
    return F.round(reduce(lambda a, b: a + b, terms), SCORE_DECIMALS)


# ---------------------------------------------------------------------------
# DuckDB SQL mirrors (term-for-term)
# ---------------------------------------------------------------------------


def sql_pq_code(vec_sql: str, m: int) -> str:
    base = m * PQ_SUB
    dists = []
    for k in range(PQ_K):
        c = PQ_CODEBOOKS[m][k]
        terms = " + ".join(
            f"({vec_sql}[{base + d + 1}] - ({c[d]!r})) * "
            f"({vec_sql}[{base + d + 1}] - ({c[d]!r}))"
            for d in range(PQ_SUB)
        )
        dists.append(f"round({terms}, {SCORE_DECIMALS})")
    arr = "[" + ", ".join(dists) + "]"
    return (
        f"CAST(list_position({arr}, list_min({arr})) - 1 AS INT)"
    )


def sql_pq_adc(vec_sql: str, query: Sequence[float]) -> str:
    """ADC score with codes derived inline from the vector (the oracle
    has no stored-code table; arithmetic matches pq_adc_expr(pq_codes)
    exactly because the lut literals and summation order are shared)."""
    lut = _lut(query)
    terms = []
    for m in range(PQ_M):
        arr = "[" + ", ".join(repr(v) for v in lut[m]) + "]"
        terms.append(f"{arr}[{sql_pq_code(vec_sql, m)} + 1]")
    return f"round({' + '.join(terms)}, {SCORE_DECIMALS})"
