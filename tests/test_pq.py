"""Product quantization: encode determinism, stored-code ADC
equivalence, compression arithmetic, and a measured recall floor.

The oracle gate (`vec_topk_pq`) proves Spark/DuckDB arithmetic parity;
these tests pin the properties parity can't see: codes are stable and
small, ADC from STORED codes equals ADC recomputed from vectors (the
whole point — the scan never needs the raw vector), and the staged
cascade actually recalls the exact top-k on the test corpus.
"""

import pytest
from pyspark.sql import functions as F

from vector_lake_spark import queries as Q
from vector_lake_spark.functions.vectors import to_double_array
from vector_lake_spark.operators.pq import (
    PQ_CODEBOOKS,
    PQ_K,
    PQ_M,
    PQ_SUB,
    pq_adc_expr,
    pq_codes_expr,
)

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_codebook_shape_pinned():
    assert len(PQ_CODEBOOKS) == PQ_M
    assert all(len(b) == PQ_K for b in PQ_CODEBOOKS)
    assert all(len(c) == PQ_SUB for b in PQ_CODEBOOKS for c in b)


def test_codes_in_range_and_deterministic(spark):
    v = to_double_array(F.col("embedding"))
    df = _emb(spark).select(
        "vec_id", pq_codes_expr(v).alias("codes")
    )
    rows = {r["vec_id"]: r["codes"] for r in df.collect()}
    assert all(
        len(c) == PQ_M and all(0 <= x < PQ_K for x in c)
        for c in rows.values()
    )
    rows2 = {r["vec_id"]: r["codes"] for r in df.collect()}
    assert rows == rows2
    # codes discriminate: the corpus must not collapse to one code word
    assert len({tuple(c) for c in rows.values()}) > len(rows) // 2


def test_adc_from_stored_codes_equals_recompute(spark, tmp_path):
    """Encode once, store ONLY (vec_id, codes), score from the stored
    codes — identical ADC scores to computing codes from raw vectors on
    the fly. This is the 64×-smaller-scan contract."""
    v = to_double_array(F.col("embedding"))
    stored_path = str(tmp_path / "codes")
    _emb(spark).select(
        "vec_id", pq_codes_expr(v).alias("codes")
    ).write.parquet(stored_path)
    stored = spark.read.parquet(stored_path).select(
        "vec_id",
        pq_adc_expr(F.col("codes"), Q.QUERY_VEC).alias("adc"),
    )
    live = _emb(spark).select(
        "vec_id",
        pq_adc_expr(pq_codes_expr(v), Q.QUERY_VEC).alias("adc"),
    )
    a = {r["vec_id"]: r["adc"] for r in stored.collect()}
    b = {r["vec_id"]: r["adc"] for r in live.collect()}
    assert a == b


def test_staged_pq_recall_floor(spark):
    """The 16×K ADC pool + exact re-rank must recall most of the exact
    top-k on the test corpus (uniform random unit vectors — the coarse
    quantizer's worst case; measured pool curve in the query docstring;
    the driver-checked oracle pins exactness of the cascade itself)."""
    got = {r["vec_id"] for r in Q.q_vec_topk_pq(spark, SF).collect()}
    exact = {r["vec_id"] for r in Q.q_vec_topk_cosine(spark, SF).collect()}
    recall = len(got & exact) / len(exact)
    assert recall >= 0.8, f"PQ staged recall {recall} below floor"


def test_compression_ratio():
    """The arithmetic the docstring claims: 8 codes × 4 bits vs 64
    float64 — 64× (stored here as ints for engine-friendliness; bit-pack
    for the wire)."""
    raw_bytes = 64 * 8
    code_bits = PQ_M * 4  # 16 centroids -> 4 bits
    assert raw_bytes * 8 / code_bits == 128.0  # bit-packed
    assert raw_bytes / (PQ_M * 1) == 64.0  # byte-per-code storage
