"""Property-based tests (hypothesis) — the reference's invariant strategy
(tests/test_properties.py:23-85: router bounds, add/query invariants)
re-targeted at the rebuild's driver-side kernels."""

import numpy as np
from hypothesis import given, settings, strategies as st

from vector_lake_spark.adapter import hashed_ngram_embedder
from vector_lake_spark.operators import lsh
from vector_lake_spark.operators.ann import multiprobe_shards

H = lsh.make_hyperplanes(5, 5)

finite_floats = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)


@given(st.lists(finite_floats, min_size=5, max_size=5))
@settings(max_examples=200, deadline=None)
def test_router_bounds(vec):
    shard = lsh.route_vector(vec, H)
    assert 0 <= shard < 32


@given(st.lists(finite_floats, min_size=5, max_size=5))
@settings(max_examples=100, deadline=None)
def test_router_deterministic(vec):
    assert lsh.route_vector(vec, H) == lsh.route_vector(vec, H)


@given(
    st.lists(finite_floats, min_size=5, max_size=5),
    st.integers(min_value=1, max_value=8),
)
@settings(max_examples=100, deadline=None)
def test_multiprobe_invariants(vec, n_probes):
    probes = multiprobe_shards(vec, H, n_probes)
    assert probes[0] == lsh.route_vector(vec, H)
    assert len(probes) == len(set(probes)) <= n_probes
    assert all(0 <= p < 32 for p in probes)


@given(st.text(max_size=200))
@settings(max_examples=100, deadline=None)
def test_embedder_unit_norm_or_zero(text):
    embed = hashed_ngram_embedder(dim=16)
    (v,) = embed([text])
    assert len(v) == 16
    norm = float(np.linalg.norm(v))
    assert norm == 0.0 or abs(norm - 1.0) < 1e-9


@given(st.text(max_size=100))
@settings(max_examples=50, deadline=None)
def test_embedder_deterministic(text):
    embed = hashed_ngram_embedder(dim=8)
    assert embed([text]) == embed([text])


def test_int8_quantization_error_bound(spark):
    """Mathematical contract: symmetric int8 round-to-nearest keeps every
    per-element reconstruction error ≤ scale/2 (+1ulp slack)."""
    from vector_lake_spark import queries as Q

    rows = Q.q_vec_quantize_int8(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert r["max_err"] <= r["scale"] / 2 + 1e-6, r
