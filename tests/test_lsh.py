"""LSH router parity + property tests (reference test strategy, SURVEY.md §5:
router invariant `0 ≤ shard < num_shards`, reproduced and strengthened with
exact driver-side/executor-side agreement)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from vector_lake_spark.functions.vectors import lit_vector, to_double_array
from vector_lake_spark.operators import lsh


def test_shard_count_arithmetic():
    # index.py:453-455: approx_shards=243 → 256 actual shards
    assert lsh.num_hashes_for(243) == 8
    assert lsh.num_shards_for(243) == 256
    assert lsh.num_shards_for(10) == 8
    assert lsh.num_shards_for(2) == 2


def test_hyperplanes_deterministic():
    a = lsh.make_hyperplanes(5, 8)
    b = lsh.make_hyperplanes(5, 8)
    assert np.array_equal(a, b)
    assert a.shape == (8, 5)
    # same stream as the reference's global np.random.seed(42)
    np.random.seed(42)
    ref = np.random.randn(8, 5)
    assert np.array_equal(a, ref)


def test_route_vector_matches_reference_arithmetic():
    H = lsh.make_hyperplanes(5, 8)
    rng = np.random.RandomState(7)
    for _ in range(50):
        v = rng.rand(5)
        # reference index.py:53-68 formula, independently recomputed
        expected = int(
            "".join("1" if np.dot(h, v) > 0 else "0" for h in H), 2
        )
        assert lsh.route_vector(v, H) == expected
        assert 0 <= expected < 256


def test_spark_expr_matches_driver_routing(spark):
    H = lsh.make_hyperplanes(8, 6)
    rng = np.random.RandomState(3)
    vecs = [[float(x) for x in rng.randn(8)] for _ in range(100)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "id int, vec array<double>"
    )
    got = {
        r["id"]: r["shard"]
        for r in df.select(
            "id", lsh.shard_id_expr(F.col("vec"), H).alias("shard")
        ).collect()
    }
    for i, v in enumerate(vecs):
        assert got[i] == lsh.route_vector(v, H), f"vector {i}"


def test_multiprobe_contains_primary():
    from vector_lake_spark.operators.ann import multiprobe_shards

    H = lsh.make_hyperplanes(8, 4)
    v = np.arange(8, dtype=float)
    probes = multiprobe_shards(v, H, n_probes=3)
    assert probes[0] == lsh.route_vector(v, H)
    assert len(set(probes)) == 3
    assert all(0 <= p < 16 for p in probes)
