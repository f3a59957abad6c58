"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``vector_lake_spark/`` (see SURVEY.md §2 for the
operator inventory this registry covers); ``vector_lake_spark/queries.py``
holds the registry and the oracle SQL generators.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from vector_lake_spark import queries as Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: exact top-k cosine similarity over the embeddings
    table (the reference's intended core query, done exactly — SURVEY.md
    §4.3) at sf0.001."""
    return Q.q_vec_topk_cosine(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 / §2.B."""
    return dict(Q.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for EVERY query above — as of r04 the whole
    registry is oracled: the IVF family runs on a pinned centroid
    codebook (the iterative fit moved offline), and the multimodal
    byte-fold stand-in is reproduced in SQL over the hex of the blob.
    Zero rows-only entries remain."""
    return dict(Q.ORACLES)
