"""Bucketed co-located join: the pre-paid-shuffle layout for 100 TB fact
joins. The contract is plan-shaped: a join between two tables bucketed on
the join key with equal bucket counts must contain NO Exchange."""

import pytest
from pyspark.sql import functions as F

from vector_lake_spark.sources.bucketed import bucketed_join, write_bucketed

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    # managed tables land in the session's spark-warehouse dir
    # (warehouse.dir is a static conf); DROP TABLE removes the files
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    write_bucketed(orders, "orders_b", "o_orderkey", n_buckets=8)
    write_bucketed(lineitem, "lineitem_b", "l_orderkey", n_buckets=8)
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    # at test scale Catalyst would broadcast; force the sort-merge path
    # the layout exists for (fact-fact joins too big to broadcast)
    ot, lt = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, ot, lt, "o_orderkey", "l_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan[:3000]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_matches_shuffled_join(spark, bucketed_tables):
    ot, lt = bucketed_tables
    joined = bucketed_join(spark, ot, lt, "o_orderkey", "l_orderkey")
    got = joined.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("rev"),
    ).collect()[0]
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    want = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("rev"),
        )
        .collect()[0]
    )
    assert got["n"] == want["n"] and got["rev"] == want["rev"]
