"""Bucketed co-located join: correct results AND a shuffle-free plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from poc_spark.plans.bucketing import bucketed_join, write_bucketed
from poc_spark.sources.catalog import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").withColumnRenamed(
        "o_orderkey", "orderkey"
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_orderkey").alias("orderkey"))
        .agg(F.count(F.lit(1)).alias("n_items"))
    )
    write_bucketed(orders, "t_orders_b", "orderkey", 8)
    write_bucketed(li, "t_items_b", "orderkey", 8)
    yield "t_orders_b", "t_items_b"
    spark.sql("DROP TABLE IF EXISTS t_orders_b")
    spark.sql("DROP TABLE IF EXISTS t_items_b")


def test_bucketed_join_no_shuffle(spark, bucketed_tables):
    lt, rt = bucketed_tables
    joined = bucketed_join(spark, lt, rt, "orderkey")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # the join itself must not shuffle either side
    assert "Exchange hashpartitioning" not in plan, plan[:2000]


def test_bucketed_join_correct(spark, sf_dir, bucketed_tables):
    lt, rt = bucketed_tables
    joined = bucketed_join(spark, lt, rt, "orderkey")
    # cross-check against the plain (shuffling) join
    orders = load_table(spark, sf_dir, "orders")
    li = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_orderkey").alias("orderkey"))
        .agg(F.count(F.lit(1)).alias("n_items"))
    )
    plain = orders.withColumnRenamed("o_orderkey", "orderkey").join(li, "orderkey")
    assert joined.count() == plain.count()
    a = {(r["orderkey"], r["n_items"]) for r in joined.select("orderkey", "n_items").collect()}
    b = {(r["orderkey"], r["n_items"]) for r in plain.select("orderkey", "n_items").collect()}
    assert a == b
