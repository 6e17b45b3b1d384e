"""Salting correctness: salted forms must equal their plain forms on a
pathologically skewed dataset (one key holding 95% of rows)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from poc_spark.plans.skew import salted_broadcast_join, salted_count


@pytest.fixture(scope="module")
def skewed(spark):
    rows = [("hot", i) for i in range(9500)] + [
        (f"k{i % 50}", i) for i in range(500)
    ]
    return spark.createDataFrame(rows, "key string, v long")


def test_salted_count_equals_plain(spark, skewed):
    plain = {r["key"]: r["n"] for r in
             skewed.groupBy("key").agg(F.count(F.lit(1)).alias("n")).collect()}
    salted = {r["key"]: r["n"] for r in salted_count(skewed, ["key"]).collect()}
    assert salted == plain
    assert salted["hot"] == 9500


def test_salted_join_equals_plain(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", "H"), ("k1", "A"), ("k2", "B")], "key string, label string"
    )
    plain = skewed.join(dim, "key").groupBy("key", "label").agg(
        F.count(F.lit(1)).alias("n")
    )
    salted = salted_broadcast_join(skewed, dim, "key").groupBy("key", "label").agg(
        F.count(F.lit(1)).alias("n")
    )
    p = {(r["key"], r["label"]): r["n"] for r in plain.collect()}
    s = {(r["key"], r["label"]): r["n"] for r in salted.collect()}
    assert s == p and s[("hot", "H")] == 9500


def test_salted_top_k_equals_single_window(spark, skewed):
    from pyspark.sql import Window

    from poc_spark.plans.skew import salted_top_k

    w = Window.partitionBy("key").orderBy("v")
    plain = (
        skewed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 7)
        .drop("_rn")
    )
    salted = salted_top_k(skewed, ["key"], ["v"], k=7)
    p = {(r["key"], r["v"]) for r in plain.collect()}
    s = {(r["key"], r["v"]) for r in salted.collect()}
    assert s == p
    # the hot key is capped too, and keys smaller than k keep all rows
    assert sum(1 for key, _ in s if key == "hot") == 7


def test_salted_top_k_k_exceeds_group(spark):
    from poc_spark.plans.skew import salted_top_k

    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3)], "key string, v long"
    )
    out = salted_top_k(df, ["key"], ["v"], k=10)
    assert out.count() == 3


def test_rank_filter_window_gets_group_limit(spark, skewed):
    """The repo-wide decision (TOPK_SKEW_DEMO.json): plain rank-filter
    windows are already two-phase via InferWindowGroupLimit — pin that
    the rule keeps firing on the sample_k_per_stratum pattern."""
    from poc_spark.operators.sampling import sample_k_per_stratum

    plan = (
        sample_k_per_stratum(skewed, k=5, stratum_col="key", key_col="v")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan
