"""Declarative expectations: rule families, null semantics, one-pass
plan, and the quarantine split."""

from __future__ import annotations

from pyspark.sql import functions as F

from poc_spark.operators.expectations import (
    expect_rows,
    expect_subset,
    expect_unique,
    quarantine,
)


def _df(spark):
    return spark.createDataFrame(
        [
            (1, "ok", 2),
            (2, None, 4),      # null text: not_null + match both violated
            (3, "abc", 99),    # wrong length
            (3, "dup", 3),     # duplicate key
            (4, "fine", 4),
        ],
        "k long, text string, n long",
    )


def test_expect_rows_null_is_violation(spark):
    got = {
        r["rule"]: (r["n_rows"], r["n_violations"])
        for r in expect_rows(
            _df(spark),
            {
                "not_null_text": F.col("text").isNotNull(),
                "len_matches": F.length("text") == F.col("n"),
            },
        ).collect()
    }
    assert got == {
        "not_null_text": (5, 1),
        # NULL comparison is a violation, so rows 2 and 3 both count
        "len_matches": (5, 2),
    }


def test_expect_rows_is_one_pass(spark):
    plan = (
        expect_rows(
            _df(spark),
            {"a": F.col("k") > 0, "b": F.col("n") > 0, "c": F.col("text").isNotNull()},
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # all rules fused into one aggregate over one scan — no join, no
    # union of per-rule subplans
    assert plan.count("Scan ExistingRDD") + plan.count("LocalTableScan") <= 1
    assert "Join" not in plan


def test_expect_unique_counts_extra_rows(spark):
    r = expect_unique(_df(spark), ["k"], rule="u").collect()[0]
    assert (r["rule"], r["n_rows"], r["n_violations"]) == ("u", 5, 1)


def test_expect_subset_orphans_and_null(spark):
    child = spark.createDataFrame(
        [(1,), (1,), (7,), (None,)], "fk long"
    )
    parent = spark.createDataFrame([(1,), (2,)], "pk long")
    r = expect_subset(child, "fk", parent, "pk").collect()[0]
    # orphan 7 and the NULL reference both violate
    assert (r["n_rows"], r["n_violations"]) == (4, 2)


def test_quarantine_split_and_triage(spark):
    rules = {
        "not_null_text": F.col("text").isNotNull(),
        "len_matches": F.length("text") == F.col("n"),
    }
    passing, bad = quarantine(_df(spark), rules)
    assert sorted(r["k"] for r in passing.collect()) == [1, 3, 4]
    triage = {r["k"]: sorted(r["failed_rules"]) for r in bad.collect()}
    assert triage == {
        2: ["len_matches", "not_null_text"],
        3: ["len_matches"],
    }
    # split is lossless
    assert passing.count() + bad.count() == 5
