"""Tri-clause MERGE semantics (sources/lake.py merge_full_partitioned)
on a hand-computed tree: matched update, matched conditional delete,
not-matched insert, not-matched-by-source delete bounded by scope."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from poc_spark.sources.lake import (
    merge_full_partitioned,
    read_snapshot,
    write_partitioned,
)

SCHEMA = "k long, part string, val long"
BASE = [
    (1, "a", 10),
    (2, "a", 20),
    (3, "b", 30),
    (4, "b", 40),
    (5, "c", 50),
    (7, "d", 70),
]
SOURCE = [
    (1, "a", 11),  # matched -> UPDATE
    (3, "b", -1),  # matched + flag -> DELETE
    (6, "a", 60),  # not matched -> INSERT
    (9, "a", -1),  # not matched + flag -> no-op (never inserted)
]


@pytest.fixture()
def tree(spark, tmp_path_repo):
    root = str(tmp_path_repo / "tree")
    write_partitioned(spark.createDataFrame(BASE, SCHEMA), root, ["part"])
    return root


def _state(spark, root):
    return {
        r["k"]: (r["part"], r["val"])
        for r in read_snapshot(spark, root).collect()
    }


def test_all_four_clauses(spark, tree):
    src = spark.createDataFrame(SOURCE, SCHEMA)
    affected = merge_full_partitioned(
        spark,
        tree,
        src,
        "k",
        "part",
        matched_delete=F.col("val") < 0,
        unmatched_source_delete=True,
        scope_partitions=["c"],
    )
    # a: source-named; b: holds matched key 3; c: scoped; d untouched
    assert affected == ["a", "b", "c"]
    assert _state(spark, tree) == {
        1: ("a", 11),  # updated
        2: ("a", 20),  # unmatched outside scope: carried
        4: ("b", 40),  # unmatched outside scope: carried
        6: ("a", 60),  # inserted
        7: ("d", 70),  # partition untouched entirely
        # 3 deleted by flag, 5 deleted by the scoped BY SOURCE clause,
        # 9 never inserted (flagged, unmatched)
    }


def test_without_by_source_clause(spark, tree):
    src = spark.createDataFrame(SOURCE, SCHEMA)
    affected = merge_full_partitioned(
        spark, tree, src, "k", "part", matched_delete=F.col("val") < 0
    )
    assert affected == ["a", "b"]
    got = _state(spark, tree)
    assert got[5] == ("c", 50)  # no scope -> row 5 survives
    assert 3 not in got and got[1] == ("a", 11) and got[6] == ("a", 60)


def test_by_source_requires_scope(spark, tree):
    src = spark.createDataFrame(SOURCE, SCHEMA)
    with pytest.raises(ValueError, match="scope_partitions"):
        merge_full_partitioned(
            spark, tree, src, "k", "part", unmatched_source_delete=True
        )


def test_no_matched_delete_means_pure_upsert(spark, tree):
    src = spark.createDataFrame([(1, "a", 99), (8, "c", 80)], SCHEMA)
    merge_full_partitioned(spark, tree, src, "k", "part")
    got = _state(spark, tree)
    assert got[1] == ("a", 99) and got[8] == ("c", 80)
    assert len(got) == len(BASE) + 1
