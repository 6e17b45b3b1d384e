"""Incremental join-view maintenance (operators/ivm.py) on a
hand-computed fixture: fact deltas join the post-delta dims, dim
deltas rebuild from the view alone, ΔA precedence over ΔB."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from poc_spark.operators.ivm import (
    dim_delta_view_rows,
    fact_delta_view_rows,
    join_view_rows,
)

FACTS = [(1, 10, "p1", 100), (2, 10, "p1", 200), (3, 20, "p2", 300)]
DIMS = [(10, "alpha"), (20, "beta")]


@pytest.fixture(scope="module")
def frames(spark):
    facts = spark.createDataFrame(FACTS, "k long, dk long, part string, val long")
    dims = spark.createDataFrame(DIMS, "dk long, attr string")
    return facts, dims


def _rows(df):
    return {r["k"]: (r["dk"], r["part"], r["val"], r["attr"]) for r in df.collect()}


def test_defining_join(spark, frames):
    facts, dims = frames
    got = _rows(join_view_rows(facts, dims, "k", "dk", ["attr"]))
    assert got == {
        1: (10, "p1", 100, "alpha"),
        2: (10, "p1", 200, "alpha"),
        3: (20, "p2", 300, "beta"),
    }


def test_fact_delta_joins_post_delta_dims(spark, frames):
    facts, dims = frames
    delta = spark.createDataFrame(
        [(2, 20, "p2", 201), (4, 10, "p1", 400)],
        "k long, dk long, part string, val long",
    )
    new_dims = spark.createDataFrame([(10, "ALPHA2"), (20, "beta")], "dk long, attr string")
    got = _rows(fact_delta_view_rows(delta, new_dims, "k", "dk", ["attr"]))
    # updated row 2 re-keyed to dim 20; new row 4 carries the NEW dim value
    assert got == {2: (20, "p2", 201, "beta"), 4: (10, "p1", 400, "ALPHA2")}


def test_dim_delta_rebuilds_from_view_only(spark, frames):
    facts, dims = frames
    view = join_view_rows(facts, dims, "k", "dk", ["attr"])
    ddelta = spark.createDataFrame([(10, "ALPHA2")], "dk long, attr string")
    got = _rows(dim_delta_view_rows(view, ddelta, "k", "dk", ["attr"]))
    # only dim-10 rows rebuilt, fact columns preserved from the view
    assert got == {1: (10, "p1", 100, "ALPHA2"), 2: (10, "p1", 200, "ALPHA2")}


def test_fact_delta_takes_precedence_over_dim_delta(spark, frames):
    facts, dims = frames
    view = join_view_rows(facts, dims, "k", "dk", ["attr"])
    ddelta = spark.createDataFrame([(10, "ALPHA2")], "dk long, attr string")
    exclude = spark.createDataFrame([(2,)], "k long")
    got = _rows(
        dim_delta_view_rows(view, ddelta, "k", "dk", ["attr"], exclude)
    )
    assert set(got) == {1}  # row 2 excluded: its ΔA rebuild already won


def test_maintain_view_batch_exactly_once(spark, tmp_path_repo):
    from poc_spark.sources.lake import read_snapshot, read_tree_meta, write_partitioned
    from poc_spark.streaming.ingest import maintain_view_batch_exactly_once

    root = str(tmp_path_repo / "view")
    write_partitioned(
        spark.createDataFrame(
            [(1, 10, "p1", 100, "alpha")],
            "k long, dk long, part string, val long, attr string",
        ),
        root,
        ["part"],
    )
    rows = spark.createDataFrame(
        [(2, 10, "p1", 200, "alpha")],
        "k long, dk long, part string, val long, attr string",
    )
    assert maintain_view_batch_exactly_once(spark, root, rows, 0, "k", "part")
    assert read_tree_meta(root)["applied_batches"] == [0]
    # replay with poison content: absorbed, view untouched
    poison = spark.createDataFrame(
        [(99, 10, "p1", -1, "POISON")],
        "k long, dk long, part string, val long, attr string",
    )
    assert not maintain_view_batch_exactly_once(spark, root, poison, 0, "k", "part")
    got = {r["k"] for r in read_snapshot(spark, root).collect()}
    assert got == {1, 2}
    # next id applies and the ledger accumulates
    assert maintain_view_batch_exactly_once(spark, root, poison, 1, "k", "part")
    assert read_tree_meta(root)["applied_batches"] == [0, 1]
