"""Connected-components tests: known component structure + convergence."""

from __future__ import annotations

from poc_spark.operators.graph import connected_components


def test_two_components_and_chain(spark):
    # component 1: a-b-c chain; component 2: x-y; isolated edge p-q
    edges = spark.createDataFrame(
        [("a", "b", 1), ("b", "c", 1), ("x", "y", 1), ("p", "q", 1)],
        "source string, target string, weight long",
    )
    got = {r["id"]: r["component"] for r in connected_components(edges).collect()}
    assert got == {
        "a": "a", "b": "a", "c": "a",
        "x": "x", "y": "x",
        "p": "p", "q": "p",
    }


def test_long_path_converges(spark):
    # path of 30 nodes: diameter ~30 but min-label reaches fixpoint
    # within max_iterations because labels hop every round
    n = 30
    edges = spark.createDataFrame(
        [(f"n{i:02d}", f"n{i+1:02d}", 1) for i in range(n)],
        "source string, target string, weight long",
    )
    got = {r["id"]: r["component"] for r in connected_components(edges, max_iterations=40).collect()}
    assert set(got.values()) == {"n00"}
    assert len(got) == n + 1
