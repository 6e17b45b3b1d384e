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


def test_long_path_converges_within_log_budget(spark):
    # path of 120 nodes: diameter 120, far beyond the default 20-round
    # budget for plain min-label propagation — the pointer-jumping
    # shortcut makes it converge in O(log diameter) rounds instead.
    n = 120
    edges = spark.createDataFrame(
        [(f"n{i:03d}", f"n{i+1:03d}", 1) for i in range(n)],
        "source string, target string, weight long",
    )
    got = {
        r["id"]: r["component"]
        for r in connected_components(edges, max_iterations=12).collect()
    }
    assert set(got.values()) == {"n000"}
    assert len(got) == n + 1


def test_nonconvergence_raises_not_silent(spark):
    # an exhausted iteration budget must raise, never return wrong labels
    import pytest

    n = 120
    edges = spark.createDataFrame(
        [(f"n{i:03d}", f"n{i+1:03d}", 1) for i in range(n)],
        "source string, target string, weight long",
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iterations=2)
