"""k_core: hand-built cores + seeded differential vs a pure-Python peel."""

from __future__ import annotations

import random

import pytest

from poc_spark.operators.graph import k_core


def _edges_df(spark, pairs):
    canon = sorted({(min(a, b), max(a, b)) for a, b in pairs if a != b})
    return spark.createDataFrame(
        [(s, t, 1) for s, t in canon], "source string, target string, weight long"
    )


def _py_kcore(pairs, k):
    """Reference peel in plain Python."""
    adj: dict[str, set[str]] = {}
    for a, b in pairs:
        if a != b:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k:
                for m in adj.pop(n):
                    adj[m].discard(n)
                changed = True
    return {n: len(ns) for n, ns in adj.items()}


def test_triangle_with_tail(spark):
    pairs = [("a", "b"), ("b", "c"), ("a", "c"), ("a", "d")]
    got = {r["id"]: r["degree"] for r in k_core(_edges_df(spark, pairs), 2).collect()}
    assert got == {"a": 2, "b": 2, "c": 2}  # d peeled, a's degree drops to 2


def test_chain_has_no_2core(spark):
    pairs = [("a", "b"), ("b", "c"), ("c", "d")]
    assert k_core(_edges_df(spark, pairs), 2).count() == 0


def test_cascade_peel(spark):
    # e-d-a triangle tail: peeling e drops d below 2, which drops again
    pairs = [("a", "b"), ("b", "c"), ("a", "c"), ("a", "d"), ("d", "e")]
    got = {r["id"] for r in k_core(_edges_df(spark, pairs), 2).collect()}
    assert got == {"a", "b", "c"}


def test_k1_keeps_every_connected_node(spark):
    pairs = [("a", "b"), ("c", "d")]
    assert k_core(_edges_df(spark, pairs), 1).count() == 4


def test_rejects_bad_k(spark):
    with pytest.raises(ValueError):
        k_core(_edges_df(spark, [("a", "b")]), 0)


@pytest.mark.parametrize("seed,k", [(1, 2), (2, 3), (3, 4)])
def test_differential_random_graph(spark, seed, k):
    rng = random.Random(seed)
    nodes = [f"n{i}" for i in range(40)]
    pairs = {
        tuple(sorted(rng.sample(nodes, 2)))
        for _ in range(rng.randrange(60, 120))
    }
    expected = _py_kcore(pairs, k)
    got = {r["id"]: r["degree"] for r in k_core(_edges_df(spark, pairs), k).collect()}
    assert got == expected
