"""Graph-analytics tests on a hand-computed fixture."""

from __future__ import annotations

import pytest

from poc_spark.operators.graph import degrees, pagerank, triangle_count

# triangle a-b-c plus pendant d on a:   a-b(2) a-c(1) b-c(1) a-d(3)
EDGES = [
    ("a", "b", 2),
    ("a", "c", 1),
    ("b", "c", 1),
    ("a", "d", 3),
]


@pytest.fixture(scope="module")
def edges(spark):
    return spark.createDataFrame(EDGES, "source string, target string, weight long")


def test_degrees(spark, edges):
    got = {r["id"]: (r["degree"], r["weighted_degree"]) for r in degrees(edges).collect()}
    assert got == {
        "a": (3, 6),
        "b": (2, 3),
        "c": (2, 2),
        "d": (1, 3),
    }


def test_pagerank_properties(spark, edges):
    ranks = {r["id"]: r["rank"] for r in pagerank(edges, iterations=12).collect()}
    assert sum(ranks.values()) == pytest.approx(1.0, abs=1e-6)
    # hub node a must outrank everyone; pendant d beats peripheral c
    assert ranks["a"] == max(ranks.values())
    assert ranks["a"] > ranks["b"] > 0
    assert all(r > 0 for r in ranks.values())


def test_pagerank_uniform_on_symmetric_graph(spark):
    # 3-cycle with equal weights: exact symmetry -> uniform ranks
    cyc = spark.createDataFrame(
        [("x", "y", 1), ("x", "z", 1), ("y", "z", 1)],
        "source string, target string, weight long",
    )
    ranks = [r["rank"] for r in pagerank(cyc, iterations=8).collect()]
    assert all(r == pytest.approx(1 / 3, abs=1e-9) for r in ranks)


def test_triangle_count(spark, edges):
    got = {r["id"]: r["triangles"] for r in triangle_count(edges).collect()}
    assert got == {"a": 1, "b": 1, "c": 1}  # d is in no triangle


def test_clustering_coefficient(spark, edges):
    from poc_spark.operators.graph import clustering_coefficient

    got = {
        r["id"]: (r["degree"], r["triangles"], r["clustering_coeff"])
        for r in clustering_coefficient(edges).collect()
    }
    assert got["a"] == (3, 1, pytest.approx(2 * 1 / (3 * 2)))
    assert got["b"] == (2, 1, pytest.approx(1.0))
    assert got["c"] == (2, 1, pytest.approx(1.0))
    assert got["d"] == (1, 0, 0.0)  # degree-1: defined as exactly 0.0


def test_adamic_adar(spark, edges):
    import math

    from poc_spark.operators.graph import adamic_adar

    got = {(r["u"], r["v"]): r["score"] for r in adamic_adar(edges).collect()}
    # only b-d and c-d are non-adjacent with a shared neighbor (a, deg 3);
    # adjacent pairs (a-b, a-c, b-c, a-d) must NOT appear
    expected = round(1.0 / math.log(3.0), 6)
    assert got == {("b", "d"): expected, ("c", "d"): expected}


def test_adamic_adar_top_k_is_deterministic(spark, edges):
    from poc_spark.operators.graph import adamic_adar

    top = adamic_adar(edges, top_k=1).collect()
    assert len(top) == 1
    assert (top[0]["u"], top[0]["v"]) == ("b", "d")  # tie broken by (u, v)


def test_adamic_adar_hub_cap_bounds_wedges_and_keeps_non_hub_scores(spark):
    import math

    from pyspark.sql import functions as F

    from poc_spark.operators.graph import _directed, adamic_adar

    # planted 10³-degree hub H–a0..a999 (the power-law scale-killer:
    # uncapped it alone emits C(1000,2) ≈ 5·10⁵ wedges) plus one
    # low-degree wedge x–m, y–m (deg m = 2)
    rows = [("H", f"a{i}", 1) for i in range(1000)]
    rows += [("x", "m", 1), ("y", "m", 1)]
    edges = spark.createDataFrame(
        rows, "source string, target string, weight long"
    )
    cap = 10
    capped = {
        (r["u"], r["v"]): r["score"]
        for r in adamic_adar(edges, max_wedge_degree=cap).collect()
    }
    # every hub wedge is gone; the non-hub pair's score is EXACTLY the
    # uncapped value (quantized 1/ln 2)
    assert capped == {
        ("x", "y"): round(round(1.0e12 / math.log(2.0)) / 1.0e12, 6)
    }
    # wedge budget: Σ_{z kept} C(deg z, 2) — the capped plan's total
    # wedge volume — collapses from ~5·10⁵ to 1 and is bounded by
    # |kept z| · cap² / 2 regardless of hub skew
    deg = (
        _directed(edges)
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("dz"))
        .filter(F.col("dz") <= cap)
    )
    wedges = deg.agg(
        F.sum(F.col("dz") * (F.col("dz") - 1) / 2).alias("w")
    ).collect()[0]["w"]
    n_kept = deg.count()
    assert wedges == 1
    assert wedges <= n_kept * cap * cap / 2
    # uncapped on the same graph: the hub pairs dominate (sanity that
    # the cap was binding, not vacuous)
    assert adamic_adar(edges).count() == 1000 * 999 // 2 + 1


def test_modularity_hand_computed(spark, edges):
    from poc_spark.operators.graph import modularity_by_community

    # communities: {a,b,c} strong triangle, {d} singleton; m=4 edges,
    # intra-{a,b,c} edges = 3 (ab, ac, bc), degrees a3 b2 c2 d1
    comms = spark.createDataFrame(
        [("a", "x"), ("b", "x"), ("c", "x")], "id string, community string"
    )
    got = {
        r["community"]: (r["n_nodes"], r["e_within"], r["d_total"], r["q_contrib"])
        for r in modularity_by_community(edges, comms).collect()
    }
    m = 4
    assert got["x"] == (3, 3, 7, round((4 * m * 3 - 49) / (4 * m * m), 9))
    assert got["d"] == (1, 0, 1, round((0 - 1) / (4 * m * m), 9))
    # total modularity is bounded by 1
    assert sum(v[3] for v in got.values()) <= 1.0
