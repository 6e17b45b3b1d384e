"""Invariant tests for the contract-inline analytics entries
(contract_analytics.py): correlation matrix, RFM segmentation, PMI
collocations. Exact value equality vs DuckDB is the correctness
checker's job; these pin the mathematical invariants on real data."""

from __future__ import annotations

import pytest

from poc_spark.contract import REGISTRY


def _run(name, spark, sf_dir):
    return REGISTRY[name].spark(spark, sf_dir).collect()


def test_corr_matrix_bounds_and_shape(spark, sf_dir):
    rows = _run("q_corr_matrix", spark, sf_dir)
    assert len(rows) == 6  # C(4,2) variable pairs
    for r in rows:
        assert -1.0 <= r["corr_r"] <= 1.0
    # upper triangle only, in declaration order, no duplicates
    pairs = {(r["var_x"], r["var_y"]) for r in rows}
    assert len(pairs) == 6
    assert all(x != y for x, y in pairs)
    # the synthetic columns are drawn independently: |r| stays small
    assert all(abs(r["corr_r"]) < 0.2 for r in rows)


def test_rfm_scores_are_quartiles(spark, sf_dir):
    rows = _run("q_rfm_segmentation", spark, sf_dir)
    n = len(rows)
    assert n > 0
    for col in ("r_score", "f_score", "m_score"):
        vals = [r[col] for r in rows]
        assert set(vals) <= {1, 2, 3, 4}
        # ntile balance: bucket sizes differ by at most 1
        sizes = [vals.count(b) for b in (1, 2, 3, 4)]
        assert max(sizes) - min(sizes) <= 1
    segs = {r["segment"] for r in rows}
    assert all(len(s) == 3 for s in segs)
    # customers are distinct
    assert len({r["custkey"] for r in rows}) == n


def test_pmi_collocations_floor_and_order(spark, sf_dir):
    rows = _run("text_pmi_collocations", spark, sf_dir)
    assert 0 < len(rows) <= 20
    assert all(r["c_xy"] >= 5 for r in rows)
    pmis = [r["pmi"] for r in rows]
    assert pmis == sorted(pmis, reverse=True) or len(set(pmis)) < len(pmis)
    # descending by (pmi, x, y): verify the primary key ordering strictly
    keys = [(-r["pmi"], r["x"], r["y"]) for r in rows]
    assert keys == sorted(keys)


def test_inverted_index_matches_required_terms(spark, sf_dir):
    rows = _run("text_inverted_index", spark, sf_dir)
    for r in rows:
        assert r["matched_terms"] == 4
        assert r["total_tf"] >= 4


def test_bm25_scores_positive_and_bounded_k(spark, sf_dir):
    rows = _run("text_bm25_topk", spark, sf_dir)
    assert 0 < len(rows) <= 15
    assert all(r["score"] > 0 for r in rows)


def test_rolling_zscore_invariants(spark, sf_dir):
    rows = _run("q_rolling_zscore", spark, sf_dir)
    assert len(rows) > 0
    for r in rows:
        assert 0 <= r["n_hist"] <= 10
        if r["n_hist"] < 5:
            assert r["zscore"] is None and r["is_anomaly"] is False
        if r["is_anomaly"]:
            assert abs(r["zscore"]) > 3.0
    # every event scored exactly once
    assert len({r["event_id"] for r in rows}) == len(rows)


def test_scd2_one_state_per_user_at_t0(spark, sf_dir):
    rows = _run("q_scd2_build", spark, sf_dir)
    users = [r["user_id"] for r in rows]
    assert len(users) == len(set(users))  # exactly one covering interval
    assert all(r["n_versions"] >= 1 for r in rows)


def test_domain_divergence_bounds(spark, sf_dir):
    import math

    rows = _run("text_domain_divergence", spark, sf_dir)
    assert len(rows) > 0
    for r in rows:
        # JSD (nats) is bounded by ln 2 and non-negative (round-6 slack)
        assert -1e-6 <= r["jsd"] <= math.log(2.0) + 1e-6
        assert r["n_tokens"] > 0


def test_entity_resolution_clusters(spark, sf_dir):
    rows = _run("pipeline_entity_resolution", spark, sf_dir)
    assert len(rows) > 0
    total = sum(r["n_members"] for r in rows)
    ids = {r["cluster_id"] for r in rows}
    assert len(ids) == len(rows)  # canonical ids unique
    for r in rows:
        # canonical id is a member, so it can't exceed the key sum
        assert r["cluster_id"] <= r["sum_keys"]
        assert 1 <= r["n_names"] <= r["n_members"]
    assert total >= len(rows)


def test_keywords_three_per_doc(spark, sf_dir):
    rows = _run("text_keywords", spark, sf_dir)
    from collections import Counter

    per = Counter(r["doc_id"] for r in rows)
    assert set(per.values()) <= {1, 2, 3}  # docs with <3 terms keep fewer
    for r in rows:
        assert 1 <= r["rnk"] <= 3


def test_profile_generic_shape(spark, sf_dir):
    rows = _run("q_profile_generic", spark, sf_dir)
    got = {(r["col"], r["metric"]): r["value"] for r in rows}
    assert len(got) == 13
    assert got[("o_totalprice", "nulls")] == 0.0
    assert got[("o_custkey", "min")] >= 0
    assert ("o_orderstatus", "min") not in got  # strings skip min/max
