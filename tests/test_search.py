"""Retrieval-operator tests on a hand-computed corpus (operators/search.py)."""

from __future__ import annotations

import math

import pytest

from poc_spark.operators.search import (
    bm25_topk,
    build_postings,
    conjunctive_search,
)

DOCS = [
    (1, "spark merge spark"),
    (2, "merge vector stream"),
    (3, "spark vector merge stream extra"),
    (4, "other words only"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_build_postings(spark, docs):
    got = {
        (r["term"], r["doc_id"]): r["tf"] for r in build_postings(docs).collect()
    }
    assert got[("spark", 1)] == 2
    assert got[("spark", 3)] == 1
    assert ("spark", 2) not in got
    assert got[("merge", 2)] == 1


def test_conjunctive_search_requires_all_terms(spark, docs):
    got = {
        r["doc_id"]: (r["matched_terms"], r["total_tf"])
        for r in conjunctive_search(docs, ("merge", "spark")).collect()
    }
    # doc 2 has merge but no spark; doc 4 has neither
    assert got == {1: (2, 3), 3: (2, 2)}


def test_conjunctive_search_dedupes_query_terms(spark, docs):
    # a duplicated term must not inflate the required match count
    # (postings contribute one row per DISTINCT term per doc; before
    # the dedupe this returned an empty result instead of AND over
    # the termset)
    got = {
        r["doc_id"]: (r["matched_terms"], r["total_tf"])
        for r in conjunctive_search(
            docs, ("merge", "spark", "merge")
        ).collect()
    }
    assert got == {1: (2, 3), 3: (2, 2)}


def test_conjunctive_search_rejects_empty_query(spark, docs):
    with pytest.raises(ValueError):
        conjunctive_search(docs, ())


def _bm25_hand(tf: int, dl: int, df: int, n: int, t: int) -> float:
    k1, b = 1.2, 0.75
    idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    avgdl = t / n
    return round(idf * (tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))), 6)


def test_bm25_matches_hand_computation(spark, docs):
    # corpus: N=4 docs, T=14 tokens; df(spark)=2
    got = {r["doc_id"]: r["score"] for r in bm25_topk(docs, ("spark",), k=10).collect()}
    assert got == {
        1: _bm25_hand(tf=2, dl=3, df=2, n=4, t=14),
        3: _bm25_hand(tf=1, dl=5, df=2, n=4, t=14),
    }
    # higher tf in a shorter doc must outrank
    assert got[1] > got[3]


def test_bm25_topk_limit_and_order(spark, docs):
    rows = bm25_topk(docs, ("spark", "merge"), k=1).collect()
    assert len(rows) == 1
    assert rows[0]["doc_id"] == 1  # tf-heavy shortest doc wins
