"""Unit semantics for operators/textquality.py on hand-computable docs."""

from __future__ import annotations

from poc_spark.operators.textquality import decontaminate, ngrams, repetition_stats


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_on_degenerate_doc(spark):
    out = {
        r["doc_id"]: r
        for r in repetition_stats(
            _docs(
                spark,
                [
                    (1, "a a a a a"),          # one token repeated
                    (2, "w x y z"),            # all distinct
                    (3, "solo"),               # single token: no bigrams
                    (4, "  spaced   out  "),   # whitespace runs
                ],
            )
        ).collect()
    }
    assert out[1]["n_tokens"] == 5
    assert out[1]["dup_token_frac"] == 4 / 5
    assert out[1]["top_bigram_frac"] == 1.0  # every slot is "a a"
    assert out[1]["repetitive"]

    assert out[2]["dup_token_frac"] == 0.0
    assert out[2]["top_bigram_frac"] == 1 / 3  # 3 distinct bigrams
    assert not out[2]["repetitive"]

    assert out[3]["n_tokens"] == 1
    assert out[3]["top_bigram_frac"] == 0.0
    assert not out[3]["repetitive"]

    assert out[4]["n_tokens"] == 2  # empty strings filtered


def test_ngrams_distinct_per_doc(spark):
    got = {
        (r["doc_id"], r["gram"])
        for r in ngrams(_docs(spark, [(1, "a b a b a")]), 2).collect()
    }
    assert got == {(1, "a b"), (1, "b a")}  # deduped within doc


def test_decontaminate_flags_exact_overlap(spark):
    bench = _docs(spark, [(100, "the quick brown fox jumps over")])
    train = _docs(
        spark,
        [
            (1, "xx the quick brown fox jumps yy"),  # shares a 5-gram
            (2, "the quick brown fox sleeps now z"),  # only 4-gram overlap
            (3, "completely different words here ok"),
        ],
    )
    got = {r["doc_id"]: r["contaminated"] for r in decontaminate(train, bench).collect()}
    assert got == {1: True, 2: False, 3: False}
