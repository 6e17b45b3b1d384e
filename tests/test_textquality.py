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


def test_quality_weak_labels_fixed_thresholds(spark):
    from poc_spark.operators.textquality import quality_weak_labels

    docs = _docs(
        spark,
        [
            (1, "a a a a a a a b b b"),  # 2/10 = 0.2 -> low
            (2, "a b c d e f g h i j"),  # 10/10 = 1.0 -> high
            (3, "a a b b c c d d e f"),  # 6/10 -> high (>= 0.6)
            (4, "a a a b b c c d e a"),  # 5/10 -> abstain (NULL)
            (5, "a a a a b b b c c d"),  # 4/10 -> low (<= 0.4)
        ],
    )
    got = {
        r["doc_id"]: (r["distinct_ratio"], r["label"])
        for r in quality_weak_labels(docs).collect()
    }
    assert got[1] == (0.2, "low")
    assert got[2] == (1.0, "high")
    assert got[3] == (0.6, "high")
    assert got[4] == (0.5, None)
    assert got[5] == (0.4, "low")


def test_quality_classifier_separates_planted_spam(spark):
    from pyspark.sql import functions as F

    from poc_spark.operators.textquality import (
        quality_classifier_score,
        quality_weak_labels,
    )
    from poc_spark.operators.textstats import langid_ngram_train

    # train: rule-labelable spam (repeated loop) vs clean (all distinct)
    # 18 loop tokens + 1 unique -> 7/19 distinct = 0.368 <= 0.40
    spam = " ".join(["buy now click here free win"] * 3)
    train_rows = [
        (i, f"{spam} x{i}") for i in range(20)
    ] + [
        (100 + i, " ".join(f"word{i}n{j}" for j in range(12)))
        for i in range(20)
    ]
    train = spark.createDataFrame(train_rows, "doc_id long, text string")
    lab = quality_weak_labels(train)
    labeled = (
        train.join(lab.select("doc_id", "label"), "doc_id")
        .filter(F.col("label").isNotNull())
        .withColumnRenamed("label", "lang")
    )
    assert labeled.count() == 40  # the rule labels every training doc
    model = langid_ngram_train(labeled)
    # test: abstain-band docs (ratio 0.5) of both families
    test_rows = [
        (1000, "buy now click here free win buy now click here free win"),
        (1001, " ".join(["wordQnR"] * 6 + [f"t{j}" for j in range(6)])),
    ]
    test = spark.createDataFrame(test_rows, "doc_id long, text string")
    assert (
        quality_weak_labels(test).filter(F.col("label").isNotNull()).count()
        == 0
    )
    got = {
        r["id"]: (r["pred_label"], r["quality"])
        for r in quality_classifier_score(test, model).collect()
    }
    assert got[1000][0] == "low" and got[1000][1] < 0.5
    assert got[1001][0] == "high" and got[1001][1] > 0.5


def test_fused_train_score_equals_unfused_chain(spark):
    """quality_classifier_train_score (one gram pass, r14 opt) must be
    row-identical to the composed weak-label → langid_ngram_train →
    quality_classifier_score chain it fuses — including doubles, which
    stay exact because both forms divide the same integer numerators."""
    from pyspark.sql import functions as F

    from poc_spark.operators.textstats import langid_ngram_train
    from poc_spark.operators.textquality import (
        quality_classifier_score,
        quality_classifier_train_score,
        quality_weak_labels,
        weak_label_col,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog near the bank"),
        (2, "spam spam spam spam spam spam spam spam"),
        (3, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (4, "x"),  # under 3 chars: no grams, no score row
        (5, "mixed mixed tokens tokens appear appear here here often often"),
        (6, "one two three four five six seven eight nine ten eleven"),
        (7, "dup dup dup dup unique piece dup dup dup dup dup dup"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    s = F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lower("text"), F.lit(":qcsplit"))), 1, 15
            ),
            16,
            10,
        ).cast("long"),
        F.lit(4),
    )

    labels = quality_weak_labels(docs)
    split = docs.join(labels.select("doc_id", "label"), "doc_id").withColumn(
        "s", s
    )
    train = split.filter("s < 3 AND label IS NOT NULL").select(
        "doc_id", F.col("label").alias("clz"), "text"
    )
    unfused = quality_classifier_score(
        docs, langid_ngram_train(train, lang_col="clz")
    )

    tl = F.when((s < 3) & weak_label_col(F.col("text")).isNotNull(),
                weak_label_col(F.col("text")))
    fused = quality_classifier_train_score(docs, tl)

    a = sorted(map(tuple, unfused.collect()))
    b = sorted(map(tuple, fused.collect()))
    assert a == b
    assert len(a) >= 5  # the corpus actually scored (doc 4 drops)
