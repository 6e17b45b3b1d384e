"""QUALITY_RECALL.json — honest generalization receipt for the trained
quality classifier (text_quality_classifier).

The oracle entry pins determinism of the weak-label + train + apply
chain; THIS probe pins whether the trained model actually separates
quality classes the weak rule never labeled:

  * planted: TRAIN on a deterministic corpus whose degenerate docs
    (spam loops, char runs, phrase repetition) and clean docs (varied
    subword structure) sit where the weak rule CAN label them (ratio
    <= 0.40 / >= 0.60); TEST on held-out docs of the SAME generative
    families tuned INTO the abstain band (0.40 < ratio < 0.60) — the
    rule labels zero test docs, so any separation is trained
    generalization through the char-trigram features (the spam/run
    trigram signature), not the rule echoing itself.
  * documents: weak-rule agreement on the synthetic table's held-out
    quarter — how often the classifier reproduces the rule's own label
    on docs it COULD label (sanity: the model learned its supervision).

Deterministic by construction (hash-driven word choice, no RNG).
Usage: python tools/quality_recall_probe.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CLEAN_VOCAB = (
    "sparkling joinery tabulated rowan batching windowed grouping ordered "
    "hashing keynote linear partition vectored datum customized mergers "
    "streaming columnar bigger smallest valuation sorted slowest quicker"
).split()
SPAM_TOKENS = "buy now click here free win".split()
N_PER_CLASS = 300
WORDS_PER_DOC = 40


def _h(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:6], "big")


def _clean_doc(i: int, n_distinct: int) -> str:
    # clean family: a rotation of the 24-word vocabulary cycled over 40
    # slots with exactly `n_distinct` distinct words — n_distinct=30+
    # is impossible with 24 words, so clean TRAIN docs append numbered
    # variants; ratio = n_distinct/40 by construction
    words = []
    for j in range(n_distinct):
        base = CLEAN_VOCAB[(_h(f"clean|{i}") + j) % len(CLEAN_VOCAB)]
        words.append(base if j < len(CLEAN_VOCAB) else base + str(j))
    # dedupe-preserving (rotation is distinct until wraparound)
    words = list(dict.fromkeys(words))
    k = 0
    while len(words) < n_distinct:
        words.append(CLEAN_VOCAB[k % len(CLEAN_VOCAB)] + f"x{k}")
        k += 1
    return " ".join(words[j % n_distinct] for j in range(WORDS_PER_DOC))


def _degenerate_doc(i: int, n_filler: int) -> str:
    # spam family: a repeated loop over <= 5 spam-signature tokens plus
    # exactly `n_filler` DISTINCT numbered filler tokens; distinct =
    # |loop vocab| + n_filler, so the ratio is tuned by n_filler alone
    kind = i % 3
    filler = [
        CLEAN_VOCAB[_h(f"fill|{i}|{j}") % len(CLEAN_VOCAB)] + str(j)
        for j in range(n_filler)
    ]
    n_loop = WORDS_PER_DOC - n_filler
    if kind == 0:
        loop = [SPAM_TOKENS[j % len(SPAM_TOKENS)] for j in range(n_loop)]
    elif kind == 1:
        loop = ["zzzz" + "z" * (j % 3) for j in range(n_loop)]
    else:
        loop = [("lol" * (2 + j % 2)) for j in range(n_loop)]
    return " ".join(loop + filler)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from pyspark.sql import functions as F

    from poc_spark.operators.textquality import (
        quality_classifier_score,
        quality_weak_labels,
    )
    from poc_spark.operators.textstats import langid_ngram_train
    from poc_spark.session import get_spark
    from poc_spark.sources.catalog import load_table

    spark = get_spark("quality-recall-probe")

    # ---- planted section ----------------------------------------
    # TRAIN docs sit where the rule can label them:
    #   degenerate n_filler=6  -> distinct <= 5+6 = 11/40 = 0.275 (low)
    #   clean n_distinct=30    -> 30/40 = 0.75 (high)
    # TEST docs of the same families sit in the abstain band:
    #   degenerate n_filler=16 -> ~21/40 = 0.525
    #   clean n_distinct=18    -> 18/40 = 0.45
    train_rows = [
        (i, _degenerate_doc(i, 6)) for i in range(N_PER_CLASS)
    ] + [
        (N_PER_CLASS + i, _clean_doc(i, 30)) for i in range(N_PER_CLASS)
    ]
    test_rows = [
        (10_000 + i, _degenerate_doc(1_000_000 + i, 16), "low")
        for i in range(N_PER_CLASS)
    ] + [
        (10_000 + N_PER_CLASS + i, _clean_doc(1_000_000 + i, 18), "high")
        for i in range(N_PER_CLASS)
    ]
    ptrain = spark.createDataFrame(
        train_rows, "doc_id long, text string"
    ).persist()
    ptest = spark.createDataFrame(
        test_rows, "doc_id long, text string, truth string"
    ).persist()

    # the weak rule labels EVERY train doc and NO test doc
    tr_lab = quality_weak_labels(ptrain)
    n_train_labeled = tr_lab.filter(F.col("label").isNotNull()).count()
    te_lab = quality_weak_labels(ptest)
    n_test_labeled = te_lab.filter(F.col("label").isNotNull()).count()
    ratios = te_lab.agg(
        F.min("distinct_ratio").alias("lo"),
        F.max("distinct_ratio").alias("hi"),
    ).collect()[0]

    ptrain_labeled = (
        ptrain.join(tr_lab.select("doc_id", "label"), "doc_id")
        .filter(F.col("label").isNotNull())
        .withColumnRenamed("label", "lang")
    )
    pmodel = langid_ngram_train(ptrain_labeled).persist()
    pmodel.count()

    joined = quality_classifier_score(ptest, pmodel).join(
        ptest.select(F.col("doc_id").alias("id"), "truth"), "id"
    ).persist()
    n_scored = joined.count()

    def _avg(df, col="ok"):
        return float(df.agg(F.avg(col)).collect()[0][0])

    acc = _avg(
        joined.select(
            (F.col("pred_label") == F.col("truth")).cast("int").alias("ok")
        )
    )
    recall_low = _avg(
        joined.filter("truth = 'low'").select(
            (F.col("pred_label") == "low").cast("int").alias("ok")
        )
    )
    recall_high = _avg(
        joined.filter("truth = 'high'").select(
            (F.col("pred_label") == "high").cast("int").alias("ok")
        )
    )
    med = joined.groupBy("truth").agg(
        F.expr("percentile(quality, 0.5)").alias("med_quality")
    ).collect()
    med_q = {r["truth"]: round(float(r["med_quality"]), 4) for r in med}

    # ---- documents section: the CONTRACT ENTRY's own train/apply ----
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    labels = quality_weak_labels(docs)
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
    split = docs.join(labels.select("doc_id", "label"), "doc_id").withColumn(
        "s", s
    )
    train = split.filter("s < 3 AND label IS NOT NULL").withColumnRenamed(
        "label", "lang"
    )
    model = langid_ngram_train(train).persist()
    n_model = model.count()
    held = split.filter("s = 3 AND label IS NOT NULL")
    agree = (
        quality_classifier_score(held, model)
        .join(held.select(F.col("doc_id").alias("id"), "label"), "id")
        .select(
            (F.col("pred_label") == F.col("label")).cast("int").alias("ok")
        )
        .agg(F.avg("ok").alias("acc"), F.count(F.lit(1)).alias("n"))
        .collect()[0]
    )

    out = {
        "planted": {
            "design": (
                "train: degenerate (spam loop / char run / phrase "
                "repetition, ratio 0.275) vs clean (varied vocab, "
                "ratio 0.75) — the weak rule labels all of them; "
                "test: SAME families tuned into the abstain band "
                "(0.40 < ratio < 0.60) — the rule labels none, so "
                "separation is trained char-trigram generalization"
            ),
            "n_train": len(train_rows),
            "train_rule_labeled": int(n_train_labeled),
            "n_test": len(test_rows),
            "test_rule_labeled": int(n_test_labeled),
            "n_scored": int(n_scored),
            "test_ratio_range": [
                round(float(ratios["lo"]), 4),
                round(float(ratios["hi"]), 4),
            ],
            "chance": 0.5,
            "accuracy": round(acc, 4),
            "recall_low_quality": round(recall_low, 4),
            "recall_high_quality": round(recall_high, 4),
            "median_quality_score_by_truth": med_q,
        },
        "documents_table": {
            "sf_dir": sf_dir,
            "model_rows": int(n_model),
            "n_heldout_labeled": int(agree["n"]),
            "rule_agreement_acc": round(float(agree["acc"]), 4),
            "note": (
                "agreement with the weak rule's own label on held-out "
                "docs the rule could label, training on the synthetic "
                "documents table exactly as the contract entry does — "
                "the synthetic table's shared vocabulary carries weak "
                "trigram signal (disclosed, same stance as "
                "LANGID_RECALL's documents section); the planted "
                "section pins real generalization"
            ),
        },
    }
    with open(os.path.join(REPO, "QUALITY_RECALL.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))
    ok = (
        n_test_labeled == 0
        and n_train_labeled == len(train_rows)
        and acc >= 0.9
    )
    print("RECEIPT OK" if ok else "RECEIPT WEAK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
