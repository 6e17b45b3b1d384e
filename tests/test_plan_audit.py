"""Plan-shape regression pins via tools/plan_audit.py: the entries with
hand-built physical strategies must never silently fall back to an
interpreted nested-loop plan."""

from __future__ import annotations

import sys

sys.path.insert(0, "tools")


PINNED = [
    "dedup_ngram_jaccard",  # popcount band equi-join, not mask x mask NLJ
    "dedup_semantic_buckets",  # bucket equi-join
    "dedup_ngram_spans",  # window over collapsed table, no self-join
    "dedup_minhash_lsh",  # band-bucket equi-join
    "q_range_bucket_join",  # bucketized rewrite of the theta join
    "graph_pagerank",  # broadcast-hash iteration joins
    "text_winnowing",
    "mm_resize",
    "dedup_containment",  # size-band equi-join over distinct masks
]


def test_no_unexpected_nested_loops(spark, sf_dir):
    from plan_audit import BNLJ_OK, audit_one

    import __spark_entry__ as entry_mod

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        qs = entry_mod.queries()
        for name in PINNED:
            rec = audit_one(name, qs[name](spark, sf_dir))
            assert name in BNLJ_OK or (
                rec["bnlj"] == 0 and rec["cartesian"] == 0
            ), f"{name}: unexpected nested-loop plan"
            assert rec["codegen"] >= 1, f"{name}: no codegen stage"
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
