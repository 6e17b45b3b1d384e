"""A/B receipt for dedup_suffix_spans vs the 13-gram hash profile
(VERDICT r12 #7): plant a SHARED 200-token passage at the end of a
strided subset of sf0.1 documents and show that

  - the suffix-window form reports it as structure: ONE maximal span of
    exactly 200 tokens per planted doc (the suffix-array output a
    scrubber acts on);
  - the 13-gram hash profile reports the same duplication only as
    ~188 anonymous duplicated gram slots — correct counts, no span
    boundaries;
  - both agree on WHICH docs are affected, and walls are comparable
    (the suffix form shuffles window strings instead of 60-bit hashes —
    the exactness trade the operator docstring states).

Writes SUFFIX_SPANS_AB_r13.json.
Usage: python tools/suffix_spans_ab.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PASSAGE_TOKENS = 200
STRIDE = 97  # plant into doc_id % STRIDE == 0


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from poc_spark.operators.dedup import (
        duplicated_ngram_spans,
        duplicated_suffix_spans,
    )
    from poc_spark.session import get_spark
    from poc_spark.sources.catalog import load_table

    spark = get_spark("suffix-spans-ab")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    )

    # deterministic planted passage: 200 synthetic tokens no real doc
    # contains (so its span boundaries are knowable exactly)
    passage = " ".join(f"zqplant{i:04d}" for i in range(PASSAGE_TOKENS))
    planted = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % STRIDE == 0,
            F.concat("text", F.lit(" " + passage)),
        ).otherwise(F.col("text")),
    ).localCheckpoint()
    planted_ids = {
        int(r["doc_id"])
        for r in planted.filter(F.col("doc_id") % STRIDE == 0)
        .select("doc_id")
        .collect()
    }

    t0 = time.perf_counter()
    suffix = {
        int(r["id"]): r.asDict()
        for r in duplicated_suffix_spans(planted, k=13).collect()
    }
    suffix_wall = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    grams = {
        int(r["id"]): r.asDict()
        for r in duplicated_ngram_spans(
            planted, n=13, hash_fn="xxhash64"
        ).collect()
    }
    gram_wall = round(time.perf_counter() - t0, 2)

    sp = [suffix[i] for i in sorted(planted_ids)]
    gp = [grams[i] for i in sorted(planted_ids)]
    # docs flagged by each form OUTSIDE the plant (organic duplication)
    organic_suffix = sum(
        1
        for i, r in suffix.items()
        if i not in planted_ids and r["covered_tokens"] > 0
    )
    organic_gram = sum(
        1
        for i, r in grams.items()
        if i not in planted_ids and r["n_dup_grams"] > 0
    )

    out = {
        "sf_dir": sf_dir,
        "n_docs": len(suffix),
        "n_planted": len(planted_ids),
        "passage_tokens": PASSAGE_TOKENS,
        "suffix_form": {
            "wall_sec": suffix_wall,
            "planted_max_span": sorted({r["max_span"] for r in sp}),
            "planted_docs_with_exact_200_span": sum(
                1 for r in sp if r["max_span"] == PASSAGE_TOKENS
            ),
            "planted_n_spans": sorted({r["n_spans"] for r in sp}),
            "organic_docs_flagged": organic_suffix,
        },
        "gram_hash_form": {
            "wall_sec": gram_wall,
            "planted_n_dup_grams": sorted({r["n_dup_grams"] for r in gp}),
            "expected_gram_slots_for_passage": PASSAGE_TOKENS - 13 + 1,
            "organic_docs_flagged": organic_gram,
            "note": (
                "the hash profile counts duplicated 13-gram SLOTS — it "
                "cannot say the slots form one contiguous 200-token "
                "passage, which is exactly what the suffix form's "
                "max_span/n_spans add"
            ),
        },
        "agreement": {
            "planted_docs_flagged_by_both": sum(
                1
                for i in planted_ids
                if suffix[i]["covered_tokens"] > 0
                and grams[i]["n_dup_grams"] > 0
            ),
        },
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SUFFIX_SPANS_AB_r13.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
