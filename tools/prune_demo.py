"""Measured proof that the hive-partitioned layout (sources/lake.py)
turns a selective filter into listing-time pruning.

Scenario: a documents-shaped corpus blown up to N rows, written twice —
flat parquet vs `partitionBy(lang)` — then the SAME two-language
aggregate query (2 of 5 langs ≈ 40 % of rows) runs over each layout.

  flat        — the filter reaches the scan only as a row-group-level
                PushedFilter: every file is opened and its dictionary/
                stats consulted; with langs interleaved in every file,
                all bytes of the text column in matching row groups
                still decode
  partitioned — the filter resolves in the InMemoryFileIndex BEFORE the
                scan: only lang=en/ and lang=de/ directories are listed,
                3/5 of the corpus is never opened at all

The query carries a real per-row cost (md5 checksum of text) so the
measurement reflects decode+compute on the rows actually read, the
quantity partition pruning bounds. At 100 TB the flat layout's listing
alone (every file of every lang) also costs driver memory and S3 LIST
calls; that axis isn't measurable at this scale but compounds the win.

Methodology (per SKEW_DEMO precedent): one unmeasured full-scale
warm-up per layout+scenario, then best-of-2 per variant, idle box.

Measured shape (PRUNE_DEMO.json, 2M rows, local NVMe): 1.5x at 40 %
selectivity, 1.35x at 15 %. The local numbers UNDERSTATE the at-scale
win: on page-cached NVMe the per-file open cost is microseconds and
the flat layout's PushedFilters still skip non-matching row groups
cheaply, so the residual flat cost is mostly decoding the filter
column across all files. On S3/HDFS at 100 TB each skipped file is a
saved LIST+GET round-trip and the driver's file index shrinks by the
same 3/5 — the axes this demo cannot measure locally compound the
measured decode win.

Prints one JSON line; the round artifact PRUNE_DEMO.json records it.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from poc_spark.session import get_spark

ROWS_FACTOR = 400  # sf0.1 documents (5k rows) x 400 = 2M rows
FLAT = ".tmp/prune_demo/flat"
PART = ".tmp/prune_demo/part"


def _query(df, langs):
    return (
        df.filter(F.col("lang").isin(*langs))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.conv(F.substring(F.md5("text"), 1, 10), 16, 10).cast(
                    "long"
                )
            ).alias("checksum"),
        )
        .collect()[0]
    )


def main() -> None:
    spark = get_spark("prune-demo")
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    big = docs.crossJoin(
        spark.range(ROWS_FACTOR).select(F.col("id").alias("rep"))
    ).select("doc_id", "rep", "text", "lang", "source", "n_chars")
    n_rows = big.count()

    shutil.rmtree(".tmp/prune_demo", ignore_errors=True)
    big.write.mode("overwrite").parquet(FLAT)
    big.write.mode("overwrite").partitionBy("lang").parquet(PART)

    out = {"metric": "prune_demo", "rows": n_rows}
    scenarios = {
        "two_lang_40pct": ("en", "de"),
        "one_lang_15pct": ("zh",),
    }
    for label, langs in scenarios.items():
        timings = {}
        results = {}
        for name, path in (("flat", FLAT), ("partitioned", PART)):
            _query(spark.read.parquet(path), langs)  # unmeasured warm-up
            best = float("inf")
            for _ in range(2):
                t0 = time.monotonic()
                results[name] = _query(spark.read.parquet(path), langs)
                best = min(best, time.monotonic() - t0)
            timings[name] = round(best, 3)
        assert tuple(results["flat"]) == tuple(results["partitioned"])
        out[label] = {
            "flat_s": timings["flat"],
            "partitioned_s": timings["partitioned"],
            "pruning_speedup": round(
                timings["flat"] / timings["partitioned"], 2
            ),
        }
    out["method"] = (
        "2M-row blowup of sf0.1 documents; per-layout+scenario "
        "full-scale warm-up then best-of-2; results asserted equal; "
        "idle machine"
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
