"""Measured answer to "does top-k-per-key need explicit salting on a
hot key?" — it does NOT on Spark >= 3.5, and this demo is the evidence.

Hypothesis going in: the single-window form (`row_number() OVER
(PARTITION BY key ORDER BY v) <= k`) sorts a hot key's entire row set
inside one task — the 100 TB straggler — so the hand-salted two-phase
rewrite (plans/skew.py salted_top_k) should win on a 95%-hot dataset.

What the measurement showed instead: Catalyst's InferWindowGroupLimit
(SPARK-37099, Spark >= 3.5) rewrites the rank-filter pattern into a
PARTIAL per-map-task top-k BELOW the shuffle (WindowGroupLimit
Partial/Final nodes, visible in the plan this script asserts on) — at
most map_tasks x k rows of any key cross the wire, the hot key's
final sort sees <= tasks x k rows, and the plain window matches or
beats the hand-salted form. Conclusion recorded for the repo: USE THE
PLAIN WINDOW (sample_k_per_stratum / sample_domain_cap do);
salted_top_k stays only as the fallback for patterns the rule can't
match. "Don't hand-schedule what the optimizer already does" — this
artifact is the receipt.

Both variants verified equal on (count, sum-of-v, sum-of-payload-len)
checksums; ~300 B/row payloads make the would-be skew real (narrow
rows sort too fast to measure anything).

Methodology (learned in tools/skew_demo.py the hard way): one
unmeasured FULL-SCALE warm-up absorbs fresh-JVM heap growth and
shuffle-dir page-cache warming, then best-of-REPS per variant.

Prints one JSON line; the round artifact TOPK_SKEW_DEMO.json records it.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the ~300 B/row checkpointed payload (see build) needs real heap: the
# default 8g session OOMs materializing it alongside the window sort
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")

from pyspark.sql import Window
from pyspark.sql import functions as F

from poc_spark.plans.skew import salted_top_k
from poc_spark.session import get_spark

ROWS = 10_000_000  # x ~300 B/row: the hot key alone is ~2.7 GB in ONE window task
K = 100
REPS = 2


def build(spark):
    # 95% of rows land on key "hot"; v == id gives a total order. The
    # ~256-byte payload is what makes the skew REAL: a first cut with
    # bare (key, v) rows measured the plain window FASTER (0.67 s vs
    # 1.37 s) — sorting 19M narrow longs in one task is trivially
    # cheap, so the salted form's second shuffle dominated. A hot
    # WINDOW key only hurts when the single task must sort/carry real
    # row mass; payloads are what production rows look like.
    payload = F.concat(*[F.sha2(F.col("id").cast("string"), 256)] * 4)
    return (
        spark.range(ROWS)
        .select(
            F.when(F.pmod("id", F.lit(20)) < 19, F.lit("hot"))
            .otherwise(F.concat(F.lit("k"), F.pmod("id", F.lit(997))))
            .alias("key"),
            F.col("id").alias("v"),
            payload.alias("payload"),
        )
        .localCheckpoint(eager=True)  # materialize ONCE: both variants
        # read the same blocks, and payload generation cost (sha2) is
        # excluded from the measured window/top-k work
    )


def plain_topk(df):
    w = Window.partitionBy("key").orderBy("v")
    return df.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= K
    )


def run_plain(df):
    return plain_topk(df).agg(
        F.count(F.lit(1)), F.sum("v"), F.sum(F.length("payload"))
    ).collect()[0]


def run_salted(df):
    out = salted_top_k(df, ["key"], ["v"], k=K, salt_n=32).agg(
        F.count(F.lit(1)), F.sum("v"), F.sum(F.length("payload"))
    )
    return out.collect()[0]


def main() -> None:
    spark = get_spark("topk-skew-demo")
    df = build(spark)

    # the claim hinges on the optimizer rule actually firing — assert it
    plan = plain_topk(df)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, "InferWindowGroupLimit did not fire"

    run_salted(df)  # full-scale warm-up, unmeasured

    results = {}
    checks = {}
    for name, fn in (("plain_window", run_plain), ("salted_top_k", run_salted)):
        best = float("inf")
        for _ in range(REPS):
            t0 = time.time()
            checks[name] = tuple(fn(df))
            best = min(best, time.time() - t0)
        results[name] = round(best, 3)

    assert checks["plain_window"] == checks["salted_top_k"], checks
    out = {
        "metric": "topk_skew_demo",
        "rows": ROWS,
        "k": K,
        "hot_share": 0.95,
        "plain_window_s": results["plain_window"],
        "salted_top_k_s": results["salted_top_k"],
        "salted_vs_plain": round(
            results["plain_window"] / results["salted_top_k"], 2
        ),
        "window_group_limit_in_plan": True,
        "conclusion": (
            "plain window already two-phase via InferWindowGroupLimit "
            "(Spark>=3.5): use it; salted_top_k is the fallback"
        ),
        "method": (
            "full-scale unmeasured warm-up then best-of-2 per variant; "
            "identical (count, sum_v, sum_payload_len) checksums "
            "asserted; ~300 B/row payloads; idle machine"
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
