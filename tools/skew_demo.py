"""Measured proof that the explicit salting rewrite (plans/skew.py) pays.

Scenario: inner equi-join where 95 % of the big side shares ONE key and
the small side is too big to broadcast. Three measurements:

  plain_aqe    — stock plan, AQE skew-join splitting ON (our session
                 default; defense #2 in plans/skew.py's hierarchy)
  plain_noaqe  — stock plan with AQE off: the single hot partition
                 serializes the join on one task (the 100 TB failure mode)
  salted_noaqe — salted_broadcast_join rewrite, AQE off: the hot key is
                 spread over salt_n tasks by construction

The join result feeds a per-row sha2 + 1-row aggregate, which executes
INSIDE the join-stage tasks: under a skewed plain plan the hot
partition's task serializes ~95 % of that work on one core, which is
exactly the 100 TB failure mode (one straggler pins the stage).

Measured shape (SKEW_DEMO.json, idle box): plain_noaqe 48.7 s >
plain_aqe 39.4 s > salted_noaqe 22.4 s. AQE's skew split helps but its
advisory-size granularity still leaves chunky tasks; explicit salting
(salt_n=32 matches the core count) spreads the hot key fully, and is
the only defense where AQE can't trigger at all (non-SMJ plans,
streaming micro-batches, aggregation states).

Methodology notes (measured the hard way):
  - the FIRST full-scale join in a fresh JVM absorbs 100-200 s of
    one-time cost (heap growth to steady state, shuffle-dir page-cache
    warming) that a small warm-up join does NOT amortize — interleaving
    configs without a full-scale warm-up mis-attributed that cost to
    whichever variant ran first. Hence: one unmeasured FULL-SCALE
    warm-up, then best-of-REPS per variant.
  - with a trivial post-join projection the shuffle WRITE of the big
    side dominates (~13 s flat for all three variants at 40 M rows) and
    skew is invisible — the reduce side must carry real work for the
    demo to measure what it claims to.

Prints one JSON line; the round artifact SKEW_DEMO.json records it.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from poc_spark.plans.skew import salted_broadcast_join

BIG_N = 40_000_000
N_KEYS = 200_000  # small side: one payload row per key (1:N join, no blow-up)
REPS = 2


def _big(spark: SparkSession):
    # 95 % of rows on key 0, the rest uniform — the classic hot key
    return spark.range(BIG_N).select(
        F.when(F.col("id") % 20 < 19, F.lit(0))
        .otherwise(F.col("id") % N_KEYS)
        .alias("key"),
        F.col("id").alias("v"),
    )


def _small(spark: SparkSession):
    return spark.range(N_KEYS).select(
        F.col("id").alias("key"),
        (F.col("id") * 3).alias("payload"),
    )


def _work(joined):
    """Per-row digest + 1-row aggregate; the projection and partial agg
    run inside the join-stage tasks, so a skewed join serializes them."""
    return joined.select(
        F.sha2(F.concat_ws(",", "key", "v", "payload"), 256).alias("h")
    ).agg(F.count(F.lit(1)).alias("n"), F.max("h").alias("hmax"))


def _time(df) -> float:
    start = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - start, 3)


def _best(thunk, reps: int = REPS) -> float:
    return min(_time(_work(thunk())) for _ in range(reps))


def run(spark: SparkSession) -> dict[str, float]:
    """Run the three measurements; restores session confs afterwards."""
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try:
        # forbid broadcast so the join genuinely shuffles both sides
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        # FULL-SCALE warm-up (see module doc): pay the fresh-JVM cost
        # here, attributed to no variant
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        _time(_work(_big(spark).join(_small(spark), "key")))

        plain_aqe = _best(lambda: _big(spark).join(_small(spark), "key"))

        spark.conf.set("spark.sql.adaptive.enabled", "false")
        plain_noaqe = _best(lambda: _big(spark).join(_small(spark), "key"))
        salted_noaqe = _best(
            lambda: salted_broadcast_join(
                _big(spark), _small(spark), "key", salt_n=32
            )
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
    return {
        "big_rows": BIG_N,
        "plain_aqe_s": plain_aqe,
        "plain_noaqe_s": plain_noaqe,
        "salted_noaqe_s": salted_noaqe,
        "salting_speedup": round(plain_noaqe / salted_noaqe, 2),
        "salted_vs_aqe": round(plain_aqe / salted_noaqe, 2),
    }


def main() -> None:
    from poc_spark.session import get_spark

    spark = get_spark("skew-demo")
    print(json.dumps({"metric": "skew_demo", **run(spark)}))
    spark.stop()


if __name__ == "__main__":
    main()
