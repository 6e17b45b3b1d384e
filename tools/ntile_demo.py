"""Chunked-ntile crossover measurement — prints ONE JSON line.

The exact chunk-parallel ntile (plans/ntile.py) exists so quantile
bucketing survives scale; this demo measures the crossover against the
global single-partition window on a synthetic scored table:

  1. global ntile(10) OVER (ORDER BY score, id) — one partition sorts
     everything;
  2. chunked_ntile(10) — range chunks + driver prefix-sum + per-chunk
     windows.

Both must produce identical buckets (asserted on a sample); the timing
gap is the scale story: the global window serializes the whole sort
through one task while the chunked form keeps all cores busy.

Usage: python tools/ntile_demo.py [n_rows]   (default 10_000_000)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from poc_spark.plans.ntile import chunked_ntile
    from poc_spark.session import get_spark

    spark = get_spark("ntile-demo")
    # deterministic synthetic scores, materialized once so both forms
    # time the WINDOW, not the generator
    df = (
        spark.range(0, n)
        .select(
            F.col("id"),
            (F.xxhash64("id") % 1_000_000).cast("double").alias("score"),
        )
        .localCheckpoint(eager=True)
    )

    t0 = time.perf_counter()
    w = Window.orderBy("score", "id")
    glob = df.withColumn("b", F.ntile(10).over(w))
    glob.write.format("noop").mode("overwrite").save()
    t_global = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    chunked = chunked_ntile(df, 10, ("score", "id"), num_chunks=64,
                            bucket_col="b")
    chunked.write.format("noop").mode("overwrite").save()
    t_chunked = round(time.perf_counter() - t0, 3)

    # equality check on a SMALL separate run (re-collecting from the
    # 10M plans would re-execute both full windows — including the
    # single-partition sort — doubling the demo's real wall time); the
    # pytest/Hypothesis suite pins bit-equality exhaustively
    small = (
        spark.range(0, 200_000)
        .select(
            F.col("id"),
            (F.xxhash64("id") % 1_000_000).cast("double").alias("score"),
        )
        .localCheckpoint(eager=True)
    )
    g = {
        r["id"]: r["b"]
        for r in small.withColumn("b", F.ntile(10).over(w)).collect()
    }
    c = {
        r["id"]: r["b"]
        for r in chunked_ntile(
            small, 10, ("score", "id"), num_chunks=64, bucket_col="b"
        ).collect()
    }
    assert g == c

    print(
        json.dumps(
            {
                "metric": "ntile_crossover",
                "n_rows": n,
                "global_window_s": t_global,
                "chunked_s": t_chunked,
                "speedup": round(t_global / t_chunked, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
