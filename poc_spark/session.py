"""SparkSession factory.

Defaults are chosen for correctness-at-scale first:
  - AQE on: runtime shuffle coalescing + skew-join splitting, so the same
    plan survives a 100x scale-up without hand-tuning partition counts.
  - Arrow on: any pandas interchange (mapInPandas/applyInPandas paths in
    operators/) is batched, never per-row pickled.
  - CORRECTED time parser: tolerant `d.M.yyyy` parsing returns null on
    malformed input instead of failing the job (reference skips bad rows,
    backend/main.py:298-302 in /root/reference).
  - shuffle partitions default to the local core count; on a real cluster
    AQE coalesces, and callers can override via SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "poc_spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or min(
            os.cpu_count() or 4, 32
        )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.timeParserPolicy", "CORRECTED")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    return builder.getOrCreate()
