"""Container-speed calibration probe — prints ONE JSON line.

Bench wall-times drift between rounds because the container changes
under the repo (measured in round 5: identical code, 8.57 s headline
before an environment restart, 10.93 s after). This probe measures the
MACHINE, not the engine, so cross-round bench comparisons can be
normalized: run it next to bench.py and divide.

Three independent axes:
  - py_hash_mops:   single-thread CPython throughput (md5 over a fixed
                    buffer) — scalar/driver-side speed;
  - np_gemm_gflops: numpy BLAS dense matmul — vectorized kernel speed
                    (the Pandas-UDF axis);
  - spark_fixed_s:  a fixed small Spark job (range → hash agg), warm,
                    best of 3 — JVM/codegen/job-scheduling overhead,
                    the term that dominates sub-second bench entries.

Usage: python tools/machine_probe.py  (writes nothing; pipe to a file)
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def py_hash_mops(seconds: float = 1.0) -> float:
    buf = b"x" * 256
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < seconds:
        for _ in range(1000):
            hashlib.md5(buf)
        n += 1000
    return round(n / (time.perf_counter() - t0) / 1e6, 4)


def np_gemm_gflops(size: int = 1024, reps: int = 3) -> float:
    import numpy as np

    rng = np.random.default_rng(42)
    a = rng.random((size, size), dtype=np.float64)
    b = rng.random((size, size), dtype=np.float64)
    a @ b  # warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        a @ b
        best = min(best, time.perf_counter() - t0)
    return round(2 * size**3 / best / 1e9, 2)


def spark_fixed_s(reps: int = 3) -> float:
    from pyspark.sql import functions as F

    from poc_spark.session import get_spark

    spark = get_spark("machine-probe")
    job = lambda: (  # noqa: E731
        spark.range(0, 5_000_000)
        .select(F.xxhash64("id").alias("h"))
        .groupBy(F.pmod("h", F.lit(1024)).alias("b"))
        .agg(F.count(F.lit(1)).alias("n"))
        .write.format("noop").mode("overwrite").save()
    )
    job()  # warm: codegen + JIT
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        job()
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def main() -> None:
    # interleaved samples: the container's available CPU fluctuates
    # minute to minute (measured 20 -> 242 GFLOPs across back-to-back
    # runs — noisy neighbors), so a single sample misleads; report the
    # spread and compare rounds on the MEDIAN.
    samples = {
        "py_hash_mops": [],
        "np_gemm_gflops": [],
        "spark_fixed_s": [],
    }
    for _ in range(5):
        samples["py_hash_mops"].append(py_hash_mops(0.4))
        samples["np_gemm_gflops"].append(np_gemm_gflops(reps=1))
        samples["spark_fixed_s"].append(spark_fixed_s(reps=1))
    summary = {
        k: {
            "min": min(v),
            "median": sorted(v)[len(v) // 2],
            "max": max(v),
        }
        for k, v in samples.items()
    }
    print(
        json.dumps(
            {"metric": "machine_probe", "cpus": os.cpu_count(), **summary}
        )
    )


if __name__ == "__main__":
    main()
