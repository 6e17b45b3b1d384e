"""Re-measure op_graph_flagship beside a SAME-SITTING machine probe
(r9 VERDICT what's-wrong #1: the entry moved 0.34 -> 0.53 s r8->r9 in
the driver bench with zero changes to network.py, breaching the repo's
own ±20% band; MACHINE_r09 was the weakest probe sitting of any round,
so the move needs the MINHASH_RECHECK_r09 treatment — a run
distribution next to a probe, not a point).

Method (identical to tools/profile_minhash's recheck): run the machine
probe in-process (same interleaved 5-sample spread), then one warm
Spark session, bench-identical timing (full plan to the noop sink,
table warm-up first), N back-to-back runs recorded raw.

Usage: python tools/graph_flagship_recheck.py [sf_dir] > GRAPH_RECHECK_rNN.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from tools.machine_probe import np_gemm_gflops, py_hash_mops, spark_fixed_s

    probe = {"py_hash_mops": [], "np_gemm_gflops": [], "spark_fixed_s": []}
    for _ in range(5):
        probe["py_hash_mops"].append(py_hash_mops(0.4))
        probe["np_gemm_gflops"].append(np_gemm_gflops(reps=1))
        probe["spark_fixed_s"].append(spark_fixed_s(reps=1))
    probe_summary = {
        k: {"min": min(v), "median": sorted(v)[len(v) // 2], "max": max(v)}
        for k, v in probe.items()
    }

    from poc_spark import contract
    from poc_spark.session import get_spark
    from poc_spark.sources.catalog import TABLES, load_table

    spark = get_spark("graph-flagship-recheck")
    for t in TABLES:
        load_table(spark, sf_dir, t).count()

    spec = contract.REGISTRY["op_graph_flagship"]
    runs = []
    for _ in range(8):
        t0 = time.perf_counter()
        spec.spark(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        runs.append(round(time.perf_counter() - t0, 4))

    steady = sorted(runs[2:])  # drop the two JIT/codegen warm-up runs
    out = {
        "round": 10,
        "why": (
            "r9 VERDICT what's-wrong #1: op_graph_flagship 0.3424 -> "
            "0.5332 s r8->r9 driver bench (+56%) with network.py "
            "untouched; MACHINE_r09 GEMM median 21.75 GFLOPs vs r8's "
            "223 — re-measure beside a same-sitting probe."
        ),
        "machine_probe_same_sitting": {
            "metric": "machine_probe",
            "cpus": os.cpu_count(),
            **probe_summary,
        },
        "r8_bench_sec": 0.3424,
        "r9_bench_sec": 0.5332,
        "runs_this_sitting_sec": runs,
        "steady_state_sec": {
            "min": steady[0],
            "median": steady[len(steady) // 2],
            "max": steady[-1],
        },
        "verdict": None,  # filled by the committer after reading runs
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
