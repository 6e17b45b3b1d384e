"""Re-measure specific contract entries beside a SAME-SITTING machine
probe — the GRAPH_RECHECK_r10 / MINHASH_RECHECK_r09 methodology as a
general tool (r10 VERDICT #2 asked for receipts on dedup_minhash_lsh,
which breached its own 3.4±0.3 s re-baselined band at 4.18 s, and the
streaming tier, whose +43-66% moves rode a probe-less sitting).

Method: interleaved 5-sample machine probe first, then one warm Spark
session (bench-identical: full plan to the noop sink, all tables
warmed), N back-to-back runs per entry recorded raw; steady state
drops the first two JIT/codegen runs.

Usage:
  python tools/entry_recheck.py OUT.json entry[:N] [entry[:N] ...]
         [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    out_path, specs = args[0], args[1:]

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

    spark = get_spark("entry-recheck")
    for t in TABLES:
        load_table(spark, sf_dir, t).count()

    entries = {}
    for s in specs:
        name, _, n = s.partition(":")
        n = int(n) if n else 6
        spec = contract.REGISTRY[name]
        runs = []
        for _ in range(n):
            t0 = time.perf_counter()
            spec.spark(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.perf_counter() - t0, 4))
        steady = sorted(runs[2:]) if len(runs) > 3 else sorted(runs)
        entries[name] = {
            "runs_sec": runs,
            "steady_state_sec": {
                "min": steady[0],
                "median": steady[len(steady) // 2],
                "max": steady[-1],
            },
        }

    out = {
        "sf_dir": sf_dir,
        "machine_probe_same_sitting": {
            "metric": "machine_probe",
            "cpus": os.cpu_count(),
            **probe_summary,
        },
        "entries": entries,
        "verdict": None,  # filled by the committer after reading runs
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    print(f"wrote {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
