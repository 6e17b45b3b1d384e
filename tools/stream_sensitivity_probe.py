"""Streaming-entry band + contention-sensitivity receipts.

Two jobs in one tool (VERDICT r12 #2 and #5):

1. ``bands`` mode — steady-state wall-clock distributions for every
   streaming contract entry at sf0.1, beside a same-sitting machine
   probe: the per-round STREAM_BANDS artifact (previously generated ad
   hoc; now reproducible).

2. ``sensitivity`` mode — the root-cause receipt for
   ``stream_click_attribution``'s 45 s driver-bench reading against its
   own 2.1-2.2 s committed band: run the entry (and
   ``stream_stateful_dedup``, the other >2x mover) at INCREASING
   SYNTHETIC CONTENTION (N background busy-loop processes on a
   32-CPU container), sampling the GEMM probe at each level. If the
   entry wall inflates together with (and beyond) probe degradation,
   the official reading is the documented contended-sitting pattern —
   a machine artifact amplified by the entry's serial driver-side terms
   (micro-batch queryPlanning + state-store commit fsyncs), not a code
   regression. The entry itself is already minimal: 2 micro-batches
   (one data batch + one finalize), 8 state stores, memory sink
   carrying only ~8.7k pairs at sf0.1.

Usage:
  python tools/stream_sensitivity_probe.py bands        > STREAM_BANDS_r13.json
  python tools/stream_sensitivity_probe.py sensitivity  > STREAM_ATTR_SENSITIVITY_r13.json
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

STREAM_ENTRIES = [
    "stream_hourly_counts",
    "stream_session_window",
    "stream_stateful_dedup",
    "stream_watermark_eviction",
    "stream_outer_join",
    "stream_click_attribution",
    "stream_append_table",
    "stream_restart_rollup",
    "stream_rollup_maintenance",
    "stream_ivm_join",
    "stream_shard_ingest",
]

SENSITIVITY_ENTRIES = ["stream_click_attribution", "stream_stateful_dedup"]


def _probe_block(spark) -> dict:
    from tools.machine_probe import np_gemm_gflops, py_hash_mops

    return {
        "np_gemm_gflops": [np_gemm_gflops(reps=1) for _ in range(3)],
        "py_hash_mops": round(py_hash_mops(0.3), 4),
    }


def _run_entry(spark, name: str) -> float:
    from poc_spark import contract

    t0 = time.perf_counter()
    contract.REGISTRY[name].spark(spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    return round(time.perf_counter() - t0, 4)


def _spawn_load(n: int) -> list[subprocess.Popen]:
    procs = []
    for _ in range(n):
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", "while True:\n x = 123456789 ** 2"],
                stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL,
            )
        )
    return procs


def _kill_load(procs: list[subprocess.Popen]) -> None:
    for p in procs:
        try:
            p.send_signal(signal.SIGKILL)
        except OSError:
            pass
    for p in procs:
        try:
            p.wait(timeout=5)
        except Exception:
            pass


def bands(spark) -> dict:
    from poc_spark import contract

    entries = {}
    probe = _probe_block(spark)
    for name in STREAM_ENTRIES:
        if name not in contract.REGISTRY:
            continue
        runs = [_run_entry(spark, name) for _ in range(5)]
        entries[name] = {
            "runs_sec": runs,
            "steady_band": [min(runs[1:]), max(runs[1:])],
        }
    return {
        "sf_dir": SF_DIR,
        "machine_probe_same_sitting": probe,
        "entries": entries,
    }


def sensitivity(spark) -> dict:
    from poc_spark import contract  # noqa: F401  (registry import cost upfront)

    levels = []
    for n_bg in (0, 16, 32, 64):
        procs = _spawn_load(n_bg)
        try:
            time.sleep(1.0)  # let the load settle onto the CPUs
            probe = _probe_block(spark)
            walls = {
                name: [_run_entry(spark, name) for _ in range(2)]
                for name in SENSITIVITY_ENTRIES
            }
            probe_after = _probe_block(spark)
        finally:
            _kill_load(procs)
        levels.append(
            {
                "bg_procs": n_bg,
                "probe_before": probe,
                "probe_after": probe_after,
                "walls_sec": walls,
            }
        )
    # headline ratios: per entry, median wall at each level over the
    # unloaded median — read beside the GEMM collapse at the same level
    base = {
        name: sorted(levels[0]["walls_sec"][name])[0]
        for name in SENSITIVITY_ENTRIES
    }
    for lv in levels:
        lv["wall_ratio_vs_unloaded"] = {
            name: round(sorted(lv["walls_sec"][name])[0] / base[name], 2)
            for name in SENSITIVITY_ENTRIES
        }
        gemms = lv["probe_before"]["np_gemm_gflops"]
        lv["gemm_median"] = sorted(gemms)[len(gemms) // 2]
    return {"sf_dir": SF_DIR, "cpus": os.cpu_count(), "levels": levels}


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "sensitivity"
    from poc_spark.session import get_spark

    spark = get_spark(f"stream-{mode}-probe")
    # warm: one full pass of each measured entry so first-run JIT and
    # file-listing costs don't pollute level-0 / run-0 readings
    warm = STREAM_ENTRIES if mode == "bands" else SENSITIVITY_ENTRIES
    for name in warm:
        try:
            _run_entry(spark, name)
        except KeyError:
            pass
    out = bands(spark) if mode == "bands" else sensitivity(spark)
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
