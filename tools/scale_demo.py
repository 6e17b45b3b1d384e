"""Scale demonstration: flagship lag-edge analysis on a multi-million-
line chat, three ways —

  1. the reference's single-thread Python loop (tests/reference_oracle
     — the behavioral twin of backend/main.py:255-342);
  2. the engine with the global window FORCED (what a naive port would
     run: one partition, one big sort);
  3. the engine as shipped — the size dispatcher sees the input is past
     the threshold and routes to the range-chunked boundary-stitched
     plan automatically.

All three must produce identical edge multisets; 2 vs 3 is the scale
story (the gap widens with input size — at 100 TB, 2 is a stuck
executor and 3 is a normal shuffle).

Usage: python tools/scale_demo.py [n_lines]   (default 10_000_000)
Writes the chat under .tmp/scale_demo/ (gitignored) and prints one
JSON line with the timings.
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

SENDERS = [
    "Alice", "Bob", "Carol", "Dave", "Eve", "Frank", "Grace", "Heidi",
    "Ivan", "Judy", "Mallory", "Niaj", "Olivia", "Peggy", "Rupert",
    "Sybil", "Trent", "Victor", "Walter", "Yolanda",
]


def generate(path: str, n_lines: int, seed: int = 7) -> None:
    rng = random.Random(seed)
    base_day, base_month = 1, 10
    with open(path, "w", encoding="utf-8") as f:
        minute = 0
        for i in range(n_lines):
            if i % 977 == 0:
                minute += 1
            day = base_day + (minute // 1440) % 27
            hh = (minute // 60) % 24
            mm = minute % 60
            sender = SENDERS[rng.randrange(len(SENDERS))]
            f.write(
                f"[{day}.{base_month}.2023, {hh:02d}:{mm:02d}:{i % 60:02d}] "
                f"{sender}: message {i} lorem ipsum\n"
            )


def main() -> None:
    n_lines = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    workdir = os.path.join(REPO, ".tmp", "scale_demo")
    os.makedirs(workdir, exist_ok=True)
    chat = os.path.join(workdir, f"chat_{n_lines}.txt")
    if not os.path.exists(chat):
        t0 = time.perf_counter()
        generate(chat, n_lines)
        print(f"generated {n_lines} lines in {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)

    # 1. reference loop (single thread, pure python)
    from reference_oracle import analyze_network

    t0 = time.perf_counter()
    with open(chat, encoding="utf-8") as f:
        _, ref_edges = analyze_network(f.read().splitlines())
    t_ref = time.perf_counter() - t0

    from poc_spark.operators.network import lag_edges
    from poc_spark.plans.dispatch import CHUNK_FORCE_KEY
    from poc_spark.session import get_spark
    from poc_spark.sources.chat import read_chat_lines
    from poc_spark.functions.chat_parse import parse_chat_lines

    spark = get_spark("scale-demo")

    def run_engine(force: str) -> tuple[float, dict]:
        spark.conf.set(CHUNK_FORCE_KEY, force)
        msgs = parse_chat_lines(read_chat_lines(spark, chat))
        t0 = time.perf_counter()
        rows = lag_edges(msgs, "sender", ("line_id",)).collect()
        return time.perf_counter() - t0, {
            (r["source"], r["target"]): r["weight"] for r in rows
        }

    t_global, edges_global = run_engine("false")
    t_chunked, edges_chunked = run_engine("true")
    spark.conf.unset(CHUNK_FORCE_KEY)

    assert edges_global == edges_chunked == dict(ref_edges), "edge sets differ!"
    print(
        json.dumps(
            {
                "n_lines": n_lines,
                "reference_loop_sec": round(t_ref, 2),
                "engine_global_window_sec": round(t_global, 2),
                "engine_chunked_auto_sec": round(t_chunked, 2),
                "n_edges": len(edges_chunked),
                "identical_results": True,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
