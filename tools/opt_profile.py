"""Per-entry optimization profiler (r14/r15 optimization rounds).

Times individual contract entries exactly the way bench.py does (full
plan through the noop sink, labeled jobs) and dumps
`explain("formatted")` into plans/<round>/<name>_<tag>.txt so plan
claims in OPTIMIZATION_r{N}.md are checkable without running Spark.

Usage:
  python tools/opt_profile.py [--sf SF_DIR] [--runs N] [--tag before|after]
                              [--round r15] [--plans-only] name [name ...]

Prints one line per run per entry plus a best-of summary; exits 0.
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--tag", default=None, help="write plans/<round>/<name>_<tag>.txt")
    ap.add_argument("--round", default="r15")
    ap.add_argument("--plans-only", action="store_true")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from poc_spark import contract
    from poc_spark.session import get_spark
    from poc_spark.sources.catalog import TABLES, load_table

    spark = get_spark("opt-profile")
    for t in TABLES:
        load_table(spark, args.sf, t).count()

    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        getattr(args, "round"),
    )

    for name in args.names:
        spec = contract.REGISTRY[name]
        if args.tag:
            os.makedirs(plans_dir, exist_ok=True)
            df = spec.spark(spark, args.sf)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(plans_dir, f"{name}_{args.tag}.txt"), "w") as fh:
                fh.write(buf.getvalue())
            print(
                f"PLAN {name} -> plans/{getattr(args, 'round')}/"
                f"{name}_{args.tag}.txt"
            )
            if args.plans_only:
                continue
        times = []
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"opt:{name}#{i}")
            t0 = time.perf_counter()
            spec.spark(spark, args.sf).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.perf_counter() - t0
            times.append(dt)
            print(f"RUN  {name} #{i}: {dt:.3f}s")
        spark.sparkContext.setJobDescription(None)
        print(f"BEST {name}: {min(times):.3f}s over {len(times)} runs")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
