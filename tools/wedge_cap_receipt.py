"""Receipt for the Adamic-Adar hub-degree cap (operators/graph.py):
on a planted power-law graph with a 10^3-degree hub, record the wedge
volume with and without `max_wedge_degree`, and that scores over
non-hub shared neighbors are bit-identical. Writes
WEDGE_CAP_RECEIPT.json at the repo root.

Run: python tools/wedge_cap_receipt.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from poc_spark.operators.graph import _directed, adamic_adar  # noqa: E402
from poc_spark.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark("wedge-cap-receipt")
    hub_deg = 1000
    cap = 10
    # hub H-a0..a999, plus 20 low-degree wedges xi-mi, yi-mi and a few
    # hub-adjacent low-degree wedges (a0, a1 share low-degree node w)
    rows = [("H", f"a{i}", 1) for i in range(hub_deg)]
    rows += [(f"x{i}", f"m{i}", 1) for i in range(20)]
    rows += [(f"y{i}", f"m{i}", 1) for i in range(20)]
    rows += [("a0", "w", 1), ("a1", "w", 1)]
    edges = spark.createDataFrame(
        rows, "source string, target string, weight long"
    )

    def wedge_volume(max_deg):
        deg = (
            _directed(edges)
            .groupBy("src")
            .agg(F.count(F.lit(1)).alias("dz"))
            .filter(F.col("dz") >= 2)
        )
        if max_deg is not None:
            deg = deg.filter(F.col("dz") <= max_deg)
        row = deg.agg(
            F.sum(F.col("dz") * (F.col("dz") - 1) / 2).alias("w"),
            F.count(F.lit(1)).alias("n_z"),
        ).collect()[0]
        return int(row["w"] or 0), int(row["n_z"])

    w_uncapped, z_uncapped = wedge_volume(None)
    w_capped, z_capped = wedge_volume(cap)

    t0 = time.time()
    capped = {
        (r["u"], r["v"]): r["score"]
        for r in adamic_adar(edges, max_wedge_degree=cap).collect()
    }
    t_capped = round(time.time() - t0, 3)
    t0 = time.time()
    uncapped = {
        (r["u"], r["v"]): r["score"]
        for r in adamic_adar(edges).collect()
    }
    t_uncapped = round(time.time() - t0, 3)

    # every capped pair's score must equal the uncapped score for pairs
    # whose shared neighbors are ALL low-degree (here: the xi-yi pairs
    # via mi, and a0-a1 via w — a0/a1 ALSO share hub H, so their capped
    # score must be the w-only contribution, strictly below uncapped)
    non_hub_equal = all(
        uncapped[p] == s for p, s in capped.items() if p != ("a0", "a1")
    )
    a01_drops_hub_term = capped[("a0", "a1")] < uncapped[("a0", "a1")]

    receipt = {
        "hub_degree": hub_deg,
        "cap": cap,
        "wedge_volume_uncapped": w_uncapped,
        "wedge_volume_capped": w_capped,
        "z_nodes_uncapped": z_uncapped,
        "z_nodes_capped": z_capped,
        "budget_bound_kept_z_times_cap_sq_over_2": z_capped * cap * cap // 2,
        "capped_within_budget": w_capped <= z_capped * cap * cap / 2,
        "pairs_uncapped": len(uncapped),
        "pairs_capped": len(capped),
        "non_hub_scores_unchanged": non_hub_equal,
        "hub_term_dropped_for_hub_adjacent_pair": a01_drops_hub_term,
        "wall_capped_s": t_capped,
        "wall_uncapped_s": t_uncapped,
    }
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "WEDGE_CAP_RECEIPT.json",
    )
    with open(out, "w") as f:
        json.dump(receipt, f, indent=1)
    print(json.dumps(receipt, indent=1))
    ok = (
        receipt["capped_within_budget"]
        and non_hub_equal
        and a01_drops_hub_term
        and w_capped < w_uncapped / 100
    )
    print("RECEIPT OK" if ok else "RECEIPT FAILED")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
