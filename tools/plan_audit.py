"""Physical-plan audit over the whole contract registry.

For every entry, build the DataFrame at a small SF (plan shape is
SF-independent), capture `explain("formatted")`, and grade the plan on
the properties that matter at 100 TB:

  - no accidental BroadcastNestedLoopJoin / CartesianProduct (the
    interpreted quadratic paths); a small whitelist covers the
    LEGITIMATE 1-row-scalar cross joins (a broadcast of one aggregate
    row is a constant, not a quadratic risk),
  - WholeStageCodegen present (the expression work is JVM-compiled),
  - parquet scans carry PushedFilters / pruned ReadSchema where the
    query filters or projects.

Usage:
  python tools/plan_audit.py [sf_dir]          # writes PLAN_AUDIT.md
  python tools/plan_audit.py --check <names>   # exit 1 on findings
                                                (used by pytest)
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# 1-row-aggregate scalar crosses: the broadcast side is a single row by
# construction (global avg / total / query vector), so the nested-loop
# join is a constant-time pattern, not a quadratic plan.
BNLJ_OK = {
    "q8_market_share",  # year share: 1-row denominators per group join
    "q11_important_parts",  # global value threshold (1-row aggregate)
    "q14_promo_revenue",  # promo/total ratio (1-row)
    "q17_small_qty_revenue",  # per-part avg qty correlated scalar
    "q22_idle_balances",  # global avg balance (1-row)
    "q2_min_cost_supplier",  # per-part min cost correlated scalar
    "q15_top_supplier",  # global max revenue (1-row)
    "q_profile_orders",  # describe-style single-row aggregates
    "dedup_embedding_cosine",  # audit-slice verify; blocked-GEMM mapInPandas
    "q_group_ols",  # tiny per-group coefficient cross
    "text_tfidf",  # corpus size N: broadcast 1-row aggregate (idf = ln(N/df))
    "sketch_hll_union",  # bound check: 1-row exact count x 1-row union estimate
    "text_unigram_lm",  # corpus token total T: broadcast 1-row aggregate
    "text_bigram_lm",  # same corpus total T: broadcast 1-row aggregate
    "sample_temperature",  # c_max: broadcast 1-row aggregate
    "text_perplexity_bucket",  # inherits text_unigram_lm's 1-row total
    "text_bm25_topk",  # corpus stats (N docs, T tokens): 1-row broadcast
    "text_pmi_collocations",  # token total T + bigram total B: 1-row each
    "q_scd2_build",  # corpus-midpoint T0 bounds: 1-row broadcast
    "text_domain_divergence",  # corpus token total T: 1-row broadcast
    "graph_modularity",  # edge total m: 1-row broadcast
    "text_keywords",  # inherits text_tfidf's corpus-size 1-row broadcast
}


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def audit_one(name: str, df) -> dict:
    plan = plan_of(df)
    return {
        "name": name,
        "bnlj": plan.count("BroadcastNestedLoopJoin"),
        "cartesian": plan.count("CartesianProduct"),
        # formatted mode tags codegen'd operators "[codegen id : N]";
        # count distinct stage ids, not operator occurrences
        "codegen": len(
            {
                line.split("codegen id : ")[1].split("]")[0]
                for line in plan.splitlines()
                if "codegen id : " in line
            }
        ),
        "bhj": plan.count("BroadcastHashJoin"),
        "smj": plan.count("SortMergeJoin"),
        "shj": plan.count("ShuffledHashJoin"),
        "pushed": "PushedFilters: [" in plan
        and "PushedFilters: []" not in plan,
        "plan": plan,
    }


def main() -> int:
    argv = sys.argv[1:]
    check_only = None
    if argv and argv[0] == "--check":
        check_only = set(argv[1:])
        argv = []
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"

    import __spark_entry__ as entry_mod
    from poc_spark.session import get_spark

    spark = get_spark("plan-audit")
    # static plans only: AQE wraps everything in AdaptiveSparkPlan and
    # omits codegen annotations until execution. The audit grades the
    # DECLARED plan; AQE can only improve it at runtime (coalesce,
    # skew-split, SMJ->BHJ).
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    rows, findings = [], []
    for name, fn in entry_mod.queries().items():
        if check_only and name not in check_only:
            continue
        try:
            rec = audit_one(name, fn(spark, sf_dir))
        except Exception as exc:  # noqa: BLE001
            findings.append(f"{name}: failed to build plan: {exc}")
            continue
        unexpected = (rec["bnlj"] or rec["cartesian"]) and name not in BNLJ_OK
        rec["unexpected"] = bool(unexpected)
        if unexpected:
            findings.append(
                f"{name}: BroadcastNestedLoopJoin x{rec['bnlj']} "
                f"CartesianProduct x{rec['cartesian']} (not whitelisted)"
            )
        rows.append(rec)

    if check_only is None:
        with open("PLAN_AUDIT.md", "w") as fh:
            fh.write(
                "# Physical-plan audit\n\n"
                f"Every contract entry's `explain('formatted')` at {sf_dir} "
                "(plan shape is SF-independent). `BNLJ ok` marks the "
                "whitelisted 1-row-scalar cross joins — a broadcast of a "
                "single aggregate row is a constant, not a quadratic "
                "risk; anything else nested-loop is a finding.\n\n"
                "| entry | codegen stages | BHJ | SMJ/SHJ | BNLJ | pushed filters |\n"
                "|---|---|---|---|---|---|\n"
            )
            for r in sorted(rows, key=lambda r: r["name"]):
                bn = (
                    "0"
                    if not r["bnlj"] and not r["cartesian"]
                    else (
                        f"{r['bnlj']} ok"
                        if not r["unexpected"]
                        else f"{r['bnlj']} **UNEXPECTED**"
                    )
                )
                fh.write(
                    f"| {r['name']} | {r['codegen']} | {r['bhj']} | "
                    f"{r['smj'] + r['shj']} | {bn} | "
                    f"{'yes' if r['pushed'] else '—'} |\n"
                )
            fh.write(
                f"\n{len(rows)} entries audited; "
                f"{len(findings)} findings.\n"
            )
            if findings:
                fh.write("\n## Findings\n\n")
                for f in findings:
                    fh.write(f"- {f}\n")
        print(f"wrote PLAN_AUDIT.md ({len(rows)} entries, {len(findings)} findings)")

    for f in findings:
        print(f"FINDING: {f}")
    spark.stop()
    return 1 if findings else 0


if __name__ == "__main__":
    raise SystemExit(main())
