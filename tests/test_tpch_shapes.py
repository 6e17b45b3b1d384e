"""Plan-shape and smoke tests for the round-4 TPC-H shapes (Q2/Q8/Q9/
Q11/Q12/Q15/Q16/Q17/Q20/Q21). Value-level ground truth is the DuckDB
oracle (tools/check_correctness.py, CORRECTNESS artifacts); what pytest
pins here is the part the oracle can't see — the PHYSICAL plan:
decorrelation happened, scalars ride broadcasts (not cartesian
products), and the window reuses the aggregation shuffle.
"""

from __future__ import annotations

import pytest

from poc_spark.contract import REGISTRY

NEW_SHAPES = [
    "q2_min_cost_supplier",
    "q8_market_share",
    "q9_profit_by_nation",
    "q11_important_parts",
    "q12_late_priority",
    "q15_top_supplier",
    "q16_supplier_cnt",
    "q17_small_qty_revenue",
    "q20_heavy_suppliers",
    "q21_sole_late_supplier",
]


def _plan(spark, sf_dir, name: str) -> str:
    df = REGISTRY[name].spark(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", NEW_SHAPES)
def test_shape_runs_and_returns_rows(spark, sf_dir, name):
    out = REGISTRY[name].spark(spark, sf_dir).collect()
    # q17's single-row sum may be NULL at sf0.001 (tiny brand slice);
    # every other shape must produce at least one row
    if name != "q17_small_qty_revenue":
        assert len(out) >= 1, name


@pytest.mark.parametrize(
    "name",
    ["q2_min_cost_supplier", "q17_small_qty_revenue", "q21_sole_late_supplier"],
)
def test_correlated_subqueries_decorrelate(spark, sf_dir, name):
    """Correlated scalar/EXISTS subqueries must be rewritten to joins —
    a surviving per-row subplan would execute once per outer row."""
    plan = _plan(spark, sf_dir, name)
    assert "Subquery" not in plan or "SubqueryBroadcast" in plan, plan


@pytest.mark.parametrize("name", ["q11_important_parts", "q15_top_supplier"])
def test_scalar_rides_broadcast_not_cartesian(spark, sf_dir, name):
    """The global-total / global-max scalar is a 1-row crossJoin: it must
    plan as a broadcast nested-loop, never a CartesianProduct (which
    would shuffle-replicate the grouped side)."""
    plan = _plan(spark, sf_dir, name)
    assert "CartesianProduct" not in plan, plan
    # q11's > filter stays a nested loop; q15's == filter is rewritten
    # by Catalyst into an equi-join on the scalar — both broadcast
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan


def test_q20_window_reuses_group_shuffle(spark, sf_dir):
    """groupBy(l_suppkey, l_partkey) then Window PARTITION BY l_partkey:
    the plan may re-shuffle once for the window, but must not shuffle
    the supplier dim (broadcast) and must keep a single window node."""
    plan = _plan(spark, sf_dir, "q20_heavy_suppliers")
    assert plan.count("Window") == 1, plan
    assert "BroadcastHashJoin" in plan, plan


def test_q21_semi_and_anti_joins(spark, sf_dir):
    """EXISTS → left semi, NOT EXISTS → left anti, both on l_orderkey."""
    plan = _plan(spark, sf_dir, "q21_sole_late_supplier").lower()
    assert "leftsemi" in plan or "left semi" in plan, plan
    assert "leftanti" in plan or "left anti" in plan, plan
