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


def test_rolling_time_avg_frame_boundaries(spark):
    """RANGE frame semantics: the trailing 1-hour window is inclusive
    at exactly -1h, picks peers by TIME distance (not row position),
    and never crosses event_type partitions."""
    import datetime as dt

    from poc_spark.contract import REGISTRY
    from pyspark.sql import Window, functions as F

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base, "a", 10.0),
        (2, base + dt.timedelta(minutes=30), "a", 20.0),
        (3, base + dt.timedelta(minutes=90), "a", 30.0),
        (4, base + dt.timedelta(minutes=30), "b", 99.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-3_600_000_000, 0)
    )
    got = {
        r["event_id"]: (r["n"], r["avg"])
        for r in ev.select(
            "event_id",
            F.count(F.lit(1)).over(w).alias("n"),
            (
                F.sum(F.col("value").cast("decimal(12,2)")).over(w).cast("double")
                / F.count(F.lit(1)).over(w)
            ).alias("avg"),
        ).collect()
    }
    assert got[1] == (1, 10.0)
    assert got[2] == (2, 15.0)
    # 90min frame = [30min, 90min]: event at 30min is EXACTLY 1h back
    # -> inclusive; event at 0 is out
    assert got[3] == (2, 25.0)
    assert got[4] == (1, 99.0)  # other partition untouched


def test_outlier_mad_expectation(spark, monkeypatch, tmp_path_repo):
    """Median/MAD/outlier-count on a hand-computed set: values
    [1,2,3,100] -> med 2.5, adev [1.5,.5,.5,97.5], MAD 1.0 (interpolated
    median of sorted deviations), one 3-MAD outlier."""
    from poc_spark import contract

    ev = spark.createDataFrame(
        [(i, "a", float(v)) for i, v in enumerate([1, 2, 3, 100])],
        "event_id long, event_type string, value double",
    )
    monkeypatch.setattr(
        contract, "_t", lambda spark_, sf_dir_, name_: ev
    )
    rows = contract.REGISTRY["q_outlier_mad"].spark(spark, "ignored").collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["med"], r["mad"], r["n_outliers"], r["n"]) == (2.5, 1.0, 1, 4)
