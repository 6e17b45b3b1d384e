"""plans/range_join.py: exact equality with the naive theta join, and
the plan-shape guarantee the rewrite exists for (equi-join, no
BroadcastNestedLoopJoin)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from poc_spark.plans.range_join import bucketized_range_join


def _data(spark):
    points = spark.createDataFrame(
        [(float(p),) for p in [-7, -1, 0, 1, 2, 5, 9, 10, 11, 33, 100]],
        "p double",
    )
    intervals = spark.createDataFrame(
        [
            (1, -10.0, -5.0),
            (2, -2.0, 2.0),   # overlaps 0
            (3, 0.0, 0.0),    # degenerate single point
            (4, 8.0, 12.0),
            (5, 8.0, 40.0),   # overlaps interval 4
            (6, 200.0, 300.0),  # matches nothing
        ],
        "iid int, lo double, hi double",
    )
    return points, intervals


@pytest.mark.parametrize("width", [1.0, 3.0, 50.0])
def test_matches_naive_theta_join(spark, width):
    points, intervals = _data(spark)
    naive = points.join(
        intervals,
        (F.col("p") >= F.col("lo")) & (F.col("p") <= F.col("hi")),
    )
    bucketed = bucketized_range_join(points, intervals, "p", "lo", "hi", width)
    expected = sorted(map(tuple, naive.collect()))
    got = sorted(map(tuple, bucketed.collect()))
    assert got == expected
    assert len(got) > 0


def test_leftsemi_dedups_points(spark):
    points, intervals = _data(spark)
    got = sorted(
        r["p"]
        for r in bucketized_range_join(
            points, intervals, "p", "lo", "hi", 5.0, how="leftsemi"
        ).collect()
    )
    # 9/10/11 fall in BOTH interval 4 and 5 but appear once each
    assert got == [-7.0, -1.0, 0.0, 1.0, 2.0, 9.0, 10.0, 11.0, 33.0]


def test_plan_is_equi_join_not_bnlj(spark):
    points, intervals = _data(spark)
    naive_plan = (
        points.join(
            intervals, (F.col("p") >= F.col("lo")) & (F.col("p") <= F.col("hi"))
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    bucketed_plan = (
        bucketized_range_join(points, intervals, "p", "lo", "hi", 5.0)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the theta join plans as a nested-loop or cartesian — the disease
    assert ("BroadcastNestedLoopJoin" in naive_plan
            or "CartesianProduct" in naive_plan)
    assert "BroadcastNestedLoopJoin" not in bucketed_plan
    assert "CartesianProduct" not in bucketed_plan


def test_rejects_unknown_how(spark):
    points, intervals = _data(spark)
    with pytest.raises(ValueError):
        bucketized_range_join(points, intervals, "p", "lo", "hi", 1.0, how="outer")
