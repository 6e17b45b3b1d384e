"""operators/grouped.py: the applyInPandas OLS must equal the JVM
built-in bit-for-bit (both compute from exact integer power sums)."""

from __future__ import annotations

from pyspark.sql import functions as F

from poc_spark.operators.grouped import ols_slope_builtin, ols_slope_pandas


def _df(spark):
    rows = []
    for g, pts in {
        "a": [(0, 1), (1, 3), (2, 5)],          # slope exactly 2
        "b": [(10, 7), (20, 7), (30, 7)],       # flat: slope 0
        "c": [(5, 2)],                          # single point: degenerate
        "d": [(4, 4), (4, 9)],                  # vertical: degenerate
        "e": [(0, 0), (1, 1), (2, 3), (3, 4)],  # non-integral slope
    }.items():
        rows += [(g, x, y) for x, y in pts]
    return spark.createDataFrame(rows, "g string, x long, y long")


def test_known_slopes(spark):
    got = {
        r["g"]: (r["n"], r["slope"])
        for r in ols_slope_builtin(_df(spark), "x", "y", ["g"]).collect()
    }
    assert got["a"] == (3, 2.0)
    assert got["b"] == (3, 0.0)
    assert got["c"] == (1, None)
    assert got["d"] == (2, None)
    assert got["e"][1] == 1.4  # (4*26-6*8)/(4*14-36) = 56/40


def test_pandas_equals_builtin(spark):
    df = _df(spark)
    b = {tuple(r) for r in ols_slope_builtin(df, "x", "y", ["g"]).collect()}
    p = {tuple(r) for r in ols_slope_pandas(df, "x", "y", ["g"]).collect()}
    assert b == p


def test_pandas_equals_builtin_on_events(spark, sf_dir):
    from poc_spark.contract import _t

    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.col("event_id").alias("x"),
        F.get_json_object("props", "$.k").cast("long").alias("y"),
    )
    b = {tuple(r) for r in ols_slope_builtin(ev, "x", "y", ["event_type"]).collect()}
    p = {tuple(r) for r in ols_slope_pandas(ev, "x", "y", ["event_type"]).collect()}
    assert b == p and len(b) > 0
