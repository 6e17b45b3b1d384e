"""Grouped custom aggregation: per-group OLS slope, two ways.

The operator computes, per group, the least-squares slope of y over x
via the closed form on raw power sums:

    slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)

With INTEGER x and y the five sums are exact in both engines (int64 /
HUGEINT), and the one double division at the end is IEEE-deterministic
— so the result is bit-for-bit oracle-able, unlike regr_slope-style
running-mean implementations whose float intermediates drift with
aggregation order.

Two implementations with pinned-equal results:

- `ols_slope_builtin` — F.sum on the JVM inside whole-stage codegen;
  one shuffle, map-side partials. THE way to run this at 100 TB.
- `ols_slope_pandas` — the same math through applyInPandas (one Arrow
  batch per group, Python ints so Σx² can't overflow). Exists as the
  load-bearing demo of the grouped-Pandas-UDF escape hatch: when a
  per-group computation genuinely can't be said in SQL aggregates
  (scipy fits, per-group model scoring), THIS is the shape it takes —
  and the slope gives it an exact differential against the built-in.

applyInPandas caveats demonstrated here: the output schema is declared
up front; each group must fit in one executor's memory (fine for
bounded groups like event types; NOT for unbounded keys).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ols_slope_builtin(
    df: DataFrame, x_col: str, y_col: str, group_cols: list[str]
) -> DataFrame:
    """(group_cols..., n, slope) — exact integer power sums on the JVM,
    one double division at the end. Degenerate groups (all x equal)
    yield null slope."""
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    agg = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("_sx"),
        F.sum(y).alias("_sy"),
        F.sum(x * y).alias("_sxy"),
        F.sum(x * x).alias("_sxx"),
    )
    num = (F.col("n") * F.col("_sxy") - F.col("_sx") * F.col("_sy")).cast("double")
    den = (F.col("n") * F.col("_sxx") - F.col("_sx") * F.col("_sx")).cast("double")
    return agg.select(
        *group_cols,
        "n",
        F.when(den != 0, num / den).alias("slope"),
    )


def ols_slope_pandas(
    df: DataFrame, x_col: str, y_col: str, group_cols: list[str]
) -> DataFrame:
    """Same result through applyInPandas. Sums use Python ints (exact,
    unbounded) so n·Σx² can't overflow int64 before the division."""
    out_fields = ", ".join(
        f"`{c}` {t}"
        for c, t in zip(
            group_cols,
            [dict(df.dtypes)[c] for c in group_cols],
        )
    )
    schema = f"{out_fields}, n long, slope double"

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        xs = [int(v) for v in pdf[x_col]]
        ys = [int(v) for v in pdf[y_col]]
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(a * b for a, b in zip(xs, ys))
        sxx = sum(a * a for a in xs)
        den = n * sxx - sx * sx
        slope = float(n * sxy - sx * sy) / float(den) if den else None
        head = {c: [pdf[c].iloc[0]] for c in group_cols}
        return pd.DataFrame({**head, "n": [n], "slope": [slope]})

    return df.groupBy(*group_cols).applyInPandas(fit, schema=schema)
