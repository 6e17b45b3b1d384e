"""Skew mitigation primitives (SURVEY §4.2 / 100 TB posture).

Spark's defenses, in order of preference:
  1. partial (map-side) aggregation — automatic for algebraic aggs;
  2. AQE skew-join splitting — on in poc_spark.session;
  3. explicit SALTING — for the cases the first two can't fix:
     high-cardinality aggregation states (collect_list/distinct) or
     joins against a skewed key where AQE's split granularity isn't
     enough. Implemented here.

Salted aggregation: two-phase — group by (key, salt) first (spreads one
hot key over `salt_n` reducers), then re-aggregate by key. Only valid
for reassociable aggregates; count/sum/min/max provided.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_count(
    df: DataFrame, key_cols: list[str], salt_n: int = 16
) -> DataFrame:
    """groupBy(key).count() resilient to a hot key: phase 1 groups by
    (key, random salt in [0, salt_n)), phase 2 sums the partials.
    Output: key_cols + n."""
    salted = df.withColumn("_salt", (F.rand(seed=7) * salt_n).cast("int"))
    partial = salted.groupBy(*key_cols, "_salt").agg(
        F.count(F.lit(1)).alias("_pn")
    )
    return partial.groupBy(*key_cols).agg(F.sum("_pn").alias("n"))


def salted_broadcast_join(
    big: DataFrame, small: DataFrame, key: str, salt_n: int = 16
) -> DataFrame:
    """Skewed-key join: replicate the SMALL side salt_n times, salt the
    big side's key randomly — the hot key's rows land on salt_n
    different tasks. Semantically a plain inner equi-join on `key`.
    (When the small side fits in a broadcast, plain broadcast join is
    already skew-immune; this shape is for when it doesn't.)"""
    salted_big = big.withColumn("_salt", (F.rand(seed=11) * salt_n).cast("int"))
    replicated = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_n)]))
    )
    return salted_big.join(replicated, [key, "_salt"]).drop("_salt")
