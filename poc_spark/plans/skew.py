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


def salted_top_k(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    k: int,
    salt_col: "F.Column | None" = None,
    salt_n: int = 16,
) -> DataFrame:
    """Top-k rows per key under a TOTAL order, resilient to a hot key.

    KNOW THE OPTIMIZER FIRST: for the standard `row_number() OVER
    (PARTITION BY key ORDER BY ...) <= k` filter pattern, Catalyst's
    InferWindowGroupLimit (Spark >= 3.5) already inserts a PARTIAL
    per-map-task top-k below the shuffle — the plain window is the
    two-phase skew-safe plan for free (verified in the physical plan;
    measured at 10M rows / 95%-hot key the plain window matches or
    beats this rewrite — tools/topk_skew_demo.py). Use the plain
    window. This explicit form exists for the cases the rule can't
    match: rank predicates hidden behind expressions the rule doesn't
    recognize, engines without the rule, or pipelines that need the
    shard structure anyway.

    Two phases, exact equality with the single window:
      1. local: rank within (key, shard) — each shard keeps its own
         top-k, so a key's rows spread over `salt_n` tasks and at most
         salt_n*k survivors per key remain;
      2. global: rank the survivors within key — the true top-k per
         key is a subset of the per-shard top-k's union (any row
         outside its shard's top-k is beaten by >= k rows of the same
         key, hence outside the key's top-k).

    `salt_col` must be a DETERMINISTIC function of the row (e.g. a
    content-hash bucket) so results are layout-independent; it defaults
    to xxhash64 over ALL the order columns. `order_cols` must totally
    order rows within a key — ties make ranks ambiguous, AND (because
    the default salt derives from the order values) duplicated order
    tuples would all land in one shard, re-concentrating the hot key
    this function exists to spread. Pass an independent content-hash
    `salt_col` when order values can repeat.
    """
    from pyspark.sql import Window

    salt = (
        salt_col
        if salt_col is not None
        else F.pmod(F.xxhash64(*order_cols), F.lit(salt_n))
    )
    local = Window.partitionBy(*key_cols, "_shard").orderBy(
        *[F.col(c).asc() for c in order_cols]
    )
    final = Window.partitionBy(*key_cols).orderBy(
        *[F.col(c).asc() for c in order_cols]
    )
    return (
        df.withColumn("_shard", salt)
        .withColumn("_lrn", F.row_number().over(local))
        .filter(F.col("_lrn") <= k)
        .withColumn("_rn", F.row_number().over(final))
        .filter(F.col("_rn") <= k)
        .drop("_shard", "_lrn", "_rn")
    )
