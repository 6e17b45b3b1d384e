"""Scale-pattern contract entries: bucketized range join + window zoo.

`q_range_bucket_join` exercises plans/range_join.py — the equi-join
rewrite of a point-in-interval join. The oracle states the SEMANTICS
as the naive theta join (BETWEEN); the Spark side runs the bucketized
plan, so the correctness row proves the rewrite is exact while the
pytest pins that the plan contains no BroadcastNestedLoopJoin.

`q_window_zoo` sweeps the full window-function surface (SURVEY §2.8)
in one deterministic pass: rank family, ntile, distribution functions,
lead/lag, first_value — every ordering is made total with o_orderkey.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from poc_spark.contract import _t, register
from poc_spark.plans.range_join import bucketized_range_join

_EPOCH = "1970-01-01"


@register(
    "q_range_bucket_join",
    """
    SELECT o_orderkey, count(*) AS n_in_window
    FROM orders
    JOIN lineitem ON l_shipdate >= o_orderdate
                 AND l_shipdate <= o_orderdate + INTERVAL 30 DAY
    WHERE o_orderkey % 50 = 0
    GROUP BY o_orderkey
    """,
)
def q_range_bucket_join(spark, sf_dir):
    """Lineitems shipped inside each sliced order's 30-day window,
    counted per order — run through the bucketized rewrite (32-day
    buckets over day numbers; timestamps are all midnight in TESTDATA,
    so day-granularity comparison is exact)."""
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 50 == 0)
        .select(
            "o_orderkey",
            F.datediff("o_orderdate", F.lit(_EPOCH)).alias("lo"),
        )
        .withColumn("hi", F.col("lo") + 30)
    )
    points = _t(spark, sf_dir, "lineitem").select(
        F.datediff("l_shipdate", F.lit(_EPOCH)).alias("d")
    )
    joined = bucketized_range_join(points, orders, "d", "lo", "hi", bucket_width=32)
    return joined.groupBy("o_orderkey").agg(F.count(F.lit(1)).alias("n_in_window"))


@register(
    "q_window_zoo",
    """
    SELECT o_orderkey,
           rank()         OVER w      ::BIGINT AS rnk,
           dense_rank()   OVER w      ::BIGINT AS drnk,
           ntile(4)       OVER w      ::BIGINT AS quartile,
           percent_rank() OVER w                AS prnk,
           cume_dist()    OVER w                AS cdist,
           lead(o_totalprice, 1) OVER w         AS next_price,
           lag(o_totalprice, 1)  OVER w         AS prev_price,
           first_value(o_orderkey) OVER w       AS cheapest_key
    FROM orders
    WHERE o_orderkey % 20 = 0
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice, o_orderkey)
    """,
)
def q_window_zoo(spark, sf_dir):
    """Every SURVEY §2.8 window function in one pass over a sliced
    orders table; (o_totalprice, o_orderkey) makes each partition's
    order total so ntile/lead/lag are deterministic. Rank-family
    outputs cast to long (Spark int32 vs DuckDB BIGINT)."""
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 20 == 0)
        .select(
            "o_orderkey",
            F.rank().over(w).cast("long").alias("rnk"),
            F.dense_rank().over(w).cast("long").alias("drnk"),
            F.ntile(4).over(w).cast("long").alias("quartile"),
            F.percent_rank().over(w).alias("prnk"),
            F.cume_dist().over(w).alias("cdist"),
            F.lead("o_totalprice", 1).over(w).alias("next_price"),
            F.lag("o_totalprice", 1).over(w).alias("prev_price"),
            F.first("o_orderkey").over(w).alias("cheapest_key"),
        )
    )
