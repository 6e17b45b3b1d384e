"""Scale-pattern contract entries: bucketized range join, window zoo,
semi-structured JSON flattening, time-series resample with gap-fill.

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

from poc_spark.contract import _EDGES_CTE, EVENT_ORDER, _t, register
from poc_spark.operators.graph import k_core
from poc_spark.operators.network import lag_edges
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


@register(
    "q_json_extract",
    """
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           count(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS k_sum,
           min(value) AS v_min,
           max(value) AS v_max
    FROM events
    GROUP BY k_bucket
    """,
)
def q_json_extract(spark, sf_dir):
    """Semi-structured flattening: events.props is a JSON string;
    from_json with an explicit schema (JVM-side, codegen — never a
    Python UDF) extracts k, bucketed and aggregated. min/max of the
    double column are order-insensitive (exact); the int sum is exact;
    DuckDB's HUGEINT sum is cast back to BIGINT for dtype parity."""
    ev = _t(spark, sf_dir, "events")
    parsed = ev.select(
        F.from_json("props", "k long").alias("p"), F.col("value")
    )
    return parsed.groupBy((F.col("p.k") % 10).alias("k_bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("p.k").alias("k_sum"),
        F.min("value").alias("v_min"),
        F.max("value").alias("v_max"),
    )


@register(
    "q_resample_gapfill",
    """
    WITH bounds AS (
      SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
      FROM events
    ),
    bins AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bin FROM bounds
    ),
    counts AS (
      SELECT date_trunc('hour', ts) AS bin, count(*) AS n_events
      FROM events GROUP BY 1
    )
    SELECT b.bin, COALESCE(c.n_events, 0) AS n_events
    FROM bins b LEFT JOIN counts c USING (bin)
    """,
)
def q_resample_gapfill(spark, sf_dir):
    """Time-series resample to hourly bins INCLUDING empty bins: the
    bin spine is a sequence() exploded from a 1-row min/max aggregate
    (no driver collect), left-joined to the per-bin counts. The BUILD
    side of the left join is `counts` — post-aggregate it has at most
    one row per bin, so it broadcasts no matter how large the fact was
    (broadcasting the spine would be illegal: a left join can't build
    its preserved side). Spine size is (time span / bin width),
    independent of row count."""
    ev = _t(spark, sf_dir, "events")
    counts = ev.groupBy(F.date_trunc("hour", "ts").alias("bin")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    spine = (
        ev.agg(
            F.date_trunc("hour", F.min("ts")).alias("lo"),
            F.date_trunc("hour", F.max("ts")).alias("hi"),
        )
        .select(
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
            ).alias("bin")
        )
    )
    return spine.join(F.broadcast(counts), "bin", "left").select(
        "bin", F.coalesce("n_events", F.lit(0)).alias("n_events")
    )


@register(
    "graph_kcore",
    _EDGES_CTE.replace("WITH chain", "WITH RECURSIVE chain", 1)
    + """
    , strong AS (
      SELECT source AS src, target AS dst FROM edges WHERE weight >= 4
      UNION ALL
      SELECT target, source FROM edges WHERE weight >= 4
    ), nv AS (
      SELECT count(*) AS cap FROM (SELECT DISTINCT src FROM strong) t
    ), alive(iter, id) AS (
        SELECT 0, src FROM (SELECT DISTINCT src FROM strong) t
      UNION ALL
        SELECT a.iter + 1, s.src
        FROM strong s
        JOIN alive a ON s.src = a.id
        JOIN alive b ON s.dst = b.id
        WHERE a.iter < (SELECT cap FROM nv)
        GROUP BY a.iter, s.src
        HAVING count(*) >= 2
    ), core AS (SELECT id FROM alive WHERE iter = (SELECT cap FROM nv))
    SELECT s.src AS id, count(*) AS degree
    FROM strong s
    JOIN core c1 ON s.src = c1.id
    JOIN core c2 ON s.dst = c2.id
    GROUP BY s.src
    """,
)
def graph_kcore(spark, sf_dir):
    """2-core of the strong interaction graph (weight >= 4): nodes
    surviving iterative min-degree peeling, with their in-core degree.
    Deterministic (the k-core is unique). Oracled since r4 (was
    rows-only): DuckDB 1.0 allows aggregates in the recursive term, so
    the peel IS a recursive CTE — each step keeps nodes with degree
    >= 2 inside the previous survivor set, capped at |V| rounds (peel
    depth <= node count — derived IN the SQL from the data, not a
    constant, so deeper graphs at larger scale factors can't exhaust
    the cap mid-peel; the fixpoint then self-reproduces to the cap,
    and selecting exactly iter=cap keeps the empty-core case honest).
    Differential Python peel stays pinned in tests/test_kcore.py.
    At sf0.01 this peels 150 nodes down to 78."""
    edges = lag_edges(
        _t(spark, sf_dir, "events"), "user_id", EVENT_ORDER
    ).filter(F.col("weight") >= 4)
    return k_core(edges, k=2)


@register(
    "q_cube_events",
    """
    SELECT coalesce(event_type, 'ALL') AS etype,
           coalesce(month(ts), -1)::BIGINT AS mth,
           count(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS k_sum
    FROM events
    GROUP BY CUBE (event_type, month(ts))
    """,
)
def q_cube_events(spark, sf_dir):
    """CUBE over (event_type, month): all four grouping sets in one
    pass (completes the grouping-sets surface next to ROLLUP and the
    pivot entries). Subtotal NULLs coalesced ('ALL' / -1) so both
    engines hash identically; month cast long for dtype parity."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.month("ts").cast("long").alias("mth_raw"),
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )
    return (
        ev.cube("event_type", "mth_raw")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("k").alias("k_sum"))
        .select(
            F.coalesce("event_type", F.lit("ALL")).alias("etype"),
            F.coalesce("mth_raw", F.lit(-1)).alias("mth"),
            "n",
            "k_sum",
        )
    )


@register(
    "q_group_ols",
    """
    WITH base AS (
      SELECT event_type, event_id AS x,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS y
      FROM events
    ),
    s AS (
      SELECT event_type, count(*) AS n,
             SUM(x) AS sx, SUM(y) AS sy, SUM(x*y) AS sxy, SUM(x*x) AS sxx
      FROM base GROUP BY event_type
    )
    SELECT event_type, n,
           CASE WHEN (n*sxx - sx*sx) <> 0
                THEN CAST(n*sxy - sx*sy AS DOUBLE)
                     / CAST(n*sxx - sx*sx AS DOUBLE)
           END AS slope
    FROM s
    """,
)
def q_group_ols(spark, sf_dir):
    """Per-event-type OLS slope of k over event_id, through the
    applyInPandas path (operators/grouped.py) — the grouped-Pandas-UDF
    escape hatch demonstrated WITH an exact oracle: integer power sums
    are exact in both engines, one IEEE division at the end.
    tests/test_grouped.py pins pandas == builtin; the builtin (JVM
    codegen, map-side partials) is the form to run at scale — and
    above ~sf1 x must be translated per group first so n·Σx² stays in
    int64 (slope is translation-invariant)."""
    from poc_spark.operators.grouped import ols_slope_pandas

    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.col("event_id").alias("x"),
        F.get_json_object("props", "$.k").cast("long").alias("y"),
    )
    return ols_slope_pandas(ev, "x", "y", ["event_type"])
