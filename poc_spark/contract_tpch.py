"""TPC-H shapes 2/8/9/11/12/15/16/17/20/21 — completing the 22-shape set.

Rounds 1-3 covered Q1/3/4/5/6/7/10/13/14/18/19/22; these ten close the
remaining shapes, adapted to the driver's reduced schemas (TESTDATA.md:
no partsupp table, no l_shipmode/l_commitdate/l_receiptdate columns —
the partsupp-centric queries use lineitem itself as the part↔supplier
link, and "late" is defined against o_orderdate).

What each adds to the Catalyst surface:
  - Q2/Q17: correlated SCALAR subqueries (decorrelated to agg+join)
  - Q16: NOT IN → null-aware anti join
  - Q21: stacked correlated EXISTS + NOT EXISTS on the same fact
  - Q11/Q15: uncorrelated scalar → 1-row broadcast crossJoin (never a
    driver-side collect)
  - Q20: ratio-to-group via decimal window sum reusing the groupBy
    shuffle partitioning
  - Q8/Q9: 6-7 way star joins, every dimension broadcast

Oracle-equality rules are the module-wide ones from contract.py: exact
DECIMAL sums cast to DOUBLE at the end, identical aliases both sides,
years cast to BIGINT (pandas int64 on both engines).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from poc_spark.contract import _dec, _dec4, _one, _t, register

# shared revenue expression: exact decimal extprice*(1-discount)
def _rev() -> F.Column:
    return _dec("l_extendedprice") * (_one() - _dec4("l_discount"))


_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(12,2))"
    " * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))"
)


@register(
    "q2_min_cost_supplier",
    f"""
    WITH costs AS (
      SELECT l_partkey, l_suppkey,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
             / CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
               AS unit_cost
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
      GROUP BY l_partkey, l_suppkey
    )
    SELECT p_partkey, s_name, unit_cost
    FROM costs
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    WHERE p_type = 'STANDARD' AND p_size <= 10
      AND unit_cost = (SELECT MIN(c2.unit_cost) FROM costs c2
                       WHERE c2.l_partkey = costs.l_partkey)
    """,
)
def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape: cheapest supplier per part via a CORRELATED
    scalar subquery (min unit cost within the part), lineitem standing
    in for partsupp (no partsupp table in TESTDATA.md). Catalyst
    decorrelates the = (SELECT MIN ...) into an aggregate + join —
    the unit_cost is exact-decimal sums divided as doubles, so the
    equality survives both engines bit-for-bit."""
    return spark.sql(
        f"""
        WITH costs AS (
          SELECT l_partkey, l_suppkey,
                 CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                 / CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                   AS unit_cost
          FROM {{lineitem}}
          JOIN {{supplier}} ON l_suppkey = s_suppkey
          JOIN {{nation}}   ON s_nationkey = n_nationkey
          JOIN {{region}}   ON n_regionkey = r_regionkey
          WHERE r_name = 'EUROPE'
          GROUP BY l_partkey, l_suppkey
        )
        SELECT p_partkey, s_name, unit_cost
        FROM costs
        JOIN {{part}}     ON l_partkey = p_partkey
        JOIN {{supplier}} ON l_suppkey = s_suppkey
        WHERE p_type = 'STANDARD' AND p_size <= 10
          AND unit_cost = (SELECT MIN(c2.unit_cost) FROM costs c2
                           WHERE c2.l_partkey = costs.l_partkey)
        """,
        lineitem=_t(spark, sf_dir, "lineitem"),
        supplier=_t(spark, sf_dir, "supplier"),
        nation=_t(spark, sf_dir, "nation"),
        region=_t(spark, sf_dir, "region"),
        part=_t(spark, sf_dir, "part"),
    )


@register(
    "q8_market_share",
    f"""
    SELECT year(o_orderdate)::BIGINT AS o_year,
           CAST(SUM(CASE WHEN n2.n_name = 'NATION_7' THEN {_REV_SQL}
                         ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
           / CAST(SUM({_REV_SQL}) AS DOUBLE) AS mkt_share
    FROM lineitem
    JOIN orders    ON l_orderkey = o_orderkey
    JOIN customer  ON o_custkey = c_custkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN region    ON n1.n_regionkey = r_regionkey
    JOIN supplier  ON l_suppkey = s_suppkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE r_name = 'EUROPE'
    GROUP BY o_year
    """,
)
def q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape: NATION_7 suppliers' share of EUROPE customers'
    spend per year. Fact table joins 5 broadcast dims (nation twice,
    under different roles) and never shuffles before the final 7-group
    aggregate; the share is a double division of two exact decimal
    sums computed in the same pass."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region")
    sup = _t(spark, sf_dir, "supplier")
    n1 = nat.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
    )
    n2 = nat.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    rev = _rev()
    target = F.when(F.col("supp_nation") == "NATION_7", rev).otherwise(
        F.lit(0).cast("decimal(12,2)")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nkey"))
        .join(F.broadcast(reg), F.col("c_rkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "EUROPE")
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            (
                F.sum(target).cast("double") / F.sum(rev).cast("double")
            ).alias("mkt_share")
        )
    )


@register(
    "q9_profit_by_nation",
    """
    SELECT n_name AS nation, year(o_orderdate)::BIGINT AS o_year,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
                  - CAST(0.5 AS DECIMAL(4,2))
                    * CAST(p_retailprice AS DECIMAL(12,2))
                    * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS profit
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN orders   ON l_orderkey = o_orderkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, o_year
    """,
)
def q9_profit_by_nation(spark, sf_dir):
    """TPC-H Q9 shape: profit on 'red' parts by supplier nation and
    year. No ps_supplycost column exists, so cost is modeled as
    0.5*p_retailprice*l_quantity — all three factors exact DECIMAL, so
    the profit sum is exact in both engines. The p_name LIKE filter is
    pushed into the broadcast part dim before the join."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders")
    profit = _rev() - (
        F.lit(0.5).cast("decimal(4,2)")
        * _dec("p_retailprice")
        * _dec("l_quantity")
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("profit"))
    )


@register(
    "q11_important_parts",
    """
    WITH filtered AS (
      SELECT l_partkey, CAST(l_extendedprice AS DECIMAL(12,2)) AS val
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
    )
    SELECT l_partkey AS p_partkey, CAST(SUM(val) AS DOUBLE) AS part_value
    FROM filtered
    GROUP BY l_partkey
    HAVING CAST(SUM(val) AS DOUBLE)
           > (SELECT CAST(SUM(val) AS DOUBLE) * 0.001 FROM filtered)
    """,
)
def q11_important_parts(spark, sf_dir):
    """TPC-H Q11 shape: parts whose shipped value from three nations
    exceeds 0.1 % of the global total. The global scalar rides in as a
    1-row broadcast crossJoin — no collect, no second pass over the
    fact for the filter (the grouped table is reused)."""
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3")
    )
    filtered = (
        li.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(F.col("l_partkey"), _dec("l_extendedprice").alias("val"))
    )
    grouped = filtered.groupBy("l_partkey").agg(
        F.sum("val").cast("double").alias("part_value")
    )
    threshold = filtered.agg(
        (F.sum("val").cast("double") * F.lit(0.001)).alias("threshold")
    )
    return (
        grouped.crossJoin(F.broadcast(threshold))
        .filter(F.col("part_value") > F.col("threshold"))
        .select(F.col("l_partkey").alias("p_partkey"), "part_value")
    )


@register(
    "q12_late_priority",
    """
    SELECT l_returnflag,
           count(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS high_line_count,
           count(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS low_line_count
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
    GROUP BY l_returnflag
    """,
)
def q12_late_priority(spark, sf_dir):
    """TPC-H Q12 shape (l_shipmode doesn't exist → l_returnflag carries
    the grouping): conditional counts of high/low-priority orders among
    late-shipped lines. Two F.count(F.when(...)) run in one aggregate
    pass; the date-lag predicate filters before the group."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
    )


@register(
    "q15_top_supplier",
    f"""
    WITH rev AS (
      SELECT l_suppkey, CAST(SUM({_REV_SQL}) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM rev JOIN supplier ON s_suppkey = l_suppkey
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
    """,
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: supplier(s) with the maximum quarterly revenue.
    The max is an uncorrelated scalar — computed as a 1-row aggregate
    and broadcast-crossJoined, NOT a global window (a single-partition
    window over every supplier would serialize at 100 TB)."""
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_rev()).cast("double").alias("total_revenue"))
    )
    max_rev = rev.agg(F.max("total_revenue").alias("max_rev"))
    return (
        rev.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_rev"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q16_supplier_cnt",
    """
    SELECT p_brand, p_size, count(DISTINCT s_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    WHERE p_size IN (1, 5, 10, 15, 20, 25) AND p_type <> 'PROMO'
      AND s_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_acctbal < 0)
    GROUP BY p_brand, p_size
    """,
)
def q16_supplier_cnt(spark, sf_dir):
    """TPC-H Q16 shape: distinct supplier count per (brand, size) with
    a NOT IN exclusion subquery. Left in SQL so Catalyst plans the
    null-aware anti join (NOT IN semantics differ from NOT EXISTS when
    the subquery can yield NULL — here it can't, but the plan shape is
    the point)."""
    return spark.sql(
        """
        SELECT p_brand, p_size, count(DISTINCT s_suppkey) AS supplier_cnt
        FROM {lineitem}
        JOIN {part}     ON l_partkey = p_partkey
        JOIN {supplier} ON l_suppkey = s_suppkey
        WHERE p_size IN (1, 5, 10, 15, 20, 25) AND p_type <> 'PROMO'
          AND s_suppkey NOT IN (SELECT s2.s_suppkey FROM {supplier} s2
                                WHERE s2.s_acctbal < 0)
        GROUP BY p_brand, p_size
        """,
        lineitem=_t(spark, sf_dir, "lineitem"),
        part=_t(spark, sf_dir, "part"),
        supplier=_t(spark, sf_dir, "supplier"),
    )


@register(
    "q17_small_qty_revenue",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0
           AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#23'
      AND l_quantity < (SELECT 0.5 * AVG(l2.l_quantity) FROM lineitem l2
                        WHERE l2.l_partkey = p_partkey)
    """,
)
def q17_small_qty_revenue(spark, sf_dir):
    """TPC-H Q17 shape: revenue from unusually-small-quantity orders of
    one brand, via a correlated AVG scalar subquery (decorrelated to a
    per-part aggregate + join). AVG(l_quantity) is safe for exact
    comparison: quantities are integral (TESTDATA), their double sum is
    order-independent below 2^53."""
    return spark.sql(
        """
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0
               AS avg_yearly
        FROM {lineitem}
        JOIN {part} ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#23'
          AND l_quantity < (SELECT 0.5 * AVG(l2.l_quantity) FROM {lineitem} l2
                            WHERE l2.l_partkey = p_partkey)
        """,
        lineitem=_t(spark, sf_dir, "lineitem"),
        part=_t(spark, sf_dir, "part"),
    )


@register(
    "q20_heavy_suppliers",
    """
    WITH shipped AS (
      SELECT l_suppkey, l_partkey,
             SUM(CAST(l_quantity AS DECIMAL(12,2))) AS qty_dec
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      WHERE p_name LIKE 'small%'
      GROUP BY l_suppkey, l_partkey
    ),
    tot AS (
      SELECT l_partkey, SUM(qty_dec) AS part_total_dec
      FROM shipped GROUP BY l_partkey
    )
    SELECT DISTINCT s_suppkey, s_name
    FROM shipped
    JOIN tot USING (l_partkey)
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE CAST(qty_dec AS DOUBLE) > 0.1 * CAST(part_total_dec AS DOUBLE)
    """,
)
def q20_heavy_suppliers(spark, sf_dir):
    """TPC-H Q20 shape: suppliers who shipped >10 % of a 'small%'
    part's total quantity. Ratio-to-group via a decimal window sum
    PARTITION BY l_partkey — the window input is already shuffled on
    (l_suppkey, l_partkey) from the groupBy, so AQE sees a skew-free
    narrow re-shuffle on the part key only."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    sup = _t(spark, sf_dir, "supplier")
    from pyspark.sql.window import Window

    shipped = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(_dec("l_quantity")).alias("qty_dec"))
    )
    w = Window.partitionBy("l_partkey")
    return (
        shipped.withColumn("part_total_dec", F.sum("qty_dec").over(w))
        .filter(
            F.col("qty_dec").cast("double")
            > F.lit(0.1) * F.col("part_total_dec").cast("double")
        )
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name")
        .distinct()
    )


@register(
    "q21_sole_late_supplier",
    """
    SELECT s_name, count(*) AS numwait
    FROM lineitem l1
    JOIN orders   ON o_orderkey = l1.l_orderkey
    JOIN supplier ON s_suppkey = l1.l_suppkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 75 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 75 DAY)
    GROUP BY s_name
    """,
)
def q21_sole_late_supplier(spark, sf_dir):
    """TPC-H Q21 shape: suppliers who were the SOLE late shipper on
    finished multi-supplier orders (no l_receiptdate/l_commitdate →
    late means shipped >75 days after order date). Stacked correlated
    EXISTS (left semi) + NOT EXISTS (left anti) against the same fact
    table, both decorrelated by Catalyst; the NOT EXISTS correlates on
    the OUTER query's o_orderdate."""
    return spark.sql(
        """
        SELECT s_name, count(*) AS numwait
        FROM {lineitem} l1
        JOIN {orders}   ON o_orderkey = l1.l_orderkey
        JOIN {supplier} ON s_suppkey = l1.l_suppkey
        WHERE o_orderstatus = 'F'
          AND l1.l_shipdate > o_orderdate + INTERVAL 75 DAY
          AND EXISTS (SELECT 1 FROM {lineitem} l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM {lineitem} l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > o_orderdate + INTERVAL 75 DAY)
        GROUP BY s_name
        """,
        lineitem=_t(spark, sf_dir, "lineitem"),
        orders=_t(spark, sf_dir, "orders"),
        supplier=_t(spark, sf_dir, "supplier"),
    )
