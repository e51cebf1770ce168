"""Relational warehouse analytics over the TPC-H-shaped tables.

The reference's analytics surface is event/stream-centric; a user who
switches to this engine also gets the classic warehouse shapes on the
same testdata (pricing summary, star-schema revenue, top-k orders) —
the queries every Spark deployment runs against fact/dim parquet.

Scale notes (100 TB): lineitem is the fact table — every query here
aggregates it with ONE shuffle on the group key (partial aggs collapse
map-side), dims join via broadcast (region/nation are KB-sized at any
SF; customer joins shuffle on the key and AQE upgrades to broadcast
when a filter makes the side small).  Parity per registry.py: decimal
partial sums, identical aliases, unique tie-breaks on top-k.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from pulsar_ingestion_spark.registry import query
from pulsar_ingestion_spark.session import load_tables


def _t(spark, sf_dir, *names):
    tabs = load_tables(spark, sf_dir)
    return tuple(tabs[n] for n in names)


_PRICING_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
       round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))))
            AS DOUBLE), 4) AS sum_disc_price,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_qty,
       CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@query("tpch_pricing_summary", oracle=_PRICING_ORACLE)
def q_tpch_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: full-fact pricing summary.  One scan, one shuffle
    on a 6-value group key; every sum is a decimal partial agg so the
    map-side combine collapses each task to a handful of rows before the
    exchange — the canonical 100 TB aggregation plan."""
    (li,) = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,4)")  # noqa: E731
    disc_price = dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - dec("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= "2000-09-01")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            # the scaled int128 behind a DECIMAL(38,8) product-sum exceeds
            # 2^53 at sf>=0.1, where DuckDB's two-step decimal->double cast
            # can land 1 ulp off Spark's — round every such cast (and every
            # division of two big doubles) before output
            F.round(F.sum(disc_price).cast("double"), 4).alias("sum_disc_price"),
            # avg_qty/avg_disc stay UNROUNDED: their sums' scaled ints are
            # far under 2^53 (exact casts), so both engines divide identical
            # doubles — rounding would only add half-way-boundary risk
            (F.sum(dec("l_quantity")).cast("double") / F.count("*")).alias("avg_qty"),
            (F.sum(dec("l_discount")).cast("double") / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


_REGION_REVENUE_ORACLE = """
SELECT r.r_name AS region, n.n_name AS nation,
       round(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                * (CAST(1 AS DECIMAL(18,4)) - CAST(l.l_discount AS DECIMAL(18,4))))
            AS DOUBLE), 4) AS revenue,
       count(DISTINCT o.o_orderkey) AS n_orders
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name
"""


@query("tpch_revenue_by_region", oracle=_REGION_REVENUE_ORACLE)
def q_tpch_revenue_by_region(spark, sf_dir):
    """Star-schema revenue rollup (TPC-H Q5 shape): fact → orders →
    customer by key shuffle, then nation/region via explicit broadcast
    (dims are KB at any SF — replicating them beats shuffling the fact
    side by orders of magnitude).  The reference has no relational dim
    model; this is the warehouse query its users would add first."""
    li, od, cu, na, re = _t(spark, sf_dir, "lineitem", "orders", "customer", "nation", "region")
    dec = lambda c: F.col(c).cast("decimal(18,4)")  # noqa: E731
    rev = dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - dec("l_discount"))
    joined = (
        li.join(od, li["l_orderkey"] == od["o_orderkey"])
        .join(cu, od["o_custkey"] == cu["c_custkey"])
        .join(F.broadcast(na), cu["c_nationkey"] == na["n_nationkey"])
        .join(F.broadcast(re), na["n_regionkey"] == re["r_regionkey"])
    )
    # manual two-level agg instead of countDistinct: Spark plans a mixed
    # distinct+sum agg via Expand (2x the fact rows through the first
    # shuffle); pre-aggregating per order key gets the same answer with
    # the rows shuffled once at 1x width
    per_order = joined.groupBy(
        F.col("r_name").alias("region"), F.col("n_name").alias("nation"),
        F.col("o_orderkey"),
    ).agg(F.sum(rev).alias("order_rev"))
    return per_order.groupBy("region", "nation").agg(
        F.round(F.sum("order_rev").cast("double"), 4).alias("revenue"),
        F.count("*").alias("n_orders"),
    )


_TOP_ORDERS_ORACLE = """
SELECT o.o_orderkey, strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                * (CAST(1 AS DECIMAL(18,4)) - CAST(l.l_discount AS DECIMAL(18,4))))
            AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY o.o_orderkey, o.o_orderdate
ORDER BY revenue DESC, o.o_orderkey
LIMIT 10
"""


@query("tpch_top_orders", oracle=_TOP_ORDERS_ORACLE)
def q_tpch_top_orders(spark, sf_dir):
    """Top-10 revenue orders for one market segment (TPC-H Q3 shape).
    The segment filter reaches the customer scan (predicate pushdown),
    the filtered customer side is small → AQE converts the join to
    broadcast at runtime; the top-k is a TakeOrdered (no global sort
    materialization).  Decimal revenue + orderkey tie-break keep the
    limit deterministic."""
    li, od, cu = _t(spark, sf_dir, "lineitem", "orders", "customer")
    dec = lambda c: F.col(c).cast("decimal(18,4)")  # noqa: E731
    rev = dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - dec("l_discount"))
    return (
        li.join(od, li["l_orderkey"] == od["o_orderkey"])
        .join(cu.filter(F.col("c_mktsegment") == "BUILDING"),
              od["o_custkey"] == cu["c_custkey"])
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


_WEIGHTED_AVG_ORACLE = """
SELECT l_returnflag,
       round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(18,4)))
             AS DOUBLE)
         / CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 6) AS vwap,
       round(CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / count(*), 6) AS avg_disc,
       count(*) AS n
FROM lineitem
GROUP BY l_returnflag
"""


@query("agg_weighted_avg", oracle=_WEIGHTED_AVG_ORACLE)
def q_agg_weighted_avg(spark, sf_dir):
    """Quantity-weighted average price (VWAP shape) — weighted means as
    ratios of two decimal partial sums, the numerically-stable form that
    map-side-combines perfectly (a naive avg(price*qty/total) would need
    the total up front = two passes)."""
    (li,) = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,4)")  # noqa: E731
    return li.groupBy("l_returnflag").agg(
        F.round(
            F.sum(dec("l_extendedprice") * dec("l_quantity")).cast("double")
            / F.sum(dec("l_quantity")).cast("double"), 6
        ).alias("vwap"),
        F.round(F.sum(dec("l_discount")).cast("double") / F.count("*"), 6).alias("avg_disc"),
        F.count("*").alias("n"),
    )


_RUNNING_DISTINCT_ORACLE = """
WITH firsts AS (
  SELECT event_type, user_id,
         strftime(min(ts), '%Y-%m-%d') AS first_day
  FROM events GROUP BY event_type, user_id
), daily AS (
  SELECT event_type, first_day AS day, count(*) AS new_users
  FROM firsts GROUP BY event_type, first_day
)
SELECT event_type, day, new_users,
       CAST(sum(new_users) OVER (PARTITION BY event_type ORDER BY day
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
FROM daily
"""


@query("win_running_distinct", oracle=_RUNNING_DISTINCT_ORACLE)
def q_win_running_distinct(spark, sf_dir):
    """Running DISTINCT user count per event type by day — the composition
    that avoids per-row distinct-state: reduce to (type, user) firsts
    (one shuffle, map-side combine), roll up to daily new-user counts,
    then a running sum over the DAYS (window state = #days, not #users —
    the only form that survives 100 TB).  Window SUM cast to BIGINT for
    engine-portable typing (DuckDB HUGEINT otherwise)."""
    (ev,) = _t(spark, sf_dir, "events")
    firsts = ev.groupBy("event_type", "user_id").agg(
        F.date_format(F.min("ts"), "yyyy-MM-dd").alias("first_day")
    )
    daily = firsts.groupBy("event_type", F.col("first_day").alias("day")).agg(
        F.count("*").alias("new_users")
    )
    w = Window.partitionBy("event_type").orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return daily.select(
        "event_type", "day", "new_users",
        F.sum("new_users").over(w).cast("bigint").alias("cum_users"),
    )


_MARKET_SHARE_ORACLE = """
SELECT CAST(year(o.o_orderdate) AS BIGINT) AS order_year,
       round(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                * (CAST(1 AS DECIMAL(18,4)) - CAST(l.l_discount AS DECIMAL(18,4))))
             AS DOUBLE), 4) AS total_revenue,
       round(CAST(SUM(CASE WHEN r.r_name = 'ASIA'
                THEN CAST(l.l_extendedprice AS DECIMAL(18,4))
                     * (CAST(1 AS DECIMAL(18,4)) - CAST(l.l_discount AS DECIMAL(18,4)))
                ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                * (CAST(1 AS DECIMAL(18,4)) - CAST(l.l_discount AS DECIMAL(18,4))))
             AS DOUBLE), 6) AS asia_share
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY order_year
"""


@query("tpch_market_share", oracle=_MARKET_SHARE_ORACLE)
def q_tpch_market_share(spark, sf_dir):
    """Supplier-region market share per order year (TPC-H Q8 shape): the
    conditional-revenue-ratio pattern — numerator and denominator as two
    decimal partial sums in ONE agg pass, never two scans.  Supplier/
    nation/region join broadcast; the only fact shuffle is the orders
    key join, and the year rollup rides a partial agg.  Share rounded
    (its DECIMAL(38,8) casts pass 2^53 at scale — SCALE.md §6d)."""
    li, od, su, na, re = _t(spark, sf_dir, "lineitem", "orders", "supplier", "nation", "region")
    dec = lambda c: F.col(c).cast("decimal(18,4)")  # noqa: E731
    rev = dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - dec("l_discount"))
    zero = F.lit(0).cast("decimal(18,4)")
    joined = (
        li.join(od, li["l_orderkey"] == od["o_orderkey"])
        .join(F.broadcast(su), li["l_suppkey"] == su["s_suppkey"])
        .join(F.broadcast(na), su["s_nationkey"] == na["n_nationkey"])
        .join(F.broadcast(re), na["n_regionkey"] == re["r_regionkey"])
    )
    total = F.sum(rev).cast("double")
    asia = F.sum(F.when(F.col("r_name") == "ASIA", rev).otherwise(zero)).cast("double")
    return joined.groupBy(
        F.year("o_orderdate").cast("bigint").alias("order_year")
    ).agg(
        F.round(total, 4).alias("total_revenue"),
        F.round(asia / total, 6).alias("asia_share"),
    )


_ORDER_PRIORITY_ORACLE = """
SELECT o.o_orderpriority, count(*) AS order_count
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY o.o_orderpriority
"""


@query("tpch_order_priority", oracle=_ORDER_PRIORITY_ORACLE)
def q_tpch_order_priority(spark, sf_dir):
    """Order-priority checking (TPC-H Q4 shape): orders with at least one
    lineitem shipped after the order date, counted per priority — the
    canonical EXISTS/semi-join aggregate.  The semi-join shuffles on the
    order key and short-circuits per match (never materializes the
    multiplicity); the rollup is a 5-value partial agg."""
    li, od = _t(spark, sf_dir, "lineitem", "orders")
    late = od.join(
        li,
        (od["o_orderkey"] == li["l_orderkey"]) & (li["l_shipdate"] > od["o_orderdate"]),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))
