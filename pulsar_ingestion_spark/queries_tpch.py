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


# ---------------------------------------------------------------------------
# Correlated / scalar-subquery family (round 5).  TPC-H Q2/Q17/Q20/Q22 are
# the shapes a warehouse user writes as correlated subqueries; the engine
# form is DECORRELATED: compute the per-group (or global) aggregate once as
# its own relation and join it back — never a per-row subquery.  Because the
# correlation domain is pre-filtered (brand / name-prefix / size filters cut
# the part side first), every scalar side here is small enough to broadcast,
# which `tests/test_plans.py::test_decorrelated_scalar_sides_broadcast` pins.
# The testdata has no partsupp table, so part-supplier cost facts derive
# from lineitem (unit price = l_extendedprice / l_quantity) — same shape,
# same decorrelation.
# ---------------------------------------------------------------------------

_MIN_COST_SUPPLIER_ORACLE = """
WITH pf AS (
  SELECT p_partkey, p_name FROM part
  WHERE p_size BETWEEN 10 AND 20 AND p_type = 'PROMO'
), eu AS (
  SELECT s_suppkey, s_name, n_name
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
), cost AS (
  SELECT l.l_partkey, l.l_suppkey,
         min(l.l_extendedprice / l.l_quantity) AS supply_cost
  FROM lineitem l
  JOIN pf ON l.l_partkey = pf.p_partkey
  JOIN eu ON l.l_suppkey = eu.s_suppkey
  WHERE l.l_quantity > 0
  GROUP BY l.l_partkey, l.l_suppkey
), best AS (
  SELECT l_partkey, min(supply_cost) AS min_cost FROM cost GROUP BY l_partkey
)
SELECT pf.p_partkey, pf.p_name, eu.s_name, eu.n_name, c.supply_cost
FROM cost c
JOIN best b ON c.l_partkey = b.l_partkey AND c.supply_cost = b.min_cost
JOIN pf ON c.l_partkey = pf.p_partkey
JOIN eu ON c.l_suppkey = eu.s_suppkey
"""


@query("tpch_min_cost_supplier", oracle=_MIN_COST_SUPPLIER_ORACLE)
def q_tpch_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape: for each qualifying part, the European supplier(s)
    offering the minimum unit cost.  The user-facing form is a correlated
    subquery (``cost = (SELECT min(cost) ... WHERE partkey = outer)``);
    the engine form is decorrelated: one (part, supplier) cost aggregate,
    a per-part min over it, and an equi-join back on (partkey, cost).
    The part filter and the EUROPE supplier dim are broadcast INTO the
    fact scan first, so the cost relation — and therefore the scalar
    side — is bounded by the filtered part count, not the corpus.  Ties
    at the min cost all survive (deterministic set, as in Q2 itself).
    Reference basis: the per-tenant dimension-model queries of
    docs/architecture.md:113-118."""
    li, pa, su, na, re = _t(spark, sf_dir, "lineitem", "part", "supplier", "nation", "region")
    pf = pa.filter(
        F.col("p_size").between(10, 20) & (F.col("p_type") == "PROMO")
    ).select("p_partkey", "p_name")
    eu = (
        su.join(F.broadcast(na), su["s_nationkey"] == na["n_nationkey"])
        .join(F.broadcast(re), na["n_regionkey"] == re["r_regionkey"])
        .filter(F.col("r_name") == "EUROPE")
        .select("s_suppkey", "s_name", "n_name")
    )
    cost = (
        li.filter(F.col("l_quantity") > 0)
        .join(F.broadcast(pf), li["l_partkey"] == pf["p_partkey"])
        .join(F.broadcast(eu), li["l_suppkey"] == eu["s_suppkey"])
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("supply_cost"))
    )
    # self-join of an aggregate over `cost` back onto `cost`: alias the
    # grouped side's columns so lineage is unambiguous
    best = cost.groupBy(F.col("l_partkey").alias("best_partkey")).agg(
        F.min("supply_cost").alias("min_cost")
    )
    return (
        cost.join(
            F.broadcast(best),
            (cost["l_partkey"] == F.col("best_partkey"))
            & (cost["supply_cost"] == F.col("min_cost")),
        )
        .drop("best_partkey", "min_cost")
        .join(F.broadcast(pf), cost["l_partkey"] == pf["p_partkey"])
        .join(F.broadcast(eu), cost["l_suppkey"] == eu["s_suppkey"])
        .select("p_partkey", "p_name", "s_name", "n_name", "supply_cost")
    )


_SMALL_QTY_REVENUE_ORACLE = """
WITH pf AS (
  SELECT p_partkey FROM part WHERE p_brand = 'Brand#11'
), aq AS (
  SELECT l.l_partkey,
         CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_qty
  FROM lineitem l JOIN pf ON l.l_partkey = pf.p_partkey
  GROUP BY l.l_partkey
)
SELECT count(*) AS small_lines,
       round(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0, 4)
         AS avg_yearly
FROM lineitem l
JOIN pf ON l.l_partkey = pf.p_partkey
JOIN aq ON l.l_partkey = aq.l_partkey
WHERE l.l_quantity < 0.2 * aq.avg_qty
"""


@query("tpch_small_qty_revenue", oracle=_SMALL_QTY_REVENUE_ORACLE)
def q_tpch_small_qty_revenue(spark, sf_dir):
    """TPC-H Q17 shape: revenue that would be lost by refusing
    small-quantity orders of one brand's parts.  The correlated scalar
    (``l_quantity < 0.2 * (SELECT avg(l_quantity) WHERE partkey =
    outer)``) decorrelates into a per-part average computed ONCE over the
    brand-filtered fact slice and broadcast back onto the same slice —
    two broadcast hash joins, one fact shuffle for the per-part agg.
    The average uses a decimal partial sum divided by the count so both
    engines divide bit-identical doubles (registry parity rules)."""
    li, pa = _t(spark, sf_dir, "lineitem", "part")
    pf = pa.filter(F.col("p_brand") == "Brand#11").select("p_partkey")
    li_pf = li.join(F.broadcast(pf), li["l_partkey"] == pf["p_partkey"])
    aq = li_pf.groupBy(li["l_partkey"].alias("aq_partkey")).agg(
        (
            F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double")
            / F.count("*")
        ).alias("avg_qty")
    )
    return (
        li_pf.join(F.broadcast(aq), li["l_partkey"] == F.col("aq_partkey"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.count("*").alias("small_lines"),
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).cast("double")
                / 7.0,
                4,
            ).alias("avg_yearly"),
        )
    )


_PARTS_PROMO_ORACLE = """
WITH pp AS (
  SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
), pair AS (
  SELECT l.l_suppkey, l.l_partkey,
         SUM(CAST(l.l_quantity AS DECIMAL(18,4))) AS qty
  FROM lineitem l JOIN pp ON l.l_partkey = pp.p_partkey
  WHERE l.l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
    AND l.l_shipdate < TIMESTAMP '2000-01-01 00:00:00'
  GROUP BY l.l_suppkey, l.l_partkey
), pavg AS (
  SELECT l_partkey, CAST(SUM(qty) AS DOUBLE) / count(*) AS avg_pair_qty
  FROM pair GROUP BY l_partkey
), excess AS (
  SELECT pair.l_suppkey, count(*) AS excess_parts
  FROM pair JOIN pavg ON pair.l_partkey = pavg.l_partkey
  WHERE CAST(pair.qty AS DOUBLE) > 1.5 * pavg.avg_pair_qty
  GROUP BY pair.l_suppkey
)
SELECT s.s_name, n.n_name, e.excess_parts
FROM excess e
JOIN supplier s ON e.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
"""


@query("tpch_parts_promo", oracle=_PARTS_PROMO_ORACLE)
def q_tpch_parts_promo(spark, sf_dir):
    """TPC-H Q20 shape (nested IN): suppliers who moved a
    disproportionate share of any 'small…' part in 1998-99.  The nested
    form is ``s_suppkey IN (SELECT ... WHERE qty > (SELECT scalar per
    part))``; decorrelated: the name-filtered part list broadcasts into
    the fact, pair totals aggregate once (exact decimals), the per-part
    mean pair total broadcasts back, and the surviving supplier keys are
    a broadcast-sized set joined to the supplier dim.  One fact shuffle
    on (suppkey, partkey); everything else is broadcast."""
    li, pa, su, na = _t(spark, sf_dir, "lineitem", "part", "supplier", "nation")
    pp = pa.filter(F.col("p_name").like("small%")).select("p_partkey")
    pair = (
        li.filter(
            (F.col("l_shipdate") >= "1998-01-01") & (F.col("l_shipdate") < "2000-01-01")
        )
        .join(F.broadcast(pp), li["l_partkey"] == pp["p_partkey"])
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("qty"))
    )
    pavg = pair.groupBy(F.col("l_partkey").alias("pavg_partkey")).agg(
        (F.sum("qty").cast("double") / F.count("*")).alias("avg_pair_qty")
    )
    excess = (
        pair.join(F.broadcast(pavg), pair["l_partkey"] == F.col("pavg_partkey"))
        .filter(F.col("qty").cast("double") > 1.5 * F.col("avg_pair_qty"))
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("excess_parts"))
    )
    return (
        excess.join(F.broadcast(su), excess["l_suppkey"] == su["s_suppkey"])
        .join(F.broadcast(na), su["s_nationkey"] == na["n_nationkey"])
        .select("s_name", "n_name", "excess_parts")
    )


_GLOBAL_SALES_OPPORTUNITY_ORACLE = """
WITH ab AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_bal
  FROM customer WHERE c_acctbal > 0.0
), recent AS (
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
)
SELECT n.n_name,
       count(*) AS numcust,
       round(CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,4))) AS DOUBLE), 4) AS totacctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
CROSS JOIN ab
WHERE c.c_acctbal > ab.avg_bal
  AND c.c_custkey NOT IN (SELECT o_custkey FROM recent)
GROUP BY n.n_name
"""


@query("tpch_global_sales_opportunity", oracle=_GLOBAL_SALES_OPPORTUNITY_ORACLE)
def q_tpch_global_sales_opportunity(spark, sf_dir):
    """TPC-H Q22 shape: rich-but-dormant customers per nation — balance
    above the GLOBAL positive-balance average (scalar subquery) with no
    order since 2001 (NOT EXISTS).  The global average is a one-row
    aggregate broadcast via crossJoin (the canonical scalar-subquery
    decorrelation); the NOT EXISTS is a left-anti join on the customer
    key against the date-pruned distinct order keys.  At 100 TB the anti
    join shuffles both sides on custkey once; the scalar side stays one
    broadcast row at any scale."""
    cu, od, na = _t(spark, sf_dir, "customer", "orders", "nation")
    avg_bal = cu.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,4)")).cast("double") / F.count("*")
        ).alias("avg_bal")
    )
    recent = (
        od.filter(F.col("o_orderdate") >= "2001-01-01").select("o_custkey").distinct()
    )
    return (
        cu.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, cu["c_custkey"] == recent["o_custkey"], "left_anti")
        .join(F.broadcast(na), cu["c_nationkey"] == na["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.count("*").alias("numcust"),
            F.round(
                F.sum(F.col("c_acctbal").cast("decimal(18,4)")).cast("double"), 4
            ).alias("totacctbal"),
        )
    )


_CUSTOMER_DISTRIBUTION_ORACLE = """
WITH co AS (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
SELECT c_count, count(*) AS custdist
FROM co GROUP BY c_count
"""


@query("tpch_customer_distribution", oracle=_CUSTOMER_DISTRIBUTION_ORACLE)
def q_tpch_customer_distribution(spark, sf_dir):
    """TPC-H Q13 shape: the customer order-count histogram INCLUDING
    zero-order customers — the everyday outer-join-then-distribution
    idiom.  The left join carries the filter in the join condition (not
    a WHERE, which would turn it inner); count(o_orderkey) counts only
    matches so unmatched customers land in the 0 bucket.  Two shuffles:
    custkey join+agg, then the tiny histogram rollup."""
    cu, od = _t(spark, sf_dir, "customer", "orders")
    of = od.filter(F.col("o_orderpriority") != "1-URGENT")
    co = (
        cu.join(of, cu["c_custkey"] == of["o_custkey"], "left")
        .groupBy(cu["c_custkey"])
        .agg(F.count(of["o_orderkey"]).alias("c_count"))
    )
    return co.groupBy("c_count").agg(F.count("*").alias("custdist"))


_TOPK_TIES_QUALIFY_ORACLE = """
SELECT o_orderpriority, o_orderkey, o_totalprice,
       CAST(rank() OVER (PARTITION BY o_orderpriority
                         ORDER BY o_totalprice DESC) AS BIGINT) AS rnk
FROM orders
QUALIFY rnk <= 5
"""


@query("win_topk_ties_qualify", oracle=_TOPK_TIES_QUALIFY_ORACLE)
def q_win_topk_ties_qualify(spark, sf_dir):
    """QUALIFY shape: top-5 orders by value per priority WITH ties —
    ``rank()`` (not row_number) so equal prices share a rank and all
    tied rows survive, exactly what SQL's QUALIFY rank() <= k returns
    (the oracle uses DuckDB's QUALIFY literally).  The window is
    PARTITIONED on the 5-value priority key; with heavy per-partition
    volume the pre-rank shuffle is the only wide stage and top-k
    per partition never materializes beyond the frame."""
    (od,) = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(F.desc("o_totalprice"))
    return (
        od.select(
            "o_orderpriority",
            "o_orderkey",
            "o_totalprice",
            F.rank().over(w).cast("bigint").alias("rnk"),
        )
        .filter(F.col("rnk") <= 5)
    )


# ---------------------------------------------------------------------------
# Round-5 completion of the everyday TPC-H shapes (Q7/Q9/Q10/Q11/Q14/Q15/
# Q18/Q19/Q21 adapted to the available columns: no partsupp table, so
# supply-cost facts derive from lineitem/p_retailprice; no receipt/commit
# dates, so "late" = shipped >60 days after order date).
# ---------------------------------------------------------------------------

_DEC1 = "CAST(1 AS DECIMAL(18,4))"
_REV_SQL = (
    "CAST(l.l_extendedprice AS DECIMAL(18,4)) * "
    f"({_DEC1} - CAST(l.l_discount AS DECIMAL(18,4)))"
)


def _rev_col():
    dec = lambda c: F.col(c).cast("decimal(18,4)")  # noqa: E731
    return dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - dec("l_discount"))


_RETURNED_ITEMS_ORACLE = f"""
SELECT c.c_custkey, c.c_name, n.n_name,
       round(CAST(SUM({_REV_SQL}) AS DOUBLE), 4) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@query("tpch_returned_items", oracle=_RETURNED_ITEMS_ORACLE)
def q_tpch_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: revenue lost to returns per customer in one year,
    top 20.  Fact joins shuffle on the order/customer keys (AQE upgrades
    to broadcast when the date filter shrinks orders enough); nation is
    broadcast; top-20 plans as TakeOrderedAndProject over the rounded
    revenue with the unique custkey tie-break."""
    li, od, cu, na = _t(spark, sf_dir, "lineitem", "orders", "customer", "nation")
    odf = od.filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(odf, li["l_orderkey"] == odf["o_orderkey"])
        .join(cu, odf["o_custkey"] == cu["c_custkey"])
        .join(F.broadcast(na), cu["c_nationkey"] == na["n_nationkey"])
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(_rev_col()).cast("double"), 4).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


_PROMO_REVENUE_ORACLE = f"""
SELECT round(100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO' THEN {_REV_SQL}
                                   ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(SUM({_REV_SQL}) AS DOUBLE), 6) AS promo_share_pct
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1998-07-01 00:00:00'
"""


@query("tpch_promo_revenue", oracle=_PROMO_REVENUE_ORACLE)
def q_tpch_promo_revenue(spark, sf_dir):
    """TPC-H Q14 shape: promo revenue share over a window — the
    conditional-ratio-in-one-pass pattern (numerator and denominator as
    two decimal partial sums, ONE scan, part broadcast).  Ratio rounded
    (quotient of two >2^53-scaled casts — SCALE.md §6d)."""
    li, pa = _t(spark, sf_dir, "lineitem", "part")
    rev = _rev_col()
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1998-01-01") & (F.col("l_shipdate") < "1998-07-01")
        )
        .join(F.broadcast(pa), li["l_partkey"] == pa["p_partkey"])
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero)).cast("double")
                / F.sum(rev).cast("double"),
                6,
            ).alias("promo_share_pct")
        )
    )


_TOP_SUPPLIER_ORACLE = f"""
WITH srev AS (
  SELECT l.l_suppkey, SUM({_REV_SQL}) AS rev
  FROM lineitem l
  WHERE l.l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
    AND l.l_shipdate < TIMESTAMP '1998-04-01 00:00:00'
  GROUP BY l.l_suppkey
), mx AS (SELECT max(rev) AS max_rev FROM srev)
SELECT s.s_suppkey, s.s_name, round(CAST(srev.rev AS DOUBLE), 4) AS total_revenue
FROM srev JOIN mx ON srev.rev = mx.max_rev
JOIN supplier s ON srev.l_suppkey = s.s_suppkey
"""


@query("tpch_top_supplier", oracle=_TOP_SUPPLIER_ORACLE)
def q_tpch_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: the supplier(s) with maximum quarterly revenue —
    the scalar-subquery-on-an-aggregate-view pattern.  Decorrelated: the
    per-supplier revenue aggregates once (decimal partial sums), the max
    is a ONE-ROW aggregate broadcast back via crossJoin, and equality on
    the exact decimal keeps ties (as Q15 requires).  Supplier dim
    broadcast."""
    li, su = _t(spark, sf_dir, "lineitem", "supplier")
    srev = (
        li.filter(
            (F.col("l_shipdate") >= "1998-01-01") & (F.col("l_shipdate") < "1998-04-01")
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_rev_col()).alias("rev"))
    )
    mx = srev.agg(F.max("rev").alias("max_rev"))
    return (
        srev.crossJoin(F.broadcast(mx))
        .filter(F.col("rev") == F.col("max_rev"))
        .join(F.broadcast(su), F.col("l_suppkey") == su["s_suppkey"])
        .select(
            "s_suppkey", "s_name", F.round(F.col("rev").cast("double"), 4).alias("total_revenue")
        )
    )


_LARGE_ORDERS_ORACLE = """
WITH big AS (
  SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 240
)
SELECT c.c_name, c.c_custkey, o.o_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
       o.o_totalprice, big.sum_qty
FROM big
JOIN orders o ON big.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
"""


@query("tpch_large_orders", oracle=_LARGE_ORDERS_ORACLE)
def q_tpch_large_orders(spark, sf_dir):
    """TPC-H Q18 shape: large-volume orders (HAVING SUM > threshold in a
    subquery, joined back) — the group-filter-then-enrich idiom.  The
    fact aggregates once on the order key; the surviving keys are a tiny
    relation joined to orders/customer (AQE broadcasts it).  Exact
    decimal sum both engines; the HAVING compares decimals, the output
    casts once."""
    li, od, cu = _t(spark, sf_dir, "lineitem", "orders", "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("qty_dec"))
        .filter(F.col("qty_dec") > 240)
        .select("l_orderkey", F.col("qty_dec").cast("double").alias("sum_qty"))
    )
    return (
        big.join(od, big["l_orderkey"] == od["o_orderkey"])
        .join(cu, od["o_custkey"] == cu["c_custkey"])
        .select(
            "c_name", "c_custkey", "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_totalprice", "sum_qty",
        )
    )


_DISJUNCTIVE_ORACLE = f"""
SELECT count(*) AS matched_lines,
       round(CAST(SUM({_REV_SQL}) AS DOUBLE), 4) AS revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 20)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 10 AND 30 AND l.l_quantity BETWEEN 10 AND 35)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 20 AND 50 AND l.l_quantity BETWEEN 20 AND 50)
"""


@query("tpch_disjunctive_pred", oracle=_DISJUNCTIVE_ORACLE)
def q_tpch_disjunctive_pred(spark, sf_dir):
    """TPC-H Q19 shape: OR-of-ANDs across both join sides.  Catalyst
    cannot push the full disjunction below the join, but it DOES derive
    and push the per-side residuals (l_quantity between the union of
    bounds; brand/size on the part scan), keeping the scan pruned — the
    plan gate asserts a quantity filter reaches the lineitem scan.  Part
    is broadcast; one agg, no shuffle beyond it."""
    li, pa = _t(spark, sf_dir, "lineitem", "part")
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    cond = (
        ((b == "Brand#12") & s.between(1, 15) & q.between(1, 20))
        | ((b == "Brand#23") & s.between(10, 30) & q.between(10, 35))
        | ((b == "Brand#34") & s.between(20, 50) & q.between(20, 50))
    )
    return (
        li.join(F.broadcast(pa), li["l_partkey"] == pa["p_partkey"])
        .filter(cond)
        .agg(
            F.count("*").alias("matched_lines"),
            F.round(F.sum(_rev_col()).cast("double"), 4).alias("revenue"),
        )
    )


_WAITING_SUPPLIERS_ORACLE = """
WITH flags AS (
  SELECT l.l_orderkey, l.l_suppkey,
         max(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                  THEN 1 ELSE 0 END) AS is_late
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY l.l_orderkey, l.l_suppkey
), stats AS (
  SELECT l_orderkey, count(*) AS n_supps, SUM(is_late) AS n_late,
         max(CASE WHEN is_late = 1 THEN l_suppkey END) AS waiter
  FROM flags GROUP BY l_orderkey
)
SELECT s.s_name, n.n_name, count(*) AS numwait
FROM stats
JOIN supplier s ON stats.waiter = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE stats.n_supps > 1 AND stats.n_late = 1
GROUP BY s.s_name, n.n_name
ORDER BY numwait DESC, s_name
LIMIT 10
"""


@query("tpch_waiting_suppliers", oracle=_WAITING_SUPPLIERS_ORACLE)
def q_tpch_waiting_suppliers(spark, sf_dir):
    """TPC-H Q21 shape: suppliers who were the SOLE late shipper on a
    multi-supplier order ("late" = shipped >60 days after order date —
    no receipt/commit dates in this schema).  The textbook form is a
    double correlation (EXISTS other-supplier line AND NOT EXISTS
    other-supplier LATE line); decorrelated here into ONE per-(order,
    supplier) flag agg then ONE per-order agg — supplier count, late
    count, and the single late suppkey via max(CASE) — so the whole
    double-EXISTS costs two partial-agg shuffles and zero self-joins.
    Two-level agg instead of two countDistincts avoids the Expand
    blow-up (queries_tpch.py:107-118 precedent)."""
    li, od, su, na = _t(spark, sf_dir, "lineitem", "orders", "supplier", "nation")
    late = F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL '60' DAY")
    flags = (
        li.join(od, li["l_orderkey"] == od["o_orderkey"])
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(F.when(late, 1).otherwise(0)).alias("is_late"))
    )
    stats = flags.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supps"),
        F.sum("is_late").alias("n_late"),
        F.max(F.when(F.col("is_late") == 1, F.col("l_suppkey"))).alias("waiter"),
    )
    return (
        stats.filter((F.col("n_supps") > 1) & (F.col("n_late") == 1))
        .join(F.broadcast(su), F.col("waiter") == su["s_suppkey"])
        .join(F.broadcast(na), su["s_nationkey"] == na["n_nationkey"])
        .groupBy("s_name", "n_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(10)
    )


_NATION_VOLUME_ORACLE = f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS BIGINT) AS ship_year,
       round(CAST(SUM({_REV_SQL}) AS DOUBLE), 4) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation cn ON c.c_nationkey = cn.n_nationkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation sn ON s.s_nationkey = sn.n_nationkey
WHERE (sn.n_name = 'NATION_9' AND cn.n_name = 'NATION_19')
   OR (sn.n_name = 'NATION_19' AND cn.n_name = 'NATION_9')
GROUP BY sn.n_name, cn.n_name, ship_year
"""


@query("tpch_nation_volume", oracle=_NATION_VOLUME_ORACLE)
def q_tpch_nation_volume(spark, sf_dir):
    """TPC-H Q7 shape: bilateral trade volume between two nations by
    ship year.  Both nation sides broadcast (the same dim table joined
    twice under different aliases); the disjunctive pair filter applies
    after both joins; facts shuffle once on the order key."""
    li, od, cu, su, na = _t(spark, sf_dir, "lineitem", "orders", "customer", "supplier", "nation")
    cn = na.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    sn = na.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    pair = (
        (F.col("supp_nation") == "NATION_9") & (F.col("cust_nation") == "NATION_19")
    ) | ((F.col("supp_nation") == "NATION_19") & (F.col("cust_nation") == "NATION_9"))
    return (
        li.join(od, li["l_orderkey"] == od["o_orderkey"])
        .join(cu, od["o_custkey"] == cu["c_custkey"])
        .join(F.broadcast(cn), cu["c_nationkey"] == F.col("cn_key"))
        .join(F.broadcast(su), li["l_suppkey"] == su["s_suppkey"])
        .join(F.broadcast(sn), su["s_nationkey"] == F.col("sn_key"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").cast("bigint").alias("ship_year")
        )
        .agg(F.round(F.sum(_rev_col()).cast("double"), 4).alias("revenue"))
    )


_PRODUCT_PROFIT_ORACLE = f"""
SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS BIGINT) AS order_year,
       round(CAST(SUM({_REV_SQL}) AS DOUBLE)
             - 0.6 * CAST(SUM(CAST(p.p_retailprice AS DECIMAL(18,4))
                              * CAST(l.l_quantity AS DECIMAL(18,4))) AS DOUBLE),
             4) AS profit
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE p.p_name LIKE '%bolt%'
GROUP BY n.n_name, order_year
"""


@query("tpch_product_profit", oracle=_PRODUCT_PROFIT_ORACLE)
def q_tpch_product_profit(spark, sf_dir):
    """TPC-H Q9 shape: product-line profit by supplier nation and year
    (cost proxy = 60% of retail price × quantity — no partsupp table).
    Revenue and cost accumulate as SEPARATE exact decimal sums in one
    agg pass; the 0.6 factor applies to the final double (a decimal
    0.6 literal would overflow DuckDB's 38-digit product — SCALE.md
    §6d rule 4).  Part filter broadcasts into the fact scan; one
    shuffle on the order key, one on the rollup."""
    li, pa, od, su, na = _t(spark, sf_dir, "lineitem", "part", "orders", "supplier", "nation")
    dec = lambda c: F.col(c).cast("decimal(18,4)")  # noqa: E731
    pf = pa.filter(F.col("p_name").like("%bolt%"))
    return (
        li.join(F.broadcast(pf), li["l_partkey"] == pf["p_partkey"])
        .join(od, li["l_orderkey"] == od["o_orderkey"])
        .join(F.broadcast(su), li["l_suppkey"] == su["s_suppkey"])
        .join(F.broadcast(na), su["s_nationkey"] == na["n_nationkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("order_year"),
        )
        .agg(
            F.round(
                F.sum(_rev_col()).cast("double")
                - 0.6 * F.sum(dec("p_retailprice") * dec("l_quantity")).cast("double"),
                4,
            ).alias("profit")
        )
    )


_IMPORTANT_STOCK_ORACLE = f"""
WITH flow AS (
  SELECT l.l_partkey, SUM({_REV_SQL}) AS value_dec
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  WHERE n.n_name IN ('NATION_3', 'NATION_7')
  GROUP BY l.l_partkey
), tot AS (SELECT CAST(SUM(value_dec) AS DOUBLE) AS total, count(*) AS n FROM flow)
SELECT f.l_partkey AS p_partkey, round(CAST(f.value_dec AS DOUBLE), 4) AS part_value
FROM flow f CROSS JOIN tot
WHERE CAST(f.value_dec AS DOUBLE) > 2.0 * tot.total / tot.n
"""


@query("tpch_important_stock", oracle=_IMPORTANT_STOCK_ORACLE)
def q_tpch_important_stock(spark, sf_dir):
    """TPC-H Q11 shape: parts whose flow value from two nations' suppliers
    exceeds twice the average per-part value — the global-scalar-threshold
    pattern (the threshold is relative to the MEAN, not a fixed fraction
    of the total, so it is scale-free: Q11's fixed fraction divides by
    SF in the spec for the same reason).  The per-part aggregate computes once; the total is a
    one-row aggregate OF THE AGGREGATE (no second fact scan) broadcast
    via crossJoin.  Both sides of the threshold comparison are doubles
    cast from exact decimal sums, so membership is engine-stable."""
    li, su, na = _t(spark, sf_dir, "lineitem", "supplier", "nation")
    nf = na.filter(F.col("n_name").isin("NATION_3", "NATION_7"))
    flow = (
        li.join(F.broadcast(su), li["l_suppkey"] == su["s_suppkey"])
        .join(F.broadcast(nf), su["s_nationkey"] == nf["n_nationkey"])
        .groupBy("l_partkey")
        .agg(F.sum(_rev_col()).alias("value_dec"))
    )
    tot = flow.agg(
        F.sum("value_dec").cast("double").alias("total"), F.count("*").alias("n")
    )
    return (
        flow.crossJoin(F.broadcast(tot))
        .filter(F.col("value_dec").cast("double") > 2.0 * F.col("total") / F.col("n"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round(F.col("value_dec").cast("double"), 4).alias("part_value"),
        )
    )


# ---------------------------------------------------------------------------
# Warehouse window idioms (round 5): period-over-period growth and running
# share — the BI queries layered on every revenue rollup.  All windows here
# run over POST-AGGREGATE relations bounded by the calendar (months/years),
# so even the ordered-by-month window with no partition key holds O(100)
# rows at any corpus scale — the fact scan never passes through a window.
# ---------------------------------------------------------------------------

_MOM_GROWTH_ORACLE = """
WITH m AS (
  SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS rev
  FROM orders GROUP BY 1
)
SELECT month, round(rev, 4) AS revenue,
       round(100.0 * (rev - lag(rev) OVER (ORDER BY month))
             / lag(rev) OVER (ORDER BY month), 6) AS mom_pct
FROM m
"""


@query("win_mom_growth", oracle=_MOM_GROWTH_ORACLE)
def q_win_mom_growth(spark, sf_dir):
    """Month-over-month revenue growth: one fact shuffle for the monthly
    rollup (decimal partial sums), then a lag window over the ~80-row
    month relation (bounded by the calendar, not the corpus — the one
    acceptable home for an unpartitioned ordered window).  First month's
    growth is NULL by definition."""
    (od,) = _t(spark, sf_dir, "orders")
    m = od.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month")
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double").alias("rev"))
    w = Window.orderBy("month")
    prev = F.lag("rev").over(w)
    return m.select(
        "month",
        F.round(F.col("rev"), 4).alias("revenue"),
        F.round(100.0 * (F.col("rev") - prev) / prev, 6).alias("mom_pct"),
    )


_YOY_GROWTH_ORACLE = """
WITH m AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
         CAST(month(o_orderdate) AS BIGINT) AS mon,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS rev
  FROM orders GROUP BY 1, 2
)
SELECT yr, mon, round(rev, 4) AS revenue,
       round(100.0 * (rev - lag(rev) OVER (PARTITION BY mon ORDER BY yr))
             / lag(rev) OVER (PARTITION BY mon ORDER BY yr), 6) AS yoy_pct
FROM m
"""


@query("win_yoy_growth", oracle=_YOY_GROWTH_ORACLE)
def q_win_yoy_growth(spark, sf_dir):
    """Year-over-year growth for the same calendar month — lag over a
    window PARTITIONED by month-of-year (12 partitions) ordered by year,
    on the post-aggregate month relation.  The seasonal comparison every
    revenue dashboard ships."""
    (od,) = _t(spark, sf_dir, "orders")
    m = od.groupBy(
        F.year("o_orderdate").cast("bigint").alias("yr"),
        F.month("o_orderdate").cast("bigint").alias("mon"),
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double").alias("rev"))
    w = Window.partitionBy("mon").orderBy("yr")
    prev = F.lag("rev").over(w)
    return m.select(
        "yr", "mon",
        F.round(F.col("rev"), 4).alias("revenue"),
        F.round(100.0 * (F.col("rev") - prev) / prev, 6).alias("yoy_pct"),
    )


_CUM_SHARE_ORACLE = """
WITH m AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
         CAST(month(o_orderdate) AS BIGINT) AS mon,
         SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS rev_dec
  FROM orders GROUP BY 1, 2
)
SELECT yr, mon,
       round(CAST(rev_dec AS DOUBLE), 4) AS revenue,
       round(CAST(SUM(rev_dec) OVER (PARTITION BY yr ORDER BY mon
                                     ROWS UNBOUNDED PRECEDING) AS DOUBLE)
             / CAST(SUM(rev_dec) OVER (PARTITION BY yr) AS DOUBLE), 6) AS cum_share
FROM m
"""


@query("win_cumulative_share", oracle=_CUM_SHARE_ORACLE)
def q_win_cumulative_share(spark, sf_dir):
    """Running share of the year's revenue by month — cumulative frame
    over the year partition divided by the full-partition total.  Both
    window sums stay DECIMAL (exact, order-independent) and cast to
    double only for the final division, so the share is engine-stable
    regardless of window evaluation order."""
    (od,) = _t(spark, sf_dir, "orders")
    m = od.groupBy(
        F.year("o_orderdate").cast("bigint").alias("yr"),
        F.month("o_orderdate").cast("bigint").alias("mon"),
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("rev_dec"))
    w_run = (
        Window.partitionBy("yr").orderBy("mon")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("yr")
    return m.select(
        "yr", "mon",
        F.round(F.col("rev_dec").cast("double"), 4).alias("revenue"),
        F.round(
            F.sum("rev_dec").over(w_run).cast("double")
            / F.sum("rev_dec").over(w_all).cast("double"),
            6,
        ).alias("cum_share"),
    )


# ---------------------------------------------------------------------------
# Round 5b: the final three TPC-H shapes (Q6/Q12/Q16) — with these the full
# 22-query dash is represented (Q6 straight filter-agg, Q12 fact-fact join
# with conditional aggregation, Q16 distinct-count with an anti-joined
# exclusion list).  The testdata has no l_shipmode/l_commitdate or partsupp,
# so Q12 groups by l_returnflag (the lineitem categorical that survives) and
# Q16 derives part-supplier pairs from lineitem, per the Q2/Q17/Q20 precedent
# above.
# ---------------------------------------------------------------------------

_FORECAST_REVENUE_ORACLE = """
SELECT round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                    * CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE), 4) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.04 AND 0.06
  AND l_quantity < 24
"""


@query("tpch_forecast_revenue", oracle=_FORECAST_REVENUE_ORACLE)
def q_tpch_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape: revenue increase from eliminating a discount band.
    The simplest fact query in the dash and the purest pushdown test: all
    three predicates and both referenced columns must reach the parquet
    scan (PushedFilters + 4-column ReadSchema), then a single partial-agg
    collapse — no shuffle of row data at all, only the one-row partials.
    The sum stays DECIMAL until the final double cast (parity rules)."""
    (li,) = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,4)")  # noqa: E731
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & F.col("l_discount").between(0.04, 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(dec("l_extendedprice") * dec("l_discount")).cast("double"), 4
            ).alias("revenue")
        )
    )


_SHIPMODE_PRIORITY_ORACLE = """
SELECT l.l_returnflag AS ship_group,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l.l_returnflag
"""


@query("tpch_shipmode_priority", oracle=_SHIPMODE_PRIORITY_ORACLE)
def q_tpch_shipmode_priority(spark, sf_dir):
    """TPC-H Q12 shape: did critical-priority orders ship through each
    channel?  (The testdata carries no l_shipmode, so l_returnflag is the
    shipping-channel categorical.)  A fact-fact equi-join on l_orderkey —
    the year filter prunes lineitem FIRST so the shuffle carries one year,
    and the priority flag folds into two conditional SUMs (one pass, no
    pivot).  At 100 TB both sides shuffle on orderkey; AQE coalesces the
    post-filter side.  Conditional aggregation beats a pivot here because
    the category set is fixed at plan time."""
    li, od = _t(spark, sf_dir, "lineitem", "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
        )
        .join(od, li["l_orderkey"] == od["o_orderkey"])
        .groupBy(F.col("l_returnflag").alias("ship_group"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


_SUPPLIER_PART_COUNT_ORACLE = """
WITH excl AS (
  SELECT s_suppkey FROM supplier WHERE s_acctbal < 2000
), pairs AS (
  SELECT DISTINCT l.l_partkey, l.l_suppkey
  FROM lineitem l
  WHERE l.l_suppkey NOT IN (SELECT s_suppkey FROM excl)
)
SELECT p.p_brand, p.p_type, p.p_size,
       count(*) AS supplier_cnt
FROM (SELECT l_partkey, l_suppkey FROM pairs) pr
JOIN part p ON pr.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#11' AND p.p_type <> 'PROMO'
GROUP BY p.p_brand, p.p_type, p.p_size
"""


@query("tpch_supplier_part_count", oracle=_SUPPLIER_PART_COUNT_ORACLE)
def q_tpch_supplier_part_count(spark, sf_dir):
    """TPC-H Q16 shape: how many suppliers can furnish each surviving
    (brand, type, size) bucket, excluding flagged suppliers.  Part-
    supplier pairs derive from lineitem (no partsupp table): distinct
    (partkey, suppkey) FIRST — that groupBy collapses the fact to the
    pair universe before any dim work — then a broadcast anti-join drops
    the excluded suppliers and a broadcast join brings the part
    attributes.  Each pair is distinct already, so the per-bucket
    supplier count is a plain count(*), not a second countDistinct —
    one Expand-free aggregation cascade (the same two-level-star trick
    as win_running_distinct above)."""
    li, pa, su = _t(spark, sf_dir, "lineitem", "part", "supplier")
    excl = su.filter(F.col("s_acctbal") < 2000).select("s_suppkey")
    pairs = (
        li.select("l_partkey", "l_suppkey")
        .join(F.broadcast(excl), li["l_suppkey"] == excl["s_suppkey"], "left_anti")
        .distinct()
    )
    pf = pa.filter(
        (F.col("p_brand") != "Brand#11") & (F.col("p_type") != "PROMO")
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        pairs.join(F.broadcast(pf), pairs["l_partkey"] == pf["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count("*").alias("supplier_cnt"))
    )


_FULFILLMENT_ORACLE = """
SELECT o.o_orderpriority,
       count(*) AS n_lines,
       round(CAST(quantile_cont(date_diff('day', CAST(o.o_orderdate AS DATE),
                                          CAST(l.l_shipdate AS DATE)), 0.5) AS DOUBLE), 4)
         AS p50_days,
       round(CAST(quantile_cont(date_diff('day', CAST(o.o_orderdate AS DATE),
                                          CAST(l.l_shipdate AS DATE)), 0.9) AS DOUBLE), 4)
         AS p90_days,
       CAST(max(date_diff('day', CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE)))
            AS BIGINT) AS max_days
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
"""


@query("tpch_fulfillment_latency", oracle=_FULFILLMENT_ORACLE)
def q_tpch_fulfillment_latency(spark, sf_dir):
    """Order-to-ship fulfillment latency by order priority: exact
    interpolated p50/p90/max of the day gap between order date and each
    line's ship date.  One fact-fact equi-join on l_orderkey (both sides
    shuffle on the key; at 100 TB this is the co-partitioned merge, and
    bucketed storage on orderkey removes it entirely), then a 5-key
    aggregation whose percentile input is the full line population —
    the scale path swaps percentile → approx_percentile on the same
    plan.  The operations-dashboard query of every order system."""
    li, od = _t(spark, sf_dir, "lineitem", "orders")
    gap = F.datediff(F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date"))
    return (
        li.join(od, li["l_orderkey"] == od["o_orderkey"])
        .select("o_orderpriority", gap.alias("gap_days"))
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            F.round(F.expr("percentile(gap_days, 0.5)"), 4).alias("p50_days"),
            F.round(F.expr("percentile(gap_days, 0.9)"), 4).alias("p90_days"),
            F.max("gap_days").cast("bigint").alias("max_days"),
        )
    )


_BASKET_MINSUP = 3

_BASKET_ORACLE = f"""
WITH baskets AS (
  SELECT DISTINCT l_orderkey AS basket, l_partkey AS item FROM lineitem
), freq AS (
  SELECT item, count(*) AS support FROM baskets GROUP BY item
  HAVING count(*) >= {_BASKET_MINSUP}
), pruned AS (
  SELECT b.basket, b.item FROM baskets b JOIN freq f ON f.item = b.item
), pairs AS (
  SELECT a.item AS item_a, b.item AS item_b, count(*) AS pair_support
  FROM pruned a JOIN pruned b
    ON a.basket = b.basket AND a.item < b.item
  GROUP BY a.item, b.item
  HAVING count(*) >= {_BASKET_MINSUP}
)
SELECT p.item_a, p.item_b, p.pair_support,
       CAST(p.pair_support AS DOUBLE) / fa.support AS conf_a_to_b,
       CAST(p.pair_support AS DOUBLE) / fb.support AS conf_b_to_a
FROM pairs p
JOIN freq fa ON fa.item = p.item_a
JOIN freq fb ON fb.item = p.item_b
"""


@query("basket_frequent_pairs", oracle=_BASKET_ORACLE)
def q_basket_frequent_pairs(spark, sf_dir):
    """Market-basket frequent item pairs with a-priori pruning: items
    below min-support are dropped BEFORE pair generation (downward
    closure — an infrequent item cannot appear in a frequent pair), so
    the within-basket self-join runs over pruned baskets only; surviving
    pairs get support and both directional confidences.  The
    association-rule mining shape at scale: basket-key shuffle for the
    pair join, item-support tables broadcast back.  Basket width bounds
    the per-basket pair fan-out (here ≤ 11 items → ≤ 55 pairs)."""
    (li,) = _t(spark, sf_dir, "lineitem")
    baskets = li.select(
        F.col("l_orderkey").alias("basket"), F.col("l_partkey").alias("item")
    ).distinct()
    freq = (
        baskets.groupBy("item")
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= _BASKET_MINSUP)
    )
    pruned = baskets.join(F.broadcast(freq.select("item")), "item").select(
        "basket", "item"
    )
    a = pruned.alias("a")
    b = pruned.alias("b")
    pairs = (
        a.join(b, (F.col("a.basket") == F.col("b.basket")) & (F.col("a.item") < F.col("b.item")))
        .groupBy(F.col("a.item").alias("item_a"), F.col("b.item").alias("item_b"))
        .agg(F.count("*").alias("pair_support"))
        .filter(F.col("pair_support") >= _BASKET_MINSUP)
    )
    fa = freq.select(F.col("item").alias("item_a"), F.col("support").alias("sup_a"))
    fb = freq.select(F.col("item").alias("item_b"), F.col("support").alias("sup_b"))
    return (
        pairs.join(F.broadcast(fa), "item_a")
        .join(F.broadcast(fb), "item_b")
        .select(
            "item_a", "item_b", "pair_support",
            (F.col("pair_support").cast("double") / F.col("sup_a")).alias("conf_a_to_b"),
            (F.col("pair_support").cast("double") / F.col("sup_b")).alias("conf_b_to_a"),
        )
    )
