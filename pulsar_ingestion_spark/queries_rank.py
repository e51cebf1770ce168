"""Rank statistics & ranking-quality metrics (round 8).

Nonparametric two-sample tests, rank correlation, inequality measures,
and IR ranking metrics — the evaluation layer a training-data pipeline
runs on top of the corpus/retrieval operators (SURVEY.md §2.5 extension
families; same role as the model-eval family ``queries_ml.py`` round 5).

Scale discipline: every few-key rank (the test statistics — Mann-
Whitney, Spearman, Kruskal-Wallis, Gini) is computed from per-value
grouped counts plus ``operators.ranking.keyed_running_sums``
(range-partitioned running sums + broadcast offsets — the drift_ks
round-7 re-plan), NOT a ``Window.partitionBy(few_keys)`` whose
parallelism caps at the key count.  The per-user IR metrics (NDCG,
MRR) keep ordinary windows: user_id gives millions of natural
partitions, which is exactly when a partitioned window is the right
plan.  Ranks over ties use the exact average-rank convention encoded in
integers (2·avg_rank = 2·cum − c + 1), so every test statistic is a
single IEEE expression over exact integers — bit-identical to the ANSI
window oracle.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from pulsar_ingestion_spark.operators.ranking import keyed_running_sums
from pulsar_ingestion_spark.registry import query
from pulsar_ingestion_spark.session import fan_out, load_tables


def _t(spark, sf_dir, *names):
    # Round 13: no fan_out — every consumer in this family reaches an
    # exchange (groupBy / window partition) within a narrow projection,
    # so the round-robin pre-exchange was pure waste (measured: MW
    # 2.50 → 1.61 s, gini 2.10 → 1.36 s at sf0.1).  rank_skyline_2d
    # keeps its own fan_out: the part scan feeds both the distinct-price
    # aggregate and the final join, and measured faster with it.
    tabs = load_tables(spark, sf_dir)
    return [tabs[n] for n in names]


# ---------------------------------------------------------------------------
# Mann-Whitney U (Wilcoxon rank-sum) — each event_type vs the 'view'
# baseline.

_MW_BASE = "view"

_MANN_WHITNEY_ORACLE = f"""
WITH treat AS (
  SELECT event_type AS cmp, value, 1 AS is_t
  FROM events WHERE event_type <> '{_MW_BASE}'
), base AS (
  SELECT c.cmp, e.value, 0 AS is_t
  FROM events e
  CROSS JOIN (SELECT DISTINCT event_type AS cmp FROM events
              WHERE event_type <> '{_MW_BASE}') c
  WHERE e.event_type = '{_MW_BASE}'
), pervalue AS (
  SELECT cmp, value, SUM(is_t) AS ct, SUM(1 - is_t) AS cb
  FROM (SELECT * FROM treat UNION ALL SELECT * FROM base)
  GROUP BY cmp, value
), cum AS (
  SELECT cmp, ct, cb, ct + cb AS c,
         SUM(ct + cb) OVER (PARTITION BY cmp ORDER BY value
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cc
  FROM pervalue
), agg AS (
  SELECT cmp,
         SUM(ct) AS n1, SUM(cb) AS n2,
         SUM(ct * (2 * cc - c + 1)) AS r1_twice,
         SUM(c * c * c - c) AS tie_term
  FROM cum GROUP BY cmp
)
SELECT cmp AS event_type,
       CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
       CAST(r1_twice - n1 * (n1 + 1) AS DOUBLE) / 2 AS u1,
       round(
         (CAST(r1_twice - n1 * (n1 + 1) AS DOUBLE) / 2
          - CAST(n1 AS DOUBLE) * n2 / 2)
         / sqrt(CAST(n1 AS DOUBLE) * n2 / 12
                * ((n1 + n2 + 1)
                   - CAST(tie_term AS DOUBLE)
                     / ((n1 + n2) * (n1 + n2 - 1.0)))), 6) AS z
FROM agg
"""


@query("stats_mann_whitney", oracle=_MANN_WHITNEY_ORACLE)
def q_stats_mann_whitney(spark, sf_dir):
    """Mann-Whitney U test of each event type's value distribution
    against the 'view' baseline: exact average-rank rank-sum with the
    tie-corrected normal approximation (no continuity correction).

    The baseline sample collapses to per-VALUE counts FIRST (one
    aggregate over the base rows), and only those value-domain-sized
    count rows are replicated per comparison (round 13 — the old plan
    fanned the base ROWS out ×(k−1) before counting, shuffling the
    duplicated fact rows); treatment rows count per (comparison, value)
    directly, and a full-outer merge restores the zero cells.  The rank
    pass is bounded by distinct values, not rows.  Running counts come
    from ``keyed_running_sums`` (range-partitioned, any parallelism);
    the rank-sum is carried as the exact integer 2·R₁ so U and z are
    single IEEE expressions over exact integers on both engines."""
    (ev,) = _t(spark, sf_dir, "events")
    # Round 13: ONE (value)-keyed aggregate builds a per-type count map;
    # the per-comparison fan-out is a narrow explode against the
    # broadcast type list (zero cells fall out of the map lookup).  This
    # replaces the old two-aggregate + full-outer-join shape — two
    # exchanges and a sort-merge join fewer, same pervalue relation.
    pertype = (
        ev.groupBy("value", "event_type")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("value")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("event_type", "c"))
            ).alias("m")
        )
    )
    cmps = ev.filter(F.col("event_type") != _MW_BASE).agg(
        F.array_sort(F.collect_set("event_type")).alias("cmps")
    )
    pervalue = (
        pertype.crossJoin(F.broadcast(cmps))
        .select(
            "value",
            F.coalesce(F.element_at("m", F.lit(_MW_BASE)), F.lit(0)).alias("cb"),
            F.explode("cmps").alias("cmp"),
            F.col("m"),
        )
        .select(
            "cmp", "value",
            F.coalesce(F.element_at("m", F.col("cmp")), F.lit(0)).cast("long")
            .alias("ct"),
            F.col("cb").cast("long").alias("cb"),
        )
        .withColumn("c", F.col("ct") + F.col("cb"))
        # ADVICE r13 low: values present only in OTHER treatment groups
        # produce ct=0 AND cb=0 rows here (the old full-outer shape never
        # emitted them).  They are algebraically inert for U/z — every
        # aggregate term carries a factor of ct, cb or c — but inflate
        # the ranked relation and the kr_s bucket aggregate by up to
        # |cmps|×; drop them before ranking.
        .filter(F.col("c") > 0)
    )
    cum, _tot = keyed_running_sums(pervalue, ["cmp"], [F.col("value")], ["c"])
    c, cc, ct = F.col("c"), F.col("cum_c"), F.col("ct")
    agg = cum.groupBy("cmp").agg(
        F.sum("ct").alias("n1"),
        F.sum("cb").alias("n2"),
        F.sum(ct * (2 * cc - c + 1)).alias("r1_twice"),
        F.sum(c * c * c - c).alias("tie_term"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    u1 = (F.col("r1_twice") - n1 * (n1 + 1)).cast("double") / 2
    mu = n1.cast("double") * n2 / 2
    sigma = F.sqrt(
        n1.cast("double") * n2 / 12
        * ((n1 + n2 + 1)
           - F.col("tie_term").cast("double") / ((n1 + n2) * (n1 + n2 - 1.0)))
    )
    return agg.select(
        F.col("cmp").alias("event_type"),
        n1.cast("bigint").alias("n1"),
        n2.cast("bigint").alias("n2"),
        u1.alias("u1"),
        F.round((u1 - mu) / sigma, 6).alias("z"),
    )


# ---------------------------------------------------------------------------
# Spearman rank correlation — quantity vs extendedprice per returnflag.

_SPEARMAN_ORACLE = """
WITH rq AS (
  SELECT l_returnflag, l_quantity AS v,
         count(*) AS c,
         SUM(count(*)) OVER (PARTITION BY l_returnflag ORDER BY l_quantity
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cc
  FROM lineitem GROUP BY l_returnflag, l_quantity
), rp AS (
  SELECT l_returnflag, l_extendedprice AS v,
         count(*) AS c,
         SUM(count(*)) OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cc
  FROM lineitem GROUP BY l_returnflag, l_extendedprice
), ranked AS (
  SELECT li.l_returnflag,
         CAST((2 * rq.cc - rq.c + 1) AS DECIMAL(18,1)) / 2 AS qrank,
         CAST((2 * rp.cc - rp.c + 1) AS DECIMAL(18,1)) / 2 AS prank
  FROM lineitem li
  JOIN rq ON rq.l_returnflag = li.l_returnflag AND rq.v = li.l_quantity
  JOIN rp ON rp.l_returnflag = li.l_returnflag AND rp.v = li.l_extendedprice
), m AS (
  SELECT l_returnflag, count(*) AS n,
         CAST(SUM(qrank) AS DOUBLE) AS sx,
         CAST(SUM(prank) AS DOUBLE) AS sy,
         CAST(SUM(qrank * prank) AS DOUBLE) AS sxy,
         CAST(SUM(qrank * qrank) AS DOUBLE) AS sxx,
         CAST(SUM(prank * prank) AS DOUBLE) AS syy
  FROM ranked GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       round((n * sxy - sx * sy)
             / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6)
         AS spearman_rho
FROM m
"""


@query("stats_spearman", oracle=_SPEARMAN_ORACLE)
def q_stats_spearman(spark, sf_dir):
    """Spearman rank correlation (average-rank ties) between quantity
    and extended price per return flag: rank both columns, then Pearson
    on the ranks via one-pass parallel moments (agg_stats_corr plan).

    Round 14 single-pass dual-rank (VERDICT r13 next-round item 1): the
    old plan ran two full ``keyed_running_sums`` passes and then joined
    BOTH rank relations back onto the 600k-row fact — the price-rank
    join was a sort-merge of two fact-sized relations.  Only ``sxy``
    actually needs the per-row (qrank, prank) pairing, and it factors
    through the price groups: sxy = Σ_{(rf,p)} prank·Σ qrank.  So:

      1. quantity ranks ride a per-flag window over the per-(rf,
         quantity) counts — the quantity DOMAIN is bounded (integral
         1..50 in every TPC-H-shaped relation), so that relation is
         MODEL-SIZED (≤ |flags|×50 rows, the 16-row-centroid class
         where a partitioned window is the right plan — no kr_s
         machinery, no eager quantile/guard jobs) and is BROADCAST
         onto the fact scan (no fact shuffle);
      2. one (rf, price) aggregate folds c, Σqrank, Σqrank² per price
         group — this relation IS the price-rank pv, so the second
         kr_s ranks prices off the same exchange;
      3. the final per-flag moments read every term from that one
         relation (sy/syy weight prank by c; sx/sxx fold the qrank
         sums).

    One fact-sized sort-merge join, one kr_s data pass and one fact
    exchange fewer.  All sums stay exact DECIMAL quarter-integers
    (scale-6 decimals hold them exactly) cast to double at the end, so
    rho is bit-identical to the two-join form and the ANSI oracle."""
    (li,) = _t(spark, sf_dir, "lineitem")

    pvq = li.groupBy(
        F.col("l_returnflag").alias("rf"), F.col("l_quantity").alias("qv")
    ).agg(F.count(F.lit(1)).alias("c"))
    wq = (
        Window.partitionBy("rf").orderBy("qv")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cumq = pvq.withColumn("cum_c", F.sum("c").over(wq))
    avg_q = (2 * F.col("cum_c") - F.col("c") + 1).cast("decimal(18,1)") / 2
    rq = cumq.select("rf", "qv", avg_q.alias("qrank"))

    qr = F.col("qrank")
    g = (
        li.select("l_returnflag", "l_quantity", "l_extendedprice")
        .join(F.broadcast(rq), (F.col("l_returnflag") == F.col("rf"))
              & (F.col("l_quantity") == F.col("qv")), "inner")
        .drop("rf", "qv")
        .groupBy(
            F.col("l_returnflag").alias("rf"),
            F.col("l_extendedprice").alias("pv"),
        )
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.sum(qr).alias("sq"),
            F.sum(qr * qr).alias("sq2"),
        )
    )
    cum, _ = keyed_running_sums(g, ["rf"], [F.col("pv")], ["c"])
    pr = (2 * F.col("cum_c") - F.col("c") + 1).cast("decimal(18,1)") / 2
    c = F.col("c")
    m = cum.groupBy("rf").agg(
        F.sum(c).alias("n"),
        F.sum("sq").cast("double").alias("sx"),
        F.sum(c * pr).cast("double").alias("sy"),
        F.sum(pr * F.col("sq")).cast("double").alias("sxy"),
        F.sum("sq2").cast("double").alias("sxx"),
        F.sum(pr * pr * c).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    return m.select(
        F.col("rf").alias("l_returnflag"), "n",
        F.round(
            (n * sxy - sx * sy)
            / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)), 6
        ).alias("spearman_rho"),
    )


# ---------------------------------------------------------------------------
# Gini coefficient of positive customer balances per region.

_GINI_ORACLE = """
WITH cust AS (
  SELECT r.r_name, CAST(c.c_acctbal AS DECIMAL(18,2)) AS x
  FROM customer c
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE c.c_acctbal > 0
), pervalue AS (
  SELECT r_name, x, count(*) AS c,
         SUM(count(*)) OVER (PARTITION BY r_name ORDER BY x
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cc
  FROM cust GROUP BY r_name, x
), agg AS (
  SELECT r_name,
         SUM(c) AS n,
         SUM(x * c) AS t,
         SUM(x * (2 * c * cc - c * (c - 1))) AS s2
  FROM pervalue GROUP BY r_name
)
SELECT r_name, CAST(n AS BIGINT) AS n,
       CAST(t AS DOUBLE) AS total_bal,
       round((CAST(s2 AS DOUBLE) - (n + 1) * CAST(t AS DOUBLE))
             / (n * CAST(t AS DOUBLE)), 6) AS gini
FROM agg
"""


@query("agg_gini", oracle=_GINI_ORACLE)
def q_agg_gini(spark, sf_dir):
    """Gini coefficient of positive account balances per region via the
    rank formula G = (2·Σi·xᵢ − (n+1)·Σx) / (n·Σx) with ascending ranks
    i.  Σi·xᵢ is computed from per-value grouped counts + cumulative
    counts (sum of an arithmetic rank range per tie group), so the plan
    is two broadcast dim joins + one grouped shuffle + keyed running
    sums — no per-region single-task sort.  All sums are exact
    DECIMAL×integer products; gini is one IEEE expression at the end."""
    cu, na, re = _t(spark, sf_dir, "customer", "nation", "region")
    cust = (
        cu.filter(F.col("c_acctbal") > 0)
        .join(F.broadcast(na), cu["c_nationkey"] == na["n_nationkey"])
        .join(F.broadcast(re), na["n_regionkey"] == re["r_regionkey"])
        .select("r_name", F.col("c_acctbal").cast("decimal(18,2)").alias("x"))
    )
    pv = cust.groupBy("r_name", "x").agg(F.count(F.lit(1)).alias("c"))
    cum, _ = keyed_running_sums(pv, ["r_name"], [F.col("x")], ["c"])
    c, cc, x = F.col("c"), F.col("cum_c"), F.col("x")
    agg = cum.groupBy("r_name").agg(
        F.sum("c").alias("n"),
        F.sum(x * c).alias("t"),
        F.sum(x * (2 * c * cc - c * (c - 1))).alias("s2"),
    )
    n, t, s2 = F.col("n"), F.col("t").cast("double"), F.col("s2").cast("double")
    return agg.select(
        "r_name",
        n.cast("bigint").alias("n"),
        t.alias("total_bal"),
        F.round((s2 - (n + 1) * t) / (n * t), 6).alias("gini"),
    )


# ---------------------------------------------------------------------------
# NDCG@5 per user — ranking quality of the value-ordered event feed
# against deterministic relevance grades.

_NDCG_K = 5

_NDCG_ORACLE = f"""
WITH items AS (
  SELECT user_id, event_id, value, event_id % 4 AS rel
  FROM events
), pos AS (
  SELECT user_id, rel,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY value DESC, event_id) AS pos,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY rel DESC, value DESC, event_id) AS ipos
  FROM items
), terms AS (
  SELECT user_id,
         CASE WHEN pos <= {_NDCG_K} THEN
           CAST(round((power(2, rel) - 1) / log2(pos + 1.0), 6)
                AS DECIMAL(18,6)) ELSE CAST(0 AS DECIMAL(18,6)) END AS dterm,
         CASE WHEN ipos <= {_NDCG_K} THEN
           CAST(round((power(2, rel) - 1) / log2(ipos + 1.0), 6)
                AS DECIMAL(18,6)) ELSE CAST(0 AS DECIMAL(18,6)) END AS iterm
  FROM pos
), agg AS (
  SELECT user_id, count(*) AS n_items,
         CAST(SUM(dterm) AS DOUBLE) AS dcg,
         CAST(SUM(iterm) AS DOUBLE) AS idcg
  FROM terms GROUP BY user_id
)
SELECT user_id, CAST(n_items AS BIGINT) AS n_items, dcg, idcg,
       CASE WHEN idcg = 0 THEN CAST(0 AS DOUBLE) ELSE dcg / idcg END AS ndcg
FROM agg
"""


@query("ml_ndcg_at_k", oracle=_NDCG_ORACLE)
def q_ml_ndcg_at_k(spark, sf_dir):
    """NDCG@5 per user: treat each user's events as a ranked feed
    (model score = value, ties broken by event_id) against relevance
    grades rel = event_id % 4; ideal ranking sorts by grade.  DCG terms
    are rounded-to-6 then DECIMAL-summed (order-free); the final
    DCG/IDCG quotient divides identical doubles so it is bitwise equal
    on both engines.

    Windows are partitioned by user_id — millions of natural partitions
    at scale, no re-plan needed (contrast the few-key rank tests above,
    which route through keyed_running_sums)."""
    (ev,) = _t(spark, sf_dir, "events")
    items = ev.select(
        "user_id", "event_id", "value", (F.col("event_id") % 4).alias("rel")
    )
    w_pos = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    w_ipos = Window.partitionBy("user_id").orderBy(
        F.desc("rel"), F.desc("value"), F.asc("event_id")
    )
    pos = items.select(
        "user_id", "rel",
        F.row_number().over(w_pos).alias("pos"),
        F.row_number().over(w_ipos).alias("ipos"),
    )
    gain = F.pow(F.lit(2), F.col("rel")) - 1

    def term(pcol: str):
        return F.when(
            F.col(pcol) <= _NDCG_K,
            F.round(gain / F.log2(F.col(pcol) + 1.0), 6).cast("decimal(18,6)"),
        ).otherwise(F.lit(0).cast("decimal(18,6)"))

    agg = pos.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(term("pos")).cast("double").alias("dcg"),
        F.sum(term("ipos")).cast("double").alias("idcg"),
    )
    return agg.select(
        "user_id",
        F.col("n_items").cast("bigint").alias("n_items"),
        "dcg", "idcg",
        F.when(F.col("idcg") == 0, F.lit(0.0))
        .otherwise(F.col("dcg") / F.col("idcg")).alias("ndcg"),
    )


# ---------------------------------------------------------------------------
# Mean reciprocal rank over user feeds.

_MRR_ORACLE = """
WITH pos AS (
  SELECT user_id, event_id % 4 AS rel,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY value DESC, event_id) AS pos
  FROM events
), firsts AS (
  SELECT user_id, min(CASE WHEN rel = 3 THEN pos END) AS first_rel
  FROM pos GROUP BY user_id
), rr AS (
  SELECT user_id,
         CASE WHEN first_rel IS NULL THEN CAST(0 AS DECIMAL(18,6))
              ELSE CAST(round(1.0 / first_rel, 6) AS DECIMAL(18,6)) END AS rr
  FROM firsts
)
SELECT count(*) AS n_queries,
       CAST(SUM(CASE WHEN rr > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_with_relevant,
       CAST(SUM(rr) AS DOUBLE) / count(*) AS mrr
FROM rr
"""


@query("ml_mrr", oracle=_MRR_ORACLE)
def q_ml_mrr(spark, sf_dir):
    """Mean reciprocal rank: position of the first grade-3 item in each
    user's value-ordered feed; users with no relevant item contribute 0.
    Per-user reciprocal ranks are rounded-to-6 and DECIMAL-summed so the
    global mean is order-free; one row out."""
    (ev,) = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    pos = ev.select(
        "user_id", (F.col("event_id") % 4).alias("rel"),
        F.row_number().over(w).alias("pos"),
    )
    firsts = pos.groupBy("user_id").agg(
        F.min(F.when(F.col("rel") == 3, F.col("pos"))).alias("first_rel")
    )
    rr = firsts.select(
        F.when(F.col("first_rel").isNull(), F.lit(0).cast("decimal(18,6)"))
        .otherwise(F.round(1.0 / F.col("first_rel"), 6).cast("decimal(18,6)"))
        .alias("rr")
    )
    return rr.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.sum(F.when(F.col("rr") > 0, 1).otherwise(0)).cast("bigint")
        .alias("n_with_relevant"),
        (F.sum("rr").cast("double") / F.count(F.lit(1))).alias("mrr"),
    )


# ---------------------------------------------------------------------------
# Log-loss + Brier score per event type from a deterministic logistic
# score proxy.

_LOGLOSS_ORACLE = """
WITH scored AS (
  SELECT event_type,
         least(greatest(1.0 / (1.0 + exp(-(value - 50.0) / 25.0)), 1e-12),
               1.0 - 1e-12) AS p,
         CAST(event_id % 2 AS DOUBLE) AS y
  FROM events
), terms AS (
  SELECT event_type,
         CAST(round(-(y * ln(p) + (1 - y) * ln(1 - p)), 6)
              AS DECIMAL(18,6)) AS ll_term,
         CAST(round((p - y) * (p - y), 6) AS DECIMAL(18,6)) AS br_term
  FROM scored
)
SELECT event_type, count(*) AS n,
       CAST(SUM(ll_term) AS DOUBLE) / count(*) AS log_loss,
       CAST(SUM(br_term) AS DOUBLE) / count(*) AS brier
FROM terms GROUP BY event_type
"""


@query("ml_log_loss", oracle=_LOGLOSS_ORACLE)
def q_ml_log_loss(spark, sf_dir):
    """Log-loss and Brier score per event type for a deterministic
    logistic score proxy p = σ((value−50)/25) against labels
    y = event_id % 2 — the in-plan classifier-eval companion to
    ml_auc_roc/ml_calibration_bins.  Per-row terms are rounded-to-6 and
    DECIMAL-summed (order-free); one narrow groupBy, map-side combined."""
    (ev,) = _t(spark, sf_dir, "events")
    p = F.least(
        F.greatest(
            1.0 / (1.0 + F.exp(-(F.col("value") - 50.0) / 25.0)), F.lit(1e-12)
        ),
        F.lit(1.0 - 1e-12),
    )
    y = (F.col("event_id") % 2).cast("double")
    scored = ev.select("event_type", p.alias("p"), y.alias("y"))
    pp, yy = F.col("p"), F.col("y")
    terms = scored.select(
        "event_type",
        F.round(-(yy * F.log(pp) + (1 - yy) * F.log(1 - pp)), 6)
        .cast("decimal(18,6)").alias("ll_term"),
        F.round((pp - yy) * (pp - yy), 6).cast("decimal(18,6)").alias("br_term"),
    )
    return terms.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("ll_term").cast("double") / F.count(F.lit(1))).alias("log_loss"),
        (F.sum("br_term").cast("double") / F.count(F.lit(1))).alias("brier"),
    )


# ---------------------------------------------------------------------------
# Theil T inequality index (companion to agg_gini).

_THEIL_ORACLE = """
WITH cust AS (
  SELECT r.r_name, CAST(c.c_acctbal AS DECIMAL(18,2)) AS x
  FROM customer c
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE c.c_acctbal > 0
), mu AS (
  SELECT r_name, count(*) AS n, SUM(x) AS t FROM cust GROUP BY r_name
), terms AS (
  SELECT c.r_name, m.n,
         CAST(round(
           (CAST(c.x AS DOUBLE) / (CAST(m.t AS DOUBLE) / m.n))
           * ln(CAST(c.x AS DOUBLE) / (CAST(m.t AS DOUBLE) / m.n)), 6)
           AS DECIMAL(18,6)) AS term
  FROM cust c JOIN mu m ON m.r_name = c.r_name
)
SELECT r_name, CAST(max(n) AS BIGINT) AS n,
       CAST(SUM(term) AS DOUBLE) / max(n) AS theil_t
FROM terms GROUP BY r_name
"""


@query("agg_theil_index", oracle=_THEIL_ORACLE)
def q_agg_theil_index(spark, sf_dir):
    """Theil T inequality index of positive balances per region:
    T = (1/n)·Σ (x/μ)·ln(x/μ) — the decomposable (between+within)
    companion to agg_gini.  Two grouped passes (moments, then terms
    against the broadcast per-region mean); per-row terms are
    rounded-to-6 and DECIMAL-summed so the Σ is order-free; μ and the
    final mean divide exact quantities."""
    cu, na, re = _t(spark, sf_dir, "customer", "nation", "region")
    cust = (
        cu.filter(F.col("c_acctbal") > 0)
        .join(F.broadcast(na), cu["c_nationkey"] == na["n_nationkey"])
        .join(F.broadcast(re), na["n_regionkey"] == re["r_regionkey"])
        .select("r_name", F.col("c_acctbal").cast("decimal(18,2)").alias("x"))
    )
    mu = cust.groupBy("r_name").agg(
        F.count(F.lit(1)).alias("n"), F.sum("x").alias("t")
    )
    j = cust.join(F.broadcast(mu), "r_name")
    ratio = F.col("x").cast("double") / (F.col("t").cast("double") / F.col("n"))
    terms = j.select(
        "r_name", "n",
        F.round(ratio * F.log(ratio), 6).cast("decimal(18,6)").alias("term"),
    )
    return terms.groupBy("r_name").agg(
        F.max("n").cast("bigint").alias("n"),
        (F.sum("term").cast("double") / F.max("n")).alias("theil_t"),
    )


# ---------------------------------------------------------------------------
# Kruskal-Wallis H (rank-based one-way ANOVA across all event types).

_KRUSKAL_ORACLE = """
WITH pervalue AS (
  SELECT event_type, value, count(*) AS c
  FROM events GROUP BY event_type, value
), gv AS (
  SELECT value, SUM(c) AS gc,
         SUM(SUM(c)) OVER (ORDER BY value
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS gcc
  FROM pervalue GROUP BY value
), ranked AS (
  SELECT p.event_type, p.c,
         (2 * g.gcc - g.gc + 1) AS rank2
  FROM pervalue p JOIN gv g ON g.value = p.value
), groups AS (
  SELECT event_type, SUM(c) AS nj, SUM(c * rank2) AS rsum2
  FROM ranked GROUP BY event_type
), ties AS (
  SELECT SUM(gc * gc * gc - gc) AS tie_term, SUM(gc) AS n FROM gv
)
SELECT CAST(t.n AS BIGINT) AS n,
       CAST((SELECT count(*) FROM groups) AS BIGINT) AS k_groups,
       round(
         (12.0 / (CAST(t.n AS DOUBLE) * (t.n + 1))
          * CAST((SELECT SUM(CAST(round(
                CAST(g2.rsum2 AS DOUBLE) * g2.rsum2 / (4.0 * g2.nj), 6)
                AS DECIMAL(28,6))) FROM groups g2) AS DOUBLE)
          - 3.0 * (t.n + 1))
         / (1 - CAST(t.tie_term AS DOUBLE) / (CAST(t.n AS DOUBLE) * t.n * t.n - t.n)),
         6) AS h_statistic
FROM ties t
"""


@query("stats_kruskal_wallis", oracle=_KRUSKAL_ORACLE)
def q_stats_kruskal_wallis(spark, sf_dir):
    """Kruskal-Wallis H: the k-sample rank ANOVA across ALL event types
    at once (the omnibus companion to the pairwise stats_mann_whitney),
    with the standard tie correction.

    Global average ranks come from per-value grouped counts: rank2 =
    2·avg_rank is exact-integer (2·cum − c + 1) over the value-ordered
    global cumulative, so every group rank-sum is an exact integer and
    H is one IEEE expression at the end.  The distinct-value relation
    is the only ranked thing (bounded support — quantize at 100 TB,
    drift_ks discipline); the cumulative uses keyed_running_sums with a
    constant key (range-partitioned, no single-task window)."""
    (ev,) = _t(spark, sf_dir, "events")
    pervalue = ev.groupBy("event_type", "value").agg(
        F.count(F.lit(1)).alias("c")
    )
    glob = pervalue.groupBy("value").agg(F.sum("c").alias("gc")).withColumn(
        "k", F.lit(1)
    )
    cum, _ = keyed_running_sums(glob, ["k"], [F.col("value")], ["gc"])
    ranked = pervalue.join(
        cum.select("value", "gc", "cum_gc"), "value"
    ).select(
        "event_type", "c",
        (2 * F.col("cum_gc") - F.col("gc") + 1).alias("rank2"),
    )
    groups = ranked.groupBy("event_type").agg(
        F.sum("c").alias("nj"), F.sum(F.col("c") * F.col("rank2")).alias("rsum2")
    )
    ties = cum.agg(
        F.sum(F.col("gc") * F.col("gc") * F.col("gc") - F.col("gc"))
        .alias("tie_term"),
        F.sum("gc").alias("n"),
    )
    gsum = groups.agg(
        F.count(F.lit(1)).alias("k_groups"),
        F.sum(
            F.round(
                F.col("rsum2").cast("double") * F.col("rsum2")
                / (4.0 * F.col("nj")), 6
            ).cast("decimal(28,6)")
        ).cast("double").alias("rterm"),
    )
    j = ties.crossJoin(gsum)
    n, tt = F.col("n"), F.col("tie_term")
    h = (
        (12.0 / (n.cast("double") * (n + 1)) * F.col("rterm") - 3.0 * (n + 1))
        / (1 - tt.cast("double") / (n.cast("double") * n * n - n))
    )
    return j.select(
        n.cast("bigint").alias("n"),
        F.col("k_groups").cast("bigint").alias("k_groups"),
        F.round(h, 6).alias("h_statistic"),
    )


# ---------------------------------------------------------------------------
# Round 11: Matthews correlation + balanced accuracy at threshold 0.5

_MCC_ORACLE = """
WITH lab AS (
  SELECT event_type,
         CASE WHEN value >= 50.0 THEN 1 ELSE 0 END AS pred,
         CAST(event_id % 2 AS INTEGER) AS y
  FROM events
), c AS (
  SELECT event_type,
         CAST(SUM(CASE WHEN pred = 1 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         CAST(SUM(CASE WHEN pred = 1 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         CAST(SUM(CASE WHEN pred = 0 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
         CAST(SUM(CASE WHEN pred = 0 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn
  FROM lab GROUP BY event_type
)
SELECT event_type, tp, fp, tn, fn,
       (CAST(tp AS DOUBLE) * CAST(tn AS DOUBLE)
        - CAST(fp AS DOUBLE) * CAST(fn AS DOUBLE))
       / nullif(sqrt((CAST(tp AS DOUBLE) + CAST(fp AS DOUBLE))
                     * (CAST(tp AS DOUBLE) + CAST(fn AS DOUBLE))
                     * (CAST(tn AS DOUBLE) + CAST(fp AS DOUBLE))
                     * (CAST(tn AS DOUBLE) + CAST(fn AS DOUBLE))), 0.0) AS mcc,
       (CAST(tp AS DOUBLE) / nullif(tp + fn, 0)
        + CAST(tn AS DOUBLE) / nullif(tn + fp, 0)) / 2.0 AS balanced_acc
FROM c
"""


@query("ml_matthews_corr", oracle=_MCC_ORACLE)
def q_ml_matthews_corr(spark, sf_dir):
    """Matthews correlation coefficient + balanced accuracy per event
    type at the 0.5 threshold of the fleet's deterministic logistic
    proxy (p = σ((value−50)/25) ≥ 0.5 ⇔ value ≥ 50; labels
    y = event_id % 2 — the ml_log_loss conventions).  MCC is the
    single-number confusion summary robust to class imbalance.
    Confusion counts are exact BIGINTs from one map-side-combined
    groupBy; the MCC product is evaluated in DOUBLE (the 4-marginal
    product overflows int64 at ~10⁵ rows/group) with an identical
    left-associated expression tree on both engines — bitwise parity
    without rounding; degenerate marginals → NULL via nullif."""
    (ev,) = _t(spark, sf_dir, "events")
    pred = F.when(F.col("value") >= 50.0, 1).otherwise(0)
    y = (F.col("event_id") % 2).cast("int")
    lab = ev.select("event_type", pred.alias("pred"), y.alias("y"))
    c = lab.groupBy("event_type").agg(
        F.sum(F.when((F.col("pred") == 1) & (F.col("y") == 1), 1).otherwise(0))
        .cast("bigint").alias("tp"),
        F.sum(F.when((F.col("pred") == 1) & (F.col("y") == 0), 1).otherwise(0))
        .cast("bigint").alias("fp"),
        F.sum(F.when((F.col("pred") == 0) & (F.col("y") == 0), 1).otherwise(0))
        .cast("bigint").alias("tn"),
        F.sum(F.when((F.col("pred") == 0) & (F.col("y") == 1), 1).otherwise(0))
        .cast("bigint").alias("fn"),
    )
    tpd = F.col("tp").cast("double")
    fpd = F.col("fp").cast("double")
    tnd = F.col("tn").cast("double")
    fnd = F.col("fn").cast("double")
    denom = F.sqrt((tpd + fpd) * (tpd + fnd) * (tnd + fpd) * (tnd + fnd))
    mcc = (tpd * tnd - fpd * fnd) / F.nullif(denom, F.lit(0.0))
    bacc = (
        tpd / F.nullif((F.col("tp") + F.col("fn")).cast("double"), F.lit(0.0))
        + tnd / F.nullif((F.col("tn") + F.col("fp")).cast("double"), F.lit(0.0))
    ) / 2.0
    return c.select("event_type", "tp", "fp", "tn", "fn",
                    mcc.alias("mcc"), bacc.alias("balanced_acc"))


# ---------------------------------------------------------------------------
# Wilcoxon signed-rank (round 11, session 3) — the PAIRED twin of
# stats_mann_whitney: naturally paired rates on each lineitem row
# (l_discount vs l_tax), signed ranks of |d| with average-rank ties and
# the tie-corrected normal approximation.

_WILCOXON_ORACLE = """
WITH d AS (
  SELECT l_discount - l_tax AS dv FROM lineitem
  WHERE l_discount - l_tax <> 0
), pervalue AS (
  SELECT abs(dv) AS ad,
         SUM(CASE WHEN dv > 0 THEN 1 ELSE 0 END) AS cpos,
         count(*) AS c
  FROM d GROUP BY abs(dv)
), cum AS (
  SELECT cpos, c,
         SUM(c) OVER (ORDER BY ad
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc
  FROM pervalue
), agg AS (
  SELECT SUM(c) AS n,
         SUM(cpos * (2 * cc - c + 1)) AS w_twice,
         SUM(CAST(c AS DOUBLE) * c * c - c) AS tie_term
  FROM cum
)
SELECT CAST(n AS BIGINT) AS n,
       CAST(w_twice AS DOUBLE) / 2 AS w_plus,
       round(
         (CAST(w_twice AS DOUBLE) - CAST(n AS DOUBLE) * (n + 1) / 2)
         / sqrt(CAST(n AS DOUBLE) * (n + 1) * (2 * n + 1) / 6
                - CAST(tie_term AS DOUBLE) / 12), 6) AS z
FROM agg
"""


@query("stats_wilcoxon_signed_rank", oracle=_WILCOXON_ORACLE)
def q_stats_wilcoxon_signed_rank(spark, sf_dir):
    """Wilcoxon signed-rank test over the naturally paired per-row rates
    (discount vs tax): zero differences dropped (standard practice),
    |d| ranked ascending with exact average ranks carried as the integer
    2·avg = 2·cum − c + 1, W⁺ accumulated as the exact integer 2·W⁺, and
    the tie-corrected normal z as a single IEEE expression over exact
    integers — the same few-key-rank discipline as stats_mann_whitney
    (per-value counts + keyed_running_sums, never a one-key window).
    The difference is a single IEEE subtraction of identical doubles, so
    grouping on |d| is bit-identical across engines."""
    (li,) = _t(spark, sf_dir, "lineitem")
    d = li.select((F.col("l_discount") - F.col("l_tax")).alias("dv")).filter(
        F.col("dv") != 0
    )
    pervalue = (
        d.groupBy(F.abs(F.col("dv")).alias("ad"))
        .agg(
            F.sum(F.when(F.col("dv") > 0, 1).otherwise(0)).alias("cpos"),
            F.count(F.lit(1)).alias("c"),
        )
        .withColumn("k", F.lit(1))
    )
    cum, _tot = keyed_running_sums(pervalue, ["k"], [F.col("ad")], ["c"])
    c, cc = F.col("c"), F.col("cum_c")
    agg = cum.agg(
        F.sum("c").alias("n"),
        F.sum(F.col("cpos") * (2 * cc - c + 1)).alias("w_twice"),
        # c cubed in DOUBLE (both engines): integer c^3 overflows int64
        # once one |d| group exceeds ~2.1M rows (SF >= ~7 lineitem with
        # only ~19 distinct rate gaps), an ANSI abort / silent-wrap
        # split.  Each c^3 rounds identically on both engines (same
        # IEEE ops); the sum spans only #distinct-|d| terms and z is
        # rounded at 6 dp, so order-ULP noise is far below the output
        # contract (and bit-exact at fixture group sizes, where c^3 is
        # an exact double).  Session-3 review finding #2.
        F.sum(c.cast("double") * c * c - c).alias("tie_term"),
    )
    n = F.col("n")
    nd = n.cast("double")
    z = (F.col("w_twice").cast("double") - nd * (n + 1) / 2) / F.sqrt(
        nd * (n + 1) * (2 * n + 1) / 6 - F.col("tie_term") / 12
    )
    return agg.select(
        n.cast("bigint").alias("n"),
        (F.col("w_twice").cast("double") / 2).alias("w_plus"),
        F.round(z, 6).alias("z"),
    )


# ---------------------------------------------------------------------------
# Round 11 session 4: 2-D skyline (Pareto frontier) — the classic
# preference query (Borzsony/Kossmann/Stocker, ICDE 2001): parts no
# other part dominates, minimizing retail price while maximizing size.

_SKYLINE_ORACLE = """
SELECT p.p_partkey, p.p_retailprice, p.p_size
FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM part q
  WHERE (q.p_retailprice < p.p_retailprice AND q.p_size >= p.p_size)
     OR (q.p_retailprice <= p.p_retailprice AND q.p_size > p.p_size)
)
"""


# Broadcast guard (VERDICT r11 item 7): the distinct-price relation
# grows with the price DOMAIN, not the row count — bounded for TPC-H
# cent-granular prices, unbounded in general.  Past this many rows the
# plan switches to shuffle joins + the range-partitioned exclusive
# running max instead of forcing driver-sized broadcasts.
_SKYLINE_BROADCAST_MAX_ROWS = 500_000


def skyline_2d(part, max_broadcast_rows: int = _SKYLINE_BROADCAST_MAX_ROWS):
    """2-D skyline via sort-scan, distributed: collapse to one row per
    DISTINCT price (best size at that price — one partial-agg shuffle),
    bucket prices into integer dollars, run the running strictly-cheaper
    max-size inside each bucket (window PARTITIONED by bucket over the
    distinct-price relation), and resolve cross-bucket domination over
    the ~|buckets| aggregate (every lower bucket's price is strictly
    cheaper by construction).  A part survives iff nothing at its own
    price beats its size, nothing strictly cheaper in its bucket
    ties-or-beats it, and no lower bucket ties-or-beats it.  O(n) +
    O(P log P) where P = distinct prices — the oracle is the quadratic
    NOT-EXISTS definition, this plan is the one you'd run on 100 TB.

    The distinct-price relation is price-DOMAIN-sized: below
    ``max_broadcast_rows`` it is broadcast (triangular bucket join +
    broadcast-hash final join); above, the same semantics run through
    shuffle joins and ``global_exclusive_running_max`` so an unbounded
    domain can't OOM the driver (VERDICT r11 item 7)."""
    from pulsar_ingestion_spark.operators.ranking import (
        global_exclusive_running_max,
    )

    pts = part.groupBy(F.col("p_retailprice").alias("price")).agg(
        F.max("p_size").alias("ms")
    ).withColumn("bucket", F.floor("price").cast("bigint"))
    w = (
        Window.partitionBy("bucket")
        .orderBy("price")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pts = pts.withColumn("cheaper_max", F.max("ms").over(w)).persist()
    stats = pts.agg(
        F.count(F.lit(1)).alias("np"),
        F.countDistinct("bucket").alias("nb"),
    ).first()
    small = (stats["np"] or 0) <= max_broadcast_rows
    buckets = pts.groupBy("bucket").agg(F.max("ms").alias("bmax"))
    if small:
        a = buckets.alias("a")
        b = buckets.alias("b")
        lowmax = (
            a.join(F.broadcast(b), F.col("b.bucket") < F.col("a.bucket"))
            .groupBy(F.col("a.bucket").alias("bucket"))
            .agg(F.max(F.col("b.bmax")).alias("lowmax"))
        )
        pstats = pts.join(F.broadcast(lowmax), "bucket", "left")
        pstats = F.broadcast(pstats)
    else:
        lowmax = global_exclusive_running_max(
            buckets, "bucket", "bmax", "lowmax"
        ).select("bucket", "lowmax")
        pstats = pts.join(lowmax, "bucket", "left")
    joined = part.join(pstats, part["p_retailprice"] == pstats["price"])
    keep = (
        (F.col("p_size") == F.col("ms"))
        & (F.coalesce(F.col("cheaper_max"), F.lit(-1)) < F.col("p_size"))
        & (F.coalesce(F.col("lowmax"), F.lit(-1)) < F.col("p_size"))
    )
    return joined.filter(keep).select("p_partkey", "p_retailprice", "p_size")


@query("rank_skyline_2d", oracle=_SKYLINE_ORACLE)
def q_rank_skyline_2d(spark, sf_dir):
    # See skyline_2d — registry id binds it to the part table.
    part = fan_out(load_tables(spark, sf_dir)["part"], spark)
    return skyline_2d(part)


# ---------------------------------------------------------------------------
# Weighted median (lower) of price weighted by quantity, per returnflag.

_WMEDIAN_ORACLE = """
WITH pv AS (
  SELECT l_returnflag, l_extendedprice AS p,
         SUM(CAST(l_quantity AS BIGINT)) AS w
  FROM lineitem GROUP BY 1, 2
), c AS (
  SELECT l_returnflag, p, w,
         SUM(w) OVER (PARTITION BY l_returnflag ORDER BY p) AS cw,
         SUM(w) OVER (PARTITION BY l_returnflag) AS tw
  FROM pv
)
SELECT l_returnflag,
       CAST(tw AS BIGINT) AS total_weight,
       MIN(CASE WHEN 2 * cw >= tw THEN p END) AS weighted_median_price
FROM c GROUP BY l_returnflag, tw
"""


@query("agg_weighted_median", oracle=_WMEDIAN_ORACLE)
def q_agg_weighted_median(spark, sf_dir):
    """Lower weighted median: smallest price whose cumulative quantity
    weight reaches half the group total.  Collapses to one exact-decimal
    row per (flag, price), then runs the running weight through
    ``keyed_running_sums`` (range-partitioned cumsum + broadcast offsets)
    instead of a per-flag window — 4 return flags would otherwise cap
    the scan at 4 tasks.  The half-total test is 2*cw >= tw in exact
    DECIMAL, so both engines pick the identical row."""
    li = load_tables(spark, sf_dir)["lineitem"]  # no fan_out: pv groupBy follows
    pv = li.groupBy("l_returnflag", F.col("l_extendedprice").alias("p")).agg(
        # quantity is integral (TPC-H 1..50): a BIGINT weight keeps the
        # running sum exact and matches the helper's Long offset schema.
        F.sum(F.col("l_quantity").cast("bigint")).alias("w")
    )
    cum, totals = keyed_running_sums(pv, ["l_returnflag"], [F.col("p")], ["w"])
    j = cum.join(F.broadcast(totals), "l_returnflag")
    return j.groupBy("l_returnflag", "total_w").agg(
        F.min(
            F.when(2 * F.col("cum_w") >= F.col("total_w"), F.col("p"))
        ).alias("weighted_median_price"),
    ).select(
        "l_returnflag",
        F.col("total_w").cast("bigint").alias("total_weight"),
        "weighted_median_price",
    )
