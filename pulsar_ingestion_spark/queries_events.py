"""Event-journey analytics over the `events` table — funnel conversion,
cohort retention, gap-based sessionization.  The composite queries a
product-analytics user runs daily, expressed as portable column algebra
(conditional aggregation + window functions; no UDFs, no iteration).

Oracle-parity notes: timestamps leave as epoch MICROSECONDS bigints
(`unix_micros` / `epoch_us` — events.ts carries microseconds, string
formats differ between engines), session/funnel ordering tie-breaks on
event_id.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from pulsar_ingestion_spark.registry import query
from pulsar_ingestion_spark.session import load_tables


@query(
    "events_funnel",
    oracle="""
    WITH s1 AS (
      SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'click' GROUP BY user_id
    ), s2 AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'view' AND e.ts > s1.t1
      GROUP BY e.user_id
    ), s3 AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2
      GROUP BY e.user_id
    )
    SELECT CAST(1 AS BIGINT) AS stage, 'click' AS event_type, (SELECT count(*) FROM s1) AS users
    UNION ALL
    SELECT CAST(2 AS BIGINT), 'view', (SELECT count(*) FROM s2)
    UNION ALL
    SELECT CAST(3 AS BIGINT), 'purchase', (SELECT count(*) FROM s3)
    """,
)
def q_events_funnel(spark, sf_dir):
    # Ordered funnel: click -> view (after the click) -> purchase (after
    # that view).  Each stage is one filtered agg + one equi-join against
    # the (small) prior-stage user set — joins shuffle on user_id only,
    # and every stage's frame shrinks monotonically, so at 100 TB the
    # wide side is scanned once per stage with the stage predicate pushed
    # down; no self-join of the full event log against itself.
    ev = load_tables(spark, sf_dir)["events"]  # no fan_out (r13)
    s1 = ev.filter(F.col("event_type") == "click").groupBy("user_id").agg(F.min("ts").alias("t1"))
    s2 = (
        ev.filter(F.col("event_type") == "view")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    spark_counts = [
        (1, "click", s1),
        (2, "view", s2),
        (3, "purchase", s3),
    ]
    out = None
    for stage, name, df in spark_counts:
        row = df.agg(F.count(F.lit(1)).alias("users")).select(
            F.lit(stage).cast("bigint").alias("stage"), F.lit(name).alias("event_type"), "users"
        )
        out = row if out is None else out.unionByName(row)
    return out


@query(
    "events_cohort_retention",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_week FROM events GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT e.user_id, f.cohort_week,
             date_diff('day', f.cohort_week, date_trunc('week', e.ts)) // 7 AS week_offset
      FROM events e JOIN first_seen f ON e.user_id = f.user_id
    )
    SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
           CAST(week_offset AS BIGINT) AS week_offset,
           count(*) AS active_users
    FROM activity GROUP BY cohort_week, week_offset
    """,
)
def q_events_cohort_retention(spark, sf_dir):
    # Cohort retention triangle: users grouped by first-seen week, counted
    # in each later week they were active.  Two shuffles total (first-seen
    # agg on user_id; the distinct+count on (cohort, offset)); the join is
    # user_id-keyed so it co-partitions with the first agg — at 100 TB the
    # event log is read once and everything downstream is
    # cardinality-of-users sized.
    ev = load_tables(spark, sf_dir)["events"]  # no fan_out (r13)
    first_seen = ev.groupBy("user_id").agg(F.date_trunc("week", F.min("ts")).alias("cohort_week"))
    activity = (
        ev.join(first_seen, "user_id")
        .select(
            "user_id",
            "cohort_week",
            F.floor(
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week")) / 7
            ).alias("week_offset"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).alias("active_users")
    ).select(
        F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
        F.col("week_offset").cast("bigint").alias("week_offset"),
        "active_users",
    )


@query(
    "events_sessionize",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_id, ts, value,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    ), flagged AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN prev_ts IS NULL
                       OR date_diff('second', prev_ts, ts) > 1800 THEN 1 ELSE 0 END AS is_new
      FROM ordered
    ), numbered AS (
      SELECT user_id, ts, value,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_idx
      FROM flagged
    )
    SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
           epoch_us(min(ts)) AS session_start_us,
           epoch_us(max(ts)) AS session_end_us,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM numbered GROUP BY user_id, session_idx
    """,
)
def q_events_sessionize(spark, sf_dir):
    # Batch sessionization: a >30 min silence starts a new session
    # (the batch analog of stream_session_window's event-time gap
    # sessions).  lag + running-sum over the per-user ordered window,
    # then one agg per (user, session) — two window passes and one
    # shuffle, all partitioned by user_id, so session state never
    # crosses executors.  Tie-break on event_id keeps the running sum
    # deterministic under equal timestamps.
    ev = load_tables(spark, sf_dir)["events"]  # no fan_out (r13)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    is_new = F.when(
        prev.isNull() | (F.unix_timestamp("ts") - F.unix_timestamp(prev) > 1800), 1
    ).otherwise(0)
    numbered = ev.select(
        "user_id", "ts", "value",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("session_idx"),
    )
    return numbered.groupBy("user_id", "session_idx").agg(
        F.unix_micros(F.min("ts")).alias("session_start_us"),
        F.unix_micros(F.max("ts")).alias("session_end_us"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
    )


@query(
    "join_range_banded",
    oracle="""
    SELECT a.event_id AS error_id, b.event_id AS purchase_id,
           epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
    FROM events a JOIN events b
      ON a.event_type = 'error' AND b.event_type = 'purchase'
     AND abs(epoch_us(b.ts) - epoch_us(a.ts)) <= 30000000
    """,
)
def q_join_range_banded(spark, sf_dir):
    # Big x big temporal-proximity join (errors x purchases within 30 s)
    # WITHOUT a cartesian/BNLJ — the generic band-explode plan in
    # operators.joins.banded_range_join (round 12: extracted so the
    # range fuzzer tests ONE implementation against DuckDB's native
    # IEJoin; join_theta_range keeps the broadcast-BNLJ shape for the
    # tiny-bounds case; this is the sibling for two fact tables).
    from pulsar_ingestion_spark.operators.joins import banded_range_join

    ev = load_tables(spark, sf_dir)["events"]  # no fan_out (r13)
    us = F.unix_micros(F.col("ts"))
    a = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), us.alias("a_us"),
    )
    b = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), us.alias("b_us"),
    )
    return banded_range_join(
        a, b, "a_us", "b_us", 30_000_000, symmetric=True
    ).select("error_id", "purchase_id", F.col("gap").alias("gap_us"))


@query(
    "ts_ewma",
    oracle="""
    WITH ordered AS (
      SELECT user_id, list(value ORDER BY ts, event_id) AS vals
      FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(len(vals) AS BIGINT) AS n_events,
           list_reduce(vals, (acc, x) -> 0.3 * x + 0.7 * acc) AS ewma_value
    FROM ordered
    """,
)
def q_ts_ewma(spark, sf_dir):
    # Exponentially-weighted moving average per user — the recursive
    # smoother window frames can't express (state depends on EVERY prior
    # row, not a fixed frame).  Encoded as an ordered left fold:
    # collect the per-user value sequence (deterministic (ts, event_id)
    # order), seed with the first element, fold 0.3·x + 0.7·acc with
    # F.aggregate — identical IEEE operation order to the oracle's
    # list_reduce, so values hash-match exactly.
    #
    # Scale shape: one shuffle (groupBy user_id); per-user sequences are
    # session-sized.  For corpus-length sequences the same fold runs as
    # applyInPandasWithState over time-ordered micro-batches (the
    # streaming sibling, streaming/stateful.py) — this is the batch
    # contract for it.
    ev = load_tables(spark, sf_dir)["events"]  # no fan_out (r13)
    seq = ev.groupBy("user_id").agg(
        F.sort_array(F.collect_list(F.struct("ts", "event_id", "value"))).alias("seq")
    )
    vals = F.col("seq").getField("value")
    ewma = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1),
        lambda acc, x: F.lit(0.3) * x + F.lit(0.7) * acc,
    )
    return seq.select(
        "user_id",
        F.size("seq").cast("bigint").alias("n_events"),
        ewma.alias("ewma_value"),
    )


@query(
    "table_profile",
    oracle="""
    SELECT 'l_quantity' AS col_name,
           count(*) AS n_rows,
           count(*) - count(l_quantity) AS n_nulls,
           count(DISTINCT l_quantity) AS n_distinct,
           CAST(min(l_quantity) AS VARCHAR) AS min_val,
           CAST(max(l_quantity) AS VARCHAR) AS max_val
    FROM lineitem
    UNION ALL
    SELECT 'l_returnflag', count(*), count(*) - count(l_returnflag),
           count(DISTINCT l_returnflag),
           CAST(min(l_returnflag) AS VARCHAR), CAST(max(l_returnflag) AS VARCHAR)
    FROM lineitem
    UNION ALL
    SELECT 'l_linestatus', count(*), count(*) - count(l_linestatus),
           count(DISTINCT l_linestatus),
           CAST(min(l_linestatus) AS VARCHAR), CAST(max(l_linestatus) AS VARCHAR)
    FROM lineitem
    """,
)
def q_table_profile(spark, sf_dir):
    # Data-quality profiling: per-column row/null/distinct/min/max in ONE
    # scan — the health check a lake team schedules nightly.  All three
    # column profiles aggregate in a single pass (one Aggregate over the
    # scan, no shuffle of raw rows — partial aggs combine map-side), then
    # unpivot to the long (col_name, metrics) form.  At 100 TB this reads
    # each column chunk once; column pruning keeps it to the profiled set.
    li = load_tables(spark, sf_dir)["lineitem"]  # no fan_out (r13)
    cols = ["l_quantity", "l_returnflag", "l_linestatus"]
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__nulls"),
            F.count_distinct(c).alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    wide = li.agg(*aggs)
    out = None
    for c in cols:
        row = wide.select(
            F.lit(c).alias("col_name"),
            F.col("n_rows"),
            F.col(f"{c}__nulls").alias("n_nulls"),
            F.col(f"{c}__distinct").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_val"),
            F.col(f"{c}__max").alias("max_val"),
        )
        out = row if out is None else out.unionByName(row)
    return out


@query(
    "unpivot_melt",
    oracle="""
    SELECT l_orderkey, l_linenumber, metric, CAST(val AS DOUBLE) AS val
    FROM (
      SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
      FROM lineitem WHERE l_orderkey < 1000
    )
    UNPIVOT (val FOR metric IN (l_quantity, l_extendedprice, l_discount))
    """,
)
def q_unpivot_melt(spark, sf_dir):
    # Wide->long unpivot (melt) with Spark's native unpivot operator —
    # the inverse of agg_pivot.  A pure Expand node: no shuffle, row
    # count multiplies by the measure count at the scan, column pruning
    # still reaches the parquet reader.
    li = load_tables(spark, sf_dir)["lineitem"]
    return (
        li.filter(F.col("l_orderkey") < 1000)
        .unpivot(
            ids=["l_orderkey", "l_linenumber"],
            values=["l_quantity", "l_extendedprice", "l_discount"],
            variableColumnName="metric",
            valueColumnName="val",
        )
        .withColumn("val", F.col("val").cast("double"))
    )


@query(
    "events_rfm_segments",
    oracle="""
    WITH base AS (
      SELECT user_id,
             epoch_us(max(ts)) AS recency_us,
             count(*) AS frequency,
             CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS monetary
      FROM events GROUP BY user_id
    )
    SELECT user_id, recency_us, frequency, monetary,
           CAST(ntile(5) OVER (ORDER BY recency_us DESC, user_id) AS BIGINT) AS r_score,
           CAST(ntile(5) OVER (ORDER BY frequency DESC, user_id) AS BIGINT) AS f_score,
           CAST(ntile(5) OVER (ORDER BY monetary DESC, user_id) AS BIGINT) AS m_score
    FROM base
    """,
)
def q_events_rfm_segments(spark, sf_dir):
    # RFM segmentation: per-user recency/frequency/monetary rollup, then
    # quintile scores (1 = best) — the classic CRM/product segmentation.
    # Tie-break on user_id makes the quintile boundaries deterministic and
    # oracle-checkable.
    #
    # Scale path (VERDICT r2 item 3): NO unpartitioned window — each
    # metric's exact global row number comes from a range-repartitioned
    # partitioned window plus cumulative partition-count offsets
    # (operators/ranking.py), and exact ntile arithmetic converts it to
    # the identical quintile the ANSI ntile oracle computes.  At 10^9
    # users that is three range shuffles + three equi-joins, all parallel.
    from pulsar_ingestion_spark.operators.ranking import (
        global_row_number,
        ntile_from_row_number,
    )

    ev = load_tables(spark, sf_dir)["events"]  # no fan_out (r13)
    base = ev.groupBy("user_id").agg(
        F.unix_micros(F.max("ts")).alias("recency_us"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("monetary"),
    ).persist()
    out = base
    for metric, score in (
        ("recency_us", "r_score"),
        ("frequency", "f_score"),
        ("monetary", "m_score"),
    ):
        ranked, n = global_row_number(base, [F.desc(metric), F.asc("user_id")],
                                      bucket_col=F.col(metric), bucket_desc=True)
        scores = ranked.select(
            "user_id", ntile_from_row_number(F.col("_rn"), n, 5).alias(score)
        )
        out = out.join(scores, "user_id")
    return out.select(
        "user_id", "recency_us", "frequency", "monetary",
        "r_score", "f_score", "m_score",
    )


_ANOMALY_ORACLE = """
WITH s AS (
  SELECT user_id,
         count(value) AS n,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sxx
  FROM events GROUP BY user_id
), z AS (
  SELECT e.event_id, e.user_id, e.value,
         round((e.value - s.sx / s.n)
               / sqrt((s.sxx - s.sx * s.sx / s.n) / (s.n - 1)), 6) AS zscore
  FROM events e JOIN s ON e.user_id = s.user_id
  WHERE s.n >= 2 AND (s.sxx - s.sx * s.sx / s.n) / (s.n - 1) > 0
)
SELECT event_id, user_id, value, zscore FROM z WHERE abs(zscore) >= 2
"""


@query("events_anomaly_zscore", oracle=_ANOMALY_ORACLE)
def q_events_anomaly_zscore(spark, sf_dir):
    # Per-user z-score outliers (|z| >= 2): the metric-anomaly primitive.
    # Mean/std from DECIMAL sum / sum-of-squares (the agg_variance_stddev
    # parity trick — float running accumulators are summation-order
    # dependent); z rounded to 6 BEFORE thresholding so membership is
    # cross-engine stable.  Scale shape: one partial-agg shuffle for the
    # per-user stats + one hash equi-join back to the stream.
    ev = load_tables(spark, sf_dir)["events"]  # no fan_out (r13)
    vdec = F.col("value").cast("decimal(18,6)")
    s = ev.groupBy("user_id").agg(
        F.count("value").alias("n"),
        F.sum(vdec).cast("double").alias("sx"),
        F.sum(vdec * vdec).cast("double").alias("sxx"),
    )
    var = (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")) / (F.col("n") - 1)
    z = F.round((F.col("value") - F.col("sx") / F.col("n")) / F.sqrt(var), 6)
    return (
        ev.join(s, "user_id")
        .filter((F.col("n") >= 2) & (var > 0))
        .withColumn("zscore", z)
        .filter(F.abs(F.col("zscore")) >= 2)
        .select("event_id", "user_id", "value", "zscore")
    )


# ---------------------------------------------------------------------------
# Markov transitions, attribution, dwell-time distribution

_MARKOV_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type AS cur,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
), pairs AS (
  SELECT prev, cur, count(*) AS cnt FROM seq WHERE prev IS NOT NULL
  GROUP BY prev, cur
), tot AS (
  SELECT prev, CAST(SUM(cnt) AS BIGINT) AS row_total FROM pairs GROUP BY prev
)
SELECT p.prev, p.cur, p.cnt,
       round(CAST(p.cnt AS DOUBLE) / t.row_total, 6) AS prob
FROM pairs p JOIN tot t ON p.prev = t.prev
"""


@query("events_markov_transitions", oracle=_MARKOV_ORACLE)
def q_events_markov_transitions(spark, sf_dir):
    """First-order Markov transition matrix of the event stream: count of
    (prev_type → cur_type) steps per user journey, normalized to row
    probabilities.  One user-key window for lag, one shuffle on the
    25-cell pair key (partial aggs collapse map-side); the normalizer
    join is over the ≤|types| row-total table — broadcast.  The output
    is model-sized regardless of input scale."""
    ev = load_tables(spark, sf_dir)["events"]  # no fan_out (r13)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("cur"), F.lag("event_type").over(w).alias("prev")
    ).filter(F.col("prev").isNotNull())
    pairs = seq.groupBy("prev", "cur").agg(F.count("*").alias("cnt"))
    tot = pairs.groupBy("prev").agg(F.sum("cnt").cast("bigint").alias("row_total"))
    return pairs.join(F.broadcast(tot), "prev").select(
        "prev", "cur", "cnt",
        F.round(F.col("cnt").cast("double") / F.col("row_total"), 6).alias("prob"),
    )


_ATTRIBUTION_ORACLE = """
WITH touched AS (
  SELECT user_id, event_id, ts, event_type,
         last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
           OVER w AS touch_type,
         last_value(CASE WHEN event_type <> 'purchase' THEN ts END IGNORE NULLS)
           OVER w AS touch_ts
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT user_id, event_id, epoch_us(ts) AS purchase_us, touch_type,
       CASE WHEN touch_ts IS NULL THEN NULL
            ELSE epoch_ms(ts) - epoch_ms(touch_ts) END AS ms_since_touch
FROM touched WHERE event_type = 'purchase'
"""


@query("events_attribution_last_touch", oracle=_ATTRIBUTION_ORACLE)
def q_events_attribution_last_touch(spark, sf_dir):
    """Last-touch attribution: for every purchase, the most recent prior
    non-purchase event of the same user (type + recency).  One window
    pass with an IGNORE-NULLS last_value over the preceding frame — no
    self-join, no per-row scan-back; state per user is one value, so the
    shape holds on unbounded journey lengths."""
    ev = load_tables(spark, sf_dir)["events"]  # no fan_out (r13)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    not_purchase = F.col("event_type") != "purchase"
    touched = ev.select(
        "user_id", "event_id", "ts", "event_type",
        F.last(F.when(not_purchase, F.col("event_type")), ignorenulls=True)
        .over(w).alias("touch_type"),
        F.last(F.when(not_purchase, F.col("ts")), ignorenulls=True)
        .over(w).alias("touch_ts"),
    )
    return touched.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id",
        F.unix_micros("ts").alias("purchase_us"),
        "touch_type",
        F.when(
            F.col("touch_ts").isNull(), None
        ).otherwise(F.unix_millis("ts") - F.unix_millis("touch_ts")).alias("ms_since_touch"),
    )


_DWELL_ORACLE = """
WITH gaps AS (
  SELECT event_type,
         epoch_ms(ts) - lag(epoch_ms(ts))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_ms
  FROM events
)
SELECT event_type, count(*) AS n_gaps,
       round(CAST(quantile_cont(gap_ms, 0.5) AS DOUBLE), 4) AS p50_ms,
       round(CAST(quantile_cont(gap_ms, 0.9) AS DOUBLE), 4) AS p90_ms,
       CAST(max(gap_ms) AS BIGINT) AS max_ms
FROM gaps WHERE gap_ms IS NOT NULL
GROUP BY event_type
"""


@query("events_dwell_percentiles", oracle=_DWELL_ORACLE)
def q_events_dwell_percentiles(spark, sf_dir):
    """Inter-event dwell-time distribution per landing event type —
    median/p90/max of the gap to the previous user event.  The gap is a
    user-key window lag; percentiles are exact interpolated (matching
    quantile_cont, rounded to dodge interpolation ULPs — the scale path
    swaps in approx_percentile, same plan shape)."""
    ev = load_tables(spark, sf_dir)["events"]  # no fan_out (r13)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "event_type",
        (F.unix_millis("ts") - F.unix_millis(F.lag("ts").over(w))).alias("gap_ms"),
    ).filter(F.col("gap_ms").isNotNull())
    return gaps.groupBy("event_type").agg(
        F.count("*").alias("n_gaps"),
        F.round(F.expr("percentile(gap_ms, 0.5)"), 4).alias("p50_ms"),
        F.round(F.expr("percentile(gap_ms, 0.9)"), 4).alias("p90_ms"),
        F.max("gap_ms").cast("bigint").alias("max_ms"),
    )


_LTV_ORACLE = """
WITH ltv AS (
  SELECT user_id,
         CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS user_ltv
  FROM events WHERE event_type = 'purchase'
  GROUP BY user_id
)
SELECT count(*) AS n_buyers,
       round(CAST(quantile_cont(user_ltv, 0.5) AS DOUBLE), 4) AS p50_ltv,
       round(CAST(quantile_cont(user_ltv, 0.9) AS DOUBLE), 4) AS p90_ltv,
       round(CAST(quantile_cont(user_ltv, 0.99) AS DOUBLE), 4) AS p99_ltv,
       round(CAST(SUM(CAST(user_ltv AS DECIMAL(18,4))) AS DOUBLE), 4) AS total_ltv
FROM ltv
"""


@query("events_ltv_percentiles", oracle=_LTV_ORACLE)
def q_events_ltv_percentiles(spark, sf_dir):
    """Lifetime-value distribution of the buyer population: per-user
    purchase totals (decimal partial agg, one shuffle on user_id), then
    exact interpolated percentiles over the user-sized LTV table.  At
    100 TB the percentile input is |users| rows, not |events| — and the
    scale path swaps percentile → approx_percentile on the same plan."""
    ev = load_tables(spark, sf_dir)["events"]  # no fan_out (r13)
    ltv = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("user_ltv"))
    )
    return ltv.agg(
        F.count("*").alias("n_buyers"),
        F.round(F.expr("percentile(user_ltv, 0.5)"), 4).alias("p50_ltv"),
        F.round(F.expr("percentile(user_ltv, 0.9)"), 4).alias("p90_ltv"),
        F.round(F.expr("percentile(user_ltv, 0.99)"), 4).alias("p99_ltv"),
        F.round(F.sum(F.col("user_ltv").cast("decimal(18,4)")).cast("double"), 4)
        .alias("total_ltv"),
    )


_STREAKS_ORACLE = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day FROM events
), anchored AS (
  SELECT user_id, day,
         day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day) AS INTEGER)
           AS anchor
  FROM days
), islands AS (
  SELECT user_id, anchor, count(*) AS len
  FROM anchored GROUP BY user_id, anchor
)
SELECT user_id,
       CAST(SUM(len) AS BIGINT) AS active_days,
       CAST(max(len) AS BIGINT) AS longest_streak,
       count(*) AS n_streaks
FROM islands GROUP BY user_id
"""


@query("win_streaks", oracle=_STREAKS_ORACLE)
def q_win_streaks(spark, sf_dir):
    """Consecutive-day activity streaks per user (gaps-and-islands):
    distinct active days, anchor = day − row_number (constant within a
    consecutive run), island length per anchor — the classic streak
    metric ("longest run of active days").  Everything after the
    distinct-days reduce is user-partitioned: one window pass + two
    user-key aggs, state bounded by active days per user."""
    ev = load_tables(spark, sf_dir)["events"]  # no fan_out (r13)
    days = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    anchored = days.withColumn(
        "anchor", F.date_sub(F.col("day"), F.row_number().over(w))
    )
    islands = anchored.groupBy("user_id", "anchor").agg(F.count("*").alias("len"))
    return islands.groupBy("user_id").agg(
        F.sum("len").cast("bigint").alias("active_days"),
        F.max("len").cast("bigint").alias("longest_streak"),
        F.count("*").alias("n_streaks"),
    )


_PARETO_ORACLE = """
WITH per_user AS (
  SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id
), ranked AS (
  SELECT user_id, cnt,
         CAST(ntile(10) OVER (ORDER BY cnt DESC, user_id) AS BIGINT) AS decile
  FROM per_user
)
SELECT decile,
       count(*) AS users,
       CAST(SUM(cnt) AS BIGINT) AS events,
       round(CAST(SUM(cnt) AS DOUBLE) / (SELECT SUM(cnt) FROM per_user), 6) AS share
FROM ranked GROUP BY decile
"""


@query("events_pareto_share", oracle=_PARETO_ORACLE)
def q_events_pareto_share(spark, sf_dir):
    """Activity concentration (Pareto/Lorenz) by user decile: what share
    of all events the top 10%, 20%, … of users generate.  The decile
    comes from the distributed exact-ranking operator
    (`operators/ranking.py` — range repartition + partitioned window +
    offset arithmetic; NO unpartitioned window), matching the ANSI
    ntile(10) oracle exactly; share is integer sums divided once."""
    from pulsar_ingestion_spark.operators.ranking import (
        global_row_number,
        ntile_from_row_number,
    )

    ev = load_tables(spark, sf_dir)["events"]  # no fan_out (r13)
    per_user = ev.groupBy("user_id").agg(F.count("*").alias("cnt")).persist()
    ranked, n = global_row_number(per_user, [F.desc("cnt"), F.asc("user_id")],
                                  bucket_col=F.col("cnt"), bucket_desc=True)
    total = per_user.agg(F.sum("cnt").cast("bigint").alias("tot"))
    deciled = ranked.select(
        "cnt", ntile_from_row_number(F.col("_rn"), n, 10).alias("decile")
    )
    return (
        deciled.groupBy("decile")
        .agg(F.count("*").alias("users"), F.sum("cnt").cast("bigint").alias("events"))
        .crossJoin(F.broadcast(total))
        .select(
            "decile", "users", "events",
            F.round(F.col("events").cast("double") / F.col("tot"), 6).alias("share"),
        )
    )


# ---------------------------------------------------------------------------
# Round 5b: attribution II + conversion latency — the remaining everyday
# journey questions (position-based credit splitting and signup→purchase
# latency) on the same one-window-pass discipline as the family above.
# ---------------------------------------------------------------------------

_ATTRIB_POSITION_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
), fp AS (
  SELECT user_id, min(rn) AS fp_rn FROM seq
  WHERE event_type = 'purchase' GROUP BY user_id
), touches AS (
  SELECT s.user_id, s.event_type,
         row_number() OVER (PARTITION BY s.user_id ORDER BY s.rn) AS pos,
         count(*)     OVER (PARTITION BY s.user_id) AS n
  FROM seq s JOIN fp ON s.user_id = fp.user_id
  WHERE s.rn < fp.fp_rn AND s.event_type <> 'purchase'
)
SELECT event_type AS channel,
       count(*) AS touch_cnt,
       round(SUM(CASE WHEN n = 1 THEN 1.0
                      WHEN pos = 1 OR pos = n THEN (CASE WHEN n = 2 THEN 0.5 ELSE 0.4 END)
                      ELSE 0.2 / (n - 2) END), 6) AS credit
FROM touches
GROUP BY event_type
"""


@query("events_attribution_position", oracle=_ATTRIB_POSITION_ORACLE)
def q_events_attribution_position(spark, sf_dir):
    """Position-based (U-shaped) attribution: the touches preceding each
    user's FIRST purchase share the conversion credit 40/20/40 — first
    touch 0.4, last touch 0.4, the middle splits 0.2 evenly (degenerate
    journeys: one touch takes 1.0, two touches 0.5 each).  Two user-key
    window passes (journey sequencing, then touch position/count) and one
    broadcast-joinable first-purchase marker — no self-join of the fact
    against itself, so state per user stays O(1) at any journey length.
    Credit sums are simple dyadic rationals plus 0.2/(n-2) computed with
    the identical division on both engines, rounded at 6."""
    ev = load_tables(spark, sf_dir)["events"]  # no fan_out (r13)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select("user_id", "event_type", F.row_number().over(w).alias("rn"))
    fp = (
        seq.filter(F.col("event_type") == "purchase")
        .groupBy(F.col("user_id").alias("fp_user"))
        .agg(F.min("rn").alias("fp_rn"))
    )
    touches = (
        seq.join(fp, (seq["user_id"] == fp["fp_user"]) & (seq["rn"] < fp["fp_rn"]))
        .filter(F.col("event_type") != "purchase")
        .select(
            "user_id", "event_type",
            F.row_number().over(Window.partitionBy("user_id").orderBy("rn")).alias("pos"),
            F.count("*").over(Window.partitionBy("user_id")).alias("n"),
        )
    )
    credit = (
        F.when(F.col("n") == 1, F.lit(1.0))
        .when(
            (F.col("pos") == 1) | (F.col("pos") == F.col("n")),
            F.when(F.col("n") == 2, 0.5).otherwise(0.4),
        )
        .otherwise(F.lit(0.2) / (F.col("n") - 2))
    )
    return touches.groupBy(F.col("event_type").alias("channel")).agg(
        F.count("*").alias("touch_cnt"),
        F.round(F.sum(credit), 6).alias("credit"),
    )


_TIME_TO_CONVERT_ORACLE = """
WITH su AS (
  SELECT user_id, min(epoch_ms(ts)) AS signup_ms
  FROM events WHERE event_type = 'signup' GROUP BY user_id
), conv AS (
  SELECT su.user_id, su.signup_ms, min(epoch_ms(e.ts)) AS purchase_ms
  FROM su JOIN events e ON e.user_id = su.user_id
  WHERE e.event_type = 'purchase' AND epoch_ms(e.ts) >= su.signup_ms
  GROUP BY su.user_id, su.signup_ms
)
SELECT (SELECT count(*) FROM su) AS n_signups,
       count(*) AS n_converted,
       round(CAST(count(*) AS DOUBLE) / (SELECT count(*) FROM su), 6) AS conv_rate,
       round(CAST(quantile_cont(purchase_ms - signup_ms, 0.5) AS DOUBLE), 4) AS p50_ms,
       round(CAST(quantile_cont(purchase_ms - signup_ms, 0.9) AS DOUBLE), 4) AS p90_ms
FROM conv
"""


@query("events_time_to_convert", oracle=_TIME_TO_CONVERT_ORACLE)
def q_events_time_to_convert(spark, sf_dir):
    """Signup→purchase conversion latency: per signed-up user, the gap
    from first signup to the first purchase at-or-after it, summarized as
    conversion rate + exact interpolated latency percentiles.  Both
    'firsts' are min-aggregations on the user key (one shuffle each,
    map-side combined), the conversion join is user-keyed, and the
    percentile input is |converted users| rows — the funnel-latency
    report at corpus scale.  The scalar signup count joins back as a
    broadcast literal relation (decorrelated, like the TPC-H Q22 shape)."""
    ev = load_tables(spark, sf_dir)["events"]  # no fan_out (r13)
    su = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(F.unix_millis("ts")).alias("signup_ms"))
    )
    pu = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.unix_millis("ts").alias("p_ms")
    )
    conv = (
        su.join(pu, (su["user_id"] == pu["p_user"]) & (pu["p_ms"] >= su["signup_ms"]))
        .groupBy("user_id", "signup_ms")
        .agg(F.min("p_ms").alias("purchase_ms"))
    )
    n_signups = su.agg(F.count("*").alias("n_signups"))
    return (
        conv.agg(
            F.count("*").alias("n_converted"),
            F.round(F.expr("percentile(purchase_ms - signup_ms, 0.5)"), 4).alias("p50_ms"),
            F.round(F.expr("percentile(purchase_ms - signup_ms, 0.9)"), 4).alias("p90_ms"),
        )
        .crossJoin(F.broadcast(n_signups))
        .select(
            "n_signups", "n_converted",
            F.round(F.col("n_converted").cast("double") / F.col("n_signups"), 6).alias("conv_rate"),
            "p50_ms", "p90_ms",
        )
    )


_USER_OVERLAP_ORACLE = """
WITH pres AS (
  SELECT DISTINCT user_id, event_type FROM events
), sizes AS (
  SELECT event_type, count(*) AS n FROM pres GROUP BY event_type
), inter AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, count(*) AS inter_cnt
  FROM pres a JOIN pres b ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY a.event_type, b.event_type
)
SELECT i.type_a, i.type_b, sa.n AS n_a, sb.n AS n_b, i.inter_cnt,
       round(CAST(i.inter_cnt AS DOUBLE) / (sa.n + sb.n - i.inter_cnt), 6) AS jaccard
FROM inter i
JOIN sizes sa ON i.type_a = sa.event_type
JOIN sizes sb ON i.type_b = sb.event_type
"""


@query("events_user_overlap_jaccard", oracle=_USER_OVERLAP_ORACLE)
def q_events_user_overlap_jaccard(spark, sf_dir):
    """Audience overlap between event types: exact pairwise Jaccard of
    the user sets behind each type.  The fact collapses FIRST to the
    distinct (user, type) presence relation (one shuffle, ≤ |users| ×
    |types| rows), the pair join is user-keyed with a type_a < type_b
    residual (each user contributes at most C(|types|, 2) = 10 pairs —
    bounded fan-out, never user × user), and the per-type sizes join
    back broadcast.  The exact counterpart of MinHash set similarity:
    at 100 TB you run this on the presence relation, or swap in the
    registry's minhash operators when even that is too wide."""
    ev = load_tables(spark, sf_dir)["events"]  # no fan_out (r13)
    # ONE user-keyed shuffle: per-user sorted type set (collect_set partials
    # combine map-side), then pairs and per-type sizes are narrow explodes
    # of that |users|-row relation — no second shuffle of the presence
    # relation against itself.
    sets = ev.groupBy("user_id").agg(
        F.array_sort(F.collect_set("event_type")).alias("types")
    )
    sizes = (
        sets.select(F.explode("types").alias("event_type"))
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
    )
    pair_expr = (
        "flatten(transform(types, (x, i) -> "
        "transform(slice(types, i + 2, size(types)), "
        "y -> struct(x AS type_a, y AS type_b))))"
    )
    inter = (
        sets.select(F.explode(F.expr(pair_expr)).alias("p"))
        .select("p.type_a", "p.type_b")
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("inter_cnt"))
    )
    sa = sizes.select(F.col("event_type").alias("sa_type"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("event_type").alias("sb_type"), F.col("n").alias("n_b"))
    return (
        inter.join(F.broadcast(sa), F.col("type_a") == F.col("sa_type"))
        .join(F.broadcast(sb), F.col("type_b") == F.col("sb_type"))
        .select(
            "type_a", "type_b", "n_a", "n_b", "inter_cnt",
            F.round(
                F.col("inter_cnt").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("inter_cnt")),
                6,
            ).alias("jaccard"),
        )
    )


_RANGE_INTERVAL_ORACLE = """
SELECT user_id, event_id,
       count(*) OVER w AS cnt_1h,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS value_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts)
             RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW)
"""


@query("win_range_interval_1h", oracle=_RANGE_INTERVAL_ORACLE)
def q_win_range_interval_1h(spark, sf_dir):
    """Time-interval RANGE frame: per user, the rolling count and value
    sum over the trailing HOUR of event time (not the trailing N rows) —
    the rate-limit / rolling-exposure window row frames can't express.
    Ordering is integer epoch MILLISECONDS on both engines (DuckDB's
    epoch() is fractional seconds while Spark's unix_timestamp truncates
    — second-precision keys made different RANGE peer sets), so the
    frame bound (3600000) and tie-peers agree exactly; the sum stays
    DECIMAL inside the frame (exact, order-free).  One user-partitioned window pass — the same exchange the
    sessionize family pays, state bounded by the hour's event count."""
    ev = load_tables(spark, sf_dir)["events"]  # no fan_out (r13)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_millis("ts"))
        .rangeBetween(-3600000, Window.currentRow)
    )
    return ev.select(
        "user_id", "event_id",
        F.count("*").over(w).alias("cnt_1h"),
        F.sum(F.col("value").cast("decimal(18,4)")).over(w).cast("double").alias("value_1h"),
    )


_INTERVAL_OVERLAP_ORACLE = """
WITH browse AS (
  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
         min(epoch_us(ts)) AS a_start, max(epoch_us(ts)) AS a_end
  FROM events WHERE event_type IN ('view', 'click')
  GROUP BY 1, 2
), errors AS (
  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
         min(epoch_us(ts)) AS b_start, max(epoch_us(ts)) AS b_end
  FROM events WHERE event_type = 'error'
  GROUP BY 1, 2
)
SELECT a.user_id, a.day, a.a_start, a.a_end, e.b_start, e.b_end,
       (least(a.a_end, e.b_end) - greatest(a.a_start, e.b_start)) // 1000
         AS overlap_ms
FROM browse a JOIN errors e
  ON e.user_id = a.user_id AND e.day = a.day
 AND a.a_start <= e.b_end AND e.b_start <= a.a_end
"""


@query("join_interval_overlap", oracle=_INTERVAL_OVERLAP_ORACLE)
def q_join_interval_overlap(spark, sf_dir):
    """Interval×interval overlap join: per-user daily browsing sessions
    (view/click span) against error-burst intervals — which outage
    windows intersected which active sessions, and for how long.  Both
    interval relations derive from ONE scan each (min/max aggregates);
    the join is an equi-join on the (user, day) band with the overlap
    condition as a residual predicate, so it shuffles on the band key
    exactly like a plain dim join — never a cross product.  Intervals
    here are day-bounded by construction; unbounded intervals use the
    multi-band explode of join_range_banded (each interval replicated to
    the bands it covers, pairs deduped)."""
    ev = load_tables(spark, sf_dir)["events"]  # no fan_out (r13)
    day = F.expr("unix_micros(ts) div 86400000000").alias("day")
    us = F.expr("unix_micros(ts)")

    def spans(pred, s, e):
        return (
            ev.filter(pred)
            .select("user_id", day, us.alias("u"))
            .groupBy("user_id", "day")
            .agg(F.min("u").alias(s), F.max("u").alias(e))
        )

    browse = spans(F.col("event_type").isin("view", "click"), "a_start", "a_end")
    errors = spans(F.col("event_type") == "error", "b_start", "b_end")
    return (
        browse.join(errors, ["user_id", "day"])
        .filter((F.col("a_start") <= F.col("b_end")) & (F.col("b_start") <= F.col("a_end")))
        .select(
            "user_id", "day", "a_start", "a_end", "b_start", "b_end",
            F.expr("(least(a_end, b_end) - greatest(a_start, b_start)) div 1000")
            .alias("overlap_ms"),
        )
    )


_CONVERSION_ORACLE = """
WITH first_signup AS (
  SELECT user_id, min(epoch_us(ts)) AS s_us
  FROM events WHERE event_type = 'signup' GROUP BY user_id
), converted AS (
  SELECT f.user_id, f.s_us,
         min(epoch_us(e.ts)) AS p_us
  FROM first_signup f
  JOIN events e ON e.user_id = f.user_id
   AND e.event_type = 'purchase'
   AND epoch_us(e.ts) > f.s_us
   AND epoch_us(e.ts) <= f.s_us + CAST(72 AS BIGINT) * 3600 * 1000000
  GROUP BY f.user_id, f.s_us
)
SELECT s.day, count(*) AS n_signups,
       count(c.user_id) AS n_converted_72h,
       round(CAST(count(c.user_id) AS DOUBLE) / count(*), 6) AS conversion_rate
FROM (SELECT user_id, s_us, s_us // 86400000000 AS day FROM first_signup) s
LEFT JOIN converted c ON c.user_id = s.user_id
GROUP BY s.day
"""


@query("events_conversion_rate_daily", oracle=_CONVERSION_ORACLE)
def q_events_conversion_rate_daily(spark, sf_dir):
    """Windowed funnel conversion: per first-signup day, the fraction of
    users whose first subsequent purchase lands within 72 hours — the
    bounded-window form of events_time_to_convert (open-ended latency)
    and the metric growth dashboards actually plot.  Two aggregates and
    one user-key join: first-signup per user, earliest qualifying
    purchase per user (the time bound applied as a join residual so
    non-qualifying purchases never aggregate), then a day rollup.  All
    timestamps compare as integer microseconds."""
    ev = load_tables(spark, sf_dir)["events"]  # no fan_out (r13)
    us = F.expr("unix_micros(ts)")
    first_signup = (
        ev.filter(F.col("event_type") == "signup")
        .select("user_id", us.alias("u"))
        .groupBy("user_id")
        .agg(F.min("u").alias("s_us"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", us.alias("p_raw")
    )
    converted = (
        first_signup.join(purchases, "user_id")
        .filter(
            (F.col("p_raw") > F.col("s_us"))
            & (F.col("p_raw") <= F.col("s_us") + 72 * 3600 * 1_000_000)
        )
        .groupBy("user_id", "s_us")
        .agg(F.min("p_raw").alias("p_us"))
    )
    s = first_signup.select(
        "user_id", F.expr("s_us div 86400000000").alias("day")
    )
    return (
        s.join(converted.select("user_id", "p_us"), "user_id", "left")
        .groupBy("day")
        .agg(
            F.count("*").alias("n_signups"),
            F.count("p_us").alias("n_converted_72h"),
            F.round(
                F.count("p_us").cast("double") / F.count("*"), 6
            ).alias("conversion_rate"),
        )
    )


_SURVIVAL_ORACLE = """
WITH signup AS (
  SELECT user_id, min(epoch_us(ts) // 86400000000) AS s_day
  FROM events WHERE event_type = 'signup' GROUP BY user_id
), activity AS (
  SELECT DISTINCT e.user_id,
         (epoch_us(e.ts) // 86400000000) - s.s_day AS offset_days
  FROM events e JOIN signup s ON s.user_id = e.user_id
  WHERE (epoch_us(e.ts) // 86400000000) >= s.s_day
), horizon AS (
  SELECT k FROM (SELECT unnest(range(0, 8)) AS k) t
), surv AS (
  SELECT h.k,
         count(DISTINCT a.user_id) AS n_alive
  FROM horizon h
  LEFT JOIN activity a ON a.offset_days >= h.k
  GROUP BY h.k
)
SELECT k AS day_offset, n_alive,
       round(CAST(n_alive AS DOUBLE)
             / (SELECT count(*) FROM signup), 6) AS survival_rate
FROM surv
"""


@query("events_survival_curve", oracle=_SURVIVAL_ORACLE)
def q_events_survival_curve(spark, sf_dir):
    """Survival/retention curve: for each day offset k (0..7), the
    fraction of signed-up users still active at or beyond k days after
    their first signup — the Kaplan-Meier-flavoured summary product
    dashboards plot next to the weekly cohort matrix
    (events_cohort_retention).  The heavy relation collapses to one row
    per (user, max offset) before the tiny horizon join: survival at k
    is COUNT(users whose MAX activity offset ≥ k), so the range join
    touches |users| × 8 rows, never events × 8."""
    ev = load_tables(spark, sf_dir)["events"]  # no fan_out (r13)
    day = F.expr("unix_micros(ts) div 86400000000")
    signup = (
        ev.filter(F.col("event_type") == "signup")
        .select("user_id", day.alias("d"))
        .groupBy("user_id")
        .agg(F.min("d").alias("s_day"))
    )
    max_offset = (
        ev.select("user_id", day.alias("d"))
        .join(signup, "user_id")
        .filter(F.col("d") >= F.col("s_day"))
        .groupBy("user_id")
        .agg(F.max(F.col("d") - F.col("s_day")).alias("mo"))
    )
    n_signup = signup.agg(F.count("*").alias("ns"))
    horizon = spark.range(8).select(F.col("id").alias("k"))
    surv = (
        horizon.join(max_offset, F.col("mo") >= F.col("k"), "left")
        .groupBy("k")
        .agg(F.countDistinct("user_id").alias("n_alive"))
    )
    return surv.crossJoin(F.broadcast(n_signup)).select(
        F.col("k").alias("day_offset"),
        "n_alive",
        F.round(F.col("n_alive").cast("double") / F.col("ns"), 6).alias("survival_rate"),
    )


# ---------------------------------------------------------------------------
# Round 8: trailing-baseline burst detection on daily volumes.

_BURST_MIN_TRAIL = 3
_BURST_RATIO = 1.2

_BURST_ORACLE = f"""
WITH daily AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, count(*) AS cnt
  FROM events GROUP BY event_type, strftime(ts, '%Y-%m-%d')
), trail AS (
  SELECT event_type, day, cnt,
         SUM(cnt) OVER w AS trail_cnt,
         count(*) OVER w AS trail_n
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
)
SELECT event_type, day, CAST(cnt AS BIGINT) AS cnt,
       round(CAST(trail_cnt AS DOUBLE) / trail_n, 6) AS trail_avg,
       round(CAST(cnt AS DOUBLE) * trail_n / trail_cnt, 6) AS burst_ratio
FROM trail
WHERE trail_n >= {_BURST_MIN_TRAIL}
  AND CAST(cnt AS DOUBLE) * trail_n / trail_cnt > {_BURST_RATIO}
"""


@query("events_burst_days", oracle=_BURST_ORACLE)
def q_events_burst_days(spark, sf_dir):
    """Volume burst detection: days where an event type's daily count
    exceeds 1.2× its trailing 7-day average (≥3 prior days required) —
    the aggregate-level twin of events_anomaly_zscore and the batch
    contract for the streaming drift monitor's rate alarms.

    The stream collapses to (type, day) counts first (map-side
    combined), so the trailing window runs over the model-sized daily
    relation — partitioned by type, ~365 rows/key/year.  Ratios divide
    exact integers, so the burst threshold compares bitwise-identical
    doubles."""
    ev = load_tables(spark, sf_dir)["events"]  # no fan_out (r13)
    daily = ev.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = (
        Window.partitionBy("event_type").orderBy("day").rowsBetween(-7, -1)
    )
    trail = daily.select(
        "event_type", "day", "cnt",
        F.sum("cnt").over(w).alias("trail_cnt"),
        F.count(F.lit(1)).over(w).alias("trail_n"),
    )
    ratio = F.col("cnt").cast("double") * F.col("trail_n") / F.col("trail_cnt")
    return trail.filter(
        (F.col("trail_n") >= _BURST_MIN_TRAIL) & (ratio > _BURST_RATIO)
    ).select(
        "event_type", "day",
        F.col("cnt").cast("bigint").alias("cnt"),
        F.round(F.col("trail_cnt").cast("double") / F.col("trail_n"), 6)
        .alias("trail_avg"),
        F.round(ratio, 6).alias("burst_ratio"),
    )


# ---------------------------------------------------------------------------
# Round 8: EWMA control-band breach detection on daily volumes.

_EWB_ALPHA = 0.3
_EWB_BETA = 0.3
_EWB_K = 3.0

_EWMA_BAND_ORACLE = f"""
WITH RECURSIVE daily AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
         CAST(count(*) AS DOUBLE) AS cnt
  FROM events GROUP BY event_type, strftime(ts, '%Y-%m-%d')
), seq AS (
  SELECT event_type, day, cnt,
         row_number() OVER (PARTITION BY event_type ORDER BY day) AS pos,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM daily
), rec AS (
  SELECT event_type, pos, n, cnt AS l, CAST(0 AS DOUBLE) AS d,
         0 AS breaches
  FROM seq WHERE pos = 1
  UNION ALL
  SELECT s.event_type, s.pos, s.n,
         {_EWB_ALPHA} * s.cnt + {1 - _EWB_ALPHA} * r.l AS l,
         {_EWB_BETA} * abs(s.cnt - r.l) + {1 - _EWB_BETA} * r.d AS d,
         r.breaches
           + (CASE WHEN r.d > 0
                    AND abs(s.cnt - r.l) > {_EWB_K} * r.d THEN 1 ELSE 0 END)
           AS breaches
  FROM rec r JOIN seq s ON s.event_type = r.event_type AND s.pos = r.pos + 1
)
SELECT event_type, CAST(n AS BIGINT) AS n_days,
       round(l, 6) AS ewma_level, round(d, 6) AS ewma_dev,
       CAST(breaches AS BIGINT) AS n_breaches
FROM rec WHERE pos = n
"""


@query("events_anomaly_ewma_band", oracle=_EWMA_BAND_ORACLE)
def q_events_anomaly_ewma_band(spark, sf_dir):
    """EWMA control chart on daily volumes per event type: level and
    mean-absolute-deviation both exponentially smoothed; a day breaches
    when its count sits more than 3 smoothed deviations from the prior
    level (prior — the day must not defend itself).  The sequential
    sibling of events_burst_days' fixed trailing window.

    The stream collapses to (type, day) counts, then the coupled
    (level, dev, breaches) recursion folds a 3-field struct through the
    day-ordered series per type (F.aggregate ↔ recursive-CTE oracle,
    identical IEEE order — the ts_holt_smooth contract; DuckDB
    list_reduce is unusable for struct folds, see that docstring).
    Series are years-of-days sized; the fold is per-key narrow work."""
    ev = load_tables(spark, sf_dir)["events"]  # no fan_out (r13)
    daily = ev.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).cast("double").alias("cnt"))
    seq = daily.groupBy("event_type").agg(
        F.sort_array(F.collect_list(F.struct("day", "cnt"))).alias("seq")
    )
    vals = F.col("seq").getField("cnt")
    a, b, k = _EWB_ALPHA, _EWB_BETA, _EWB_K

    def merge(acc, x):
        l0, d0 = acc.getField("l"), acc.getField("d")
        breach = F.when(
            (d0 > 0) & (F.abs(x - l0) > k * d0),
            acc.getField("breaches") + 1,
        ).otherwise(acc.getField("breaches"))
        return F.struct(
            (a * x + (1 - a) * l0).alias("l"),
            (b * F.abs(x - l0) + (1 - b) * d0).alias("d"),
            breach.alias("breaches"),
        )

    st = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.struct(
            F.element_at(vals, 1).alias("l"),
            F.lit(0.0).alias("d"),
            F.lit(0).alias("breaches"),
        ),
        merge,
    )
    return seq.select(
        "event_type",
        F.size("seq").cast("bigint").alias("n_days"),
        F.round(st.getField("l"), 6).alias("ewma_level"),
        F.round(st.getField("d"), 6).alias("ewma_dev"),
        st.getField("breaches").cast("bigint").alias("n_breaches"),
    )


# ---------------------------------------------------------------------------
# Round 8: concurrent-session sweep (peak simultaneous sessions).

_CS_GAP_S = 1800

_CONCURRENCY_ORACLE = f"""
WITH ordered AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
               OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                  > {_CS_GAP_S} * 1000000 THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS sid,
         ts
  FROM ordered
), intervals AS (
  SELECT user_id, sid, min(ts) AS t0, max(ts) AS t1
  FROM sess GROUP BY user_id, sid
), bounds AS (
  SELECT user_id, sid, epoch_us(t0) AS t, 1 AS delta FROM intervals
  UNION ALL
  SELECT user_id, sid, epoch_us(t1) AS t, -1 AS delta FROM intervals
), swept AS (
  SELECT delta,
         SUM(delta) OVER (ORDER BY t, delta DESC, user_id, sid
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS depth
  FROM bounds
)
SELECT CAST((SELECT count(*) FROM intervals) AS BIGINT) AS n_sessions,
       CAST(max(depth) AS BIGINT) AS peak_concurrency,
       round(CAST(SUM(CASE WHEN delta = 1 THEN depth ELSE 0 END) AS DOUBLE)
             / SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END), 6)
         AS avg_start_concurrency
FROM swept
"""


@query("events_concurrency_sweep", oracle=_CONCURRENCY_ORACLE)
def q_events_concurrency_sweep(spark, sf_dir):
    """Peak simultaneous sessions: sessionize per user (the >30 min
    silence rule of events_sessionize), then sweep all session
    [start, end] intervals to find the maximum and the average-at-start
    overlap depth — the capacity number a session-store or
    stateful-stream operator is sized by.

    The sweep is the clustering-depth plan at DATA scale: 2 boundary
    rows per session, running-summed via ``keyed_running_sums``
    (range-partitioned — a global ORDER BY window would funnel every
    boundary through one task).  Boundary order is (time,
    starts-before-ends, user, session), a total order, so depth is
    exact on both engines."""
    from pulsar_ingestion_spark.operators.ranking import keyed_running_sums

    ev = load_tables(spark, sf_dir)["events"]  # no fan_out (r13)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    is_new = F.when(
        prev.isNull()
        | (F.unix_micros("ts") - F.unix_micros(prev) > _CS_GAP_S * 1_000_000),
        1,
    ).otherwise(0)
    sess = ev.select("user_id", "ts", "event_id").withColumn(
        "sid",
        F.sum(is_new).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    intervals = sess.groupBy("user_id", "sid").agg(
        F.min("ts").alias("t0"), F.max("ts").alias("t1")
    ).persist()
    bounds = intervals.select(
        "user_id", "sid", F.unix_micros("t0").alias("t"), F.lit(1).alias("delta")
    ).unionAll(
        intervals.select(
            "user_id", "sid", F.unix_micros("t1").alias("t"),
            F.lit(-1).alias("delta"),
        )
    ).withColumn("k", F.lit(1))
    swept, _ = keyed_running_sums(
        bounds, ["k"],
        [F.col("t"), (-F.col("delta")).asc(), F.col("user_id"), F.col("sid")],
        ["delta"],
    )
    ns = intervals.agg(F.count(F.lit(1)).cast("bigint").alias("n_sessions"))
    agg = swept.agg(
        F.max("cum_delta").cast("bigint").alias("peak_concurrency"),
        F.round(
            F.sum(F.when(F.col("delta") == 1, F.col("cum_delta")).otherwise(0))
            .cast("double")
            / F.sum(F.when(F.col("delta") == 1, 1).otherwise(0)), 6
        ).alias("avg_start_concurrency"),
    )
    return ns.crossJoin(agg)


# ---------------------------------------------------------------------------
# Round 8: DAU / WAU stickiness.

_DAU_WAU_ORACLE = """
WITH days AS (
  SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS day FROM events
), active AS (
  SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS day, user_id FROM events
), dau AS (
  SELECT day, count(*) AS dau FROM active GROUP BY day
), wau AS (
  SELECT d.day, count(DISTINCT a.user_id) AS wau
  FROM days d JOIN active a
    ON a.day <= d.day
   AND a.day >= strftime(CAST(d.day AS DATE) - INTERVAL 6 DAY, '%Y-%m-%d')
  GROUP BY d.day
)
SELECT d.day, CAST(d.dau AS BIGINT) AS dau, CAST(w.wau AS BIGINT) AS wau,
       round(CAST(d.dau AS DOUBLE) / w.wau, 6) AS stickiness
FROM dau d JOIN wau w ON w.day = d.day
"""


@query("events_dau_wau", oracle=_DAU_WAU_ORACLE)
def q_events_dau_wau(spark, sf_dir):
    """DAU/WAU stickiness per day: daily actives over trailing-7-day
    actives — the engagement ratio every product dashboard leads with.

    The rolling DISTINCT cannot ride a sum window; instead each
    (day, user) active pair fans out to the ≤7 future days whose
    trailing window contains it (explode of a 7-element day array —
    bounded), then one distinct-count per day.  All keys are compact
    date strings; both aggregates map-side combine."""
    ev = load_tables(spark, sf_dir)["events"]  # no fan_out (r13)
    active = ev.select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"), "user_id"
    ).distinct().persist()
    dau = active.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    days = active.select("day").distinct()
    fan = active.select(
        "user_id",
        F.explode(
            F.expr(
                "transform(sequence(0, 6),"
                " i -> date_format(date_add(CAST(day AS DATE), i), 'yyyy-MM-dd'))"
            )
        ).alias("day"),
    )
    wau = (
        fan.join(days, "day")
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    return dau.join(wau, "day").select(
        "day",
        F.col("dau").cast("bigint").alias("dau"),
        F.col("wau").cast("bigint").alias("wau"),
        F.round(F.col("dau").cast("double") / F.col("wau"), 6)
        .alias("stickiness"),
    )


# ---------------------------------------------------------------------------
# Round 11: daily bounce rate

_BOUNCE_ORACLE = """
WITH ue AS (
  SELECT user_id, epoch_us(ts) // 86400000000 AS day, count(*) AS n_ev
  FROM events GROUP BY user_id, day
)
SELECT day,
       count(*) AS active_users,
       CAST(SUM(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END) AS BIGINT) AS bounced,
       CAST(SUM(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
         AS bounce_rate
FROM ue GROUP BY day
"""


@query("events_bounce_rate", oracle=_BOUNCE_ORACLE)
def q_events_bounce_rate(spark, sf_dir):
    """Daily bounce rate: share of active users with EXACTLY one event
    that day — the engagement-floor companion to events_dau_wau.  Day
    keys are integer epoch-microsecond day indexes (epoch_us div 86400e6
    — the portable integer-time convention), so no calendar/format
    drift.  Two map-side-combinable groupBys ((user, day) then day);
    the rate is a raw quotient of exact integers (bitwise identical —
    never round a raw quotient).  At 100 TB both shuffles are
    partial-aggregated and the second input is |users|·|days| rows."""
    ev = load_tables(spark, sf_dir)["events"]  # no fan_out (r13)
    ue = (
        ev.select(
            "user_id",
            F.expr("unix_micros(ts) div 86400000000").alias("day"),
        )
        .groupBy("user_id", "day")
        .agg(F.count(F.lit(1)).alias("n_ev"))
    )
    bounced = F.sum(F.when(F.col("n_ev") == 1, 1).otherwise(0))
    return ue.groupBy("day").agg(
        F.count(F.lit(1)).alias("active_users"),
        bounced.cast("bigint").alias("bounced"),
        (bounced.cast("double") / F.count(F.lit(1))).alias("bounce_rate"),
    )


# ---------------------------------------------------------------------------
# Round 11 session 5: dow x hour seasonal grid — the weekly-seasonality
# profile behind capacity planning and anomaly baselines (the "is Tuesday
# 9am always this busy" table).

_SEASONAL_ORACLE = """
WITH g AS (
  SELECT (epoch_us(ts) // 86400000000 + 4) % 7 AS dow,
         (epoch_us(ts) // 3600000000) % 24 AS hr,
         user_id, value
  FROM events
), cell AS (
  SELECT dow, hr, count(*) AS n_events, count(DISTINCT user_id) AS n_users,
         CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_value
  FROM g GROUP BY dow, hr
), tot AS (SELECT CAST(SUM(n_events) AS BIGINT) AS tot FROM cell)
SELECT dow, hr, n_events, n_users, avg_value,
       CAST(n_events AS DOUBLE) / tot AS share,
       CAST(n_events * 168 AS DOUBLE) / tot AS intensity
FROM cell, tot
"""


@query("events_seasonal_dow_hour", oracle=_SEASONAL_ORACLE)
def q_events_seasonal_dow_hour(spark, sf_dir):
    """Day-of-week x hour-of-day seasonal grid: per-cell event count,
    distinct users, decimal-exact mean value, share of total traffic and
    the uniform-baseline intensity ratio (n_cell * 168 / n_total — 1.0
    means the cell carries exactly its uniform share).  Calendar parts
    from pure epoch-microsecond integer arithmetic ((day+4) % 7 with
    Sunday=0 — 1970-01-01 was a Thursday — and hour = (us div 3600e6) %
    24), so no engine calendar/timezone functions are involved.  One
    map-side-combinable groupBy collapses to <= 168 cells; the
    normalizer is a 1-row aggregate broadcast.  Shares/intensities are
    raw quotients of exact integers (never round a raw quotient)."""
    ev = load_tables(spark, sf_dir)["events"]  # no fan_out (r13)
    dow = ((F.expr("unix_micros(ts) div 86400000000") + 4) % 7).alias("dow")
    hr = (F.expr("unix_micros(ts) div 3600000000") % 24).alias("hr")
    cell = (
        ev.select(dow, hr, "user_id", "value")
        .groupBy("dow", "hr")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            (F.sum(F.col("value").cast("decimal(18,4)")).cast("double")
             / F.count(F.lit(1))).alias("avg_value"),
        )
    )
    tot = cell.agg(F.sum("n_events").cast("bigint").alias("tot"))
    return cell.crossJoin(F.broadcast(tot)).select(
        "dow", "hr", "n_events", "n_users", "avg_value",
        (F.col("n_events").cast("double") / F.col("tot")).alias("share"),
        ((F.col("n_events") * 168).cast("double") / F.col("tot")).alias("intensity"),
    )


# ---------------------------------------------------------------------------
# Standardized residuals of the dow x hour grid against the
# independence model — the anomaly companion of events_seasonal_dow_hour
# ("Tuesday 9am is busy because Tuesdays are busy AND 9am is busy — or
# is the CELL itself anomalous?").

_SEASONAL_RESID_ORACLE = """
WITH g AS (
  SELECT (epoch_us(ts) // 86400000000 + 4) % 7 AS dow,
         (epoch_us(ts) // 3600000000) % 24 AS hr
  FROM events
), cell AS (
  SELECT dow, hr, CAST(count(*) AS BIGINT) AS o FROM g GROUP BY dow, hr
), rm AS (
  SELECT dow, CAST(SUM(o) AS BIGINT) AS rd FROM cell GROUP BY dow
), cm AS (
  SELECT hr, CAST(SUM(o) AS BIGINT) AS ch FROM cell GROUP BY hr
), tot AS (
  SELECT CAST(SUM(o) AS BIGINT) AS n FROM cell
)
SELECT cell.dow, cell.hr, o AS observed,
       CAST(rd AS DOUBLE) * ch / n AS expected,
       (o - CAST(rd AS DOUBLE) * ch / n)
         / sqrt(CAST(rd AS DOUBLE) * ch / n) AS std_residual
FROM cell JOIN rm ON cell.dow = rm.dow
          JOIN cm ON cell.hr = cm.hr, tot
"""


@query("events_seasonal_residuals", oracle=_SEASONAL_RESID_ORACLE)
def q_events_seasonal_residuals(spark, sf_dir):
    """Pearson standardized residuals of the dow x hour cell counts
    against the independence model (expected = row_margin x col_margin
    / total): |z| >> 2 flags cells busier/quieter than their day and
    hour margins jointly explain.  One map-side-combinable collapse to
    <= 168 cells; margins and the total are aggregates OF the cell
    relation (aggregate the collapse, not the source — SCALE.md 6x),
    broadcast back.  expected is a fixed chain (rd_double * ch /
    n — two exact-integer operands per step); sqrt is IEEE-correctly-
    rounded (the v16 fuzzer rule), so residuals are bit-identical."""
    ev = load_tables(spark, sf_dir)["events"]  # no fan_out (r13)
    g = ev.select(
        ((F.expr("unix_micros(ts) div 86400000000") + 4) % 7).alias("dow"),
        (F.expr("unix_micros(ts) div 3600000000") % 24).alias("hr"),
    )
    cell = g.groupBy("dow", "hr").agg(F.count(F.lit(1)).cast("bigint").alias("o"))
    rm = cell.groupBy("dow").agg(F.sum("o").cast("bigint").alias("rd"))
    cm = cell.groupBy("hr").agg(F.sum("o").cast("bigint").alias("ch"))
    tot = cell.agg(F.sum("o").cast("bigint").alias("n"))
    e = F.col("rd").cast("double") * F.col("ch") / F.col("n")
    return (
        cell.join(F.broadcast(rm), "dow")
        .join(F.broadcast(cm), "hr")
        .crossJoin(F.broadcast(tot))
        .select(
            "dow", "hr",
            F.col("o").alias("observed"),
            e.alias("expected"),
            ((F.col("o") - e) / F.sqrt(e)).alias("std_residual"),
        )
    )


# ---------------------------------------------------------------------------
# Entropy rate of the event-type sequence — how predictable is the NEXT
# event given the current one (the information-theoretic summary of the
# Markov transition structure behind events_markov_transitions /
# graph_pagerank).

_ENTROPY_RATE_ORACLE = """
WITH seq AS (
  SELECT event_type AS cur,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
), cells AS (
  SELECT prev, cur, CAST(count(*) AS BIGINT) AS c
  FROM seq WHERE prev IS NOT NULL GROUP BY prev, cur
), rowm AS (
  SELECT prev, CAST(SUM(c) AS BIGINT) AS ci FROM cells GROUP BY prev
), colm AS (
  SELECT cur, CAST(SUM(c) AS BIGINT) AS cj FROM cells GROUP BY cur
), tot AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n FROM cells
), cond_terms AS (
  SELECT CAST(round(
           (CAST(c AS DOUBLE) / n) * log2(CAST(c AS DOUBLE) / ci), 8)
           AS DECIMAL(18,8)) AS term
  FROM cells JOIN rowm ON cells.prev = rowm.prev, tot
), marg_terms AS (
  SELECT CAST(round(
           (CAST(cj AS DOUBLE) / n) * log2(CAST(cj AS DOUBLE) / n), 8)
           AS DECIMAL(18,8)) AS term
  FROM colm, tot
), h AS (
  SELECT (SELECT round(-CAST(SUM(term) AS DOUBLE), 6) FROM cond_terms) AS h_cond,
         (SELECT round(-CAST(SUM(term) AS DOUBLE), 6) FROM marg_terms) AS h_next,
         (SELECT n FROM tot) AS n_transitions
)
SELECT n_transitions, h_cond, h_next,
       round(h_next - h_cond, 6) AS info_rate
FROM h
"""


@query("events_entropy_rate", oracle=_ENTROPY_RATE_ORACLE)
def q_events_entropy_rate(spark, sf_dir):
    """Entropy rate of the per-user event-type sequence: conditional
    entropy H(next|cur) = -SUM (c_ij/N) log2(c_ij/c_i.), the marginal
    next-event entropy H(next), and their difference (the mutual
    information of consecutive events — bits of predictability the
    current event type buys).  One lag-window scan collapses the stream
    to <= |types|^2 transition cells (the graph_pagerank/graph_hits
    edge relation); margins are aggregates OF the cell relation joined
    back broadcast (no unpartitioned windows, no second scan).  log2
    terms follow the ml_mutual_info libm discipline: rounded to 8 dp
    and summed in DECIMAL (order-independent)."""
    from pyspark.sql import Window as W

    ev = load_tables(spark, sf_dir)["events"]  # no fan_out (r13)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("cur"),
        F.lag("event_type").over(w).alias("prev"),
    ).filter(F.col("prev").isNotNull())
    cells = seq.groupBy("prev", "cur").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    rowm = cells.groupBy("prev").agg(F.sum("c").cast("bigint").alias("ci"))
    colm = cells.groupBy("cur").agg(F.sum("c").cast("bigint").alias("cj"))
    tot = cells.agg(F.sum("c").cast("bigint").alias("n"))
    cond = (
        cells.join(F.broadcast(rowm), "prev")
        .crossJoin(F.broadcast(tot))
        .select(
            F.round(
                (F.col("c").cast("double") / F.col("n"))
                * F.log2(F.col("c").cast("double") / F.col("ci")),
                8,
            ).cast("decimal(18,8)").alias("term")
        )
        .agg(F.round(-F.sum("term").cast("double"), 6).alias("h_cond"))
    )
    marg = (
        colm.crossJoin(F.broadcast(tot))
        .select(
            F.round(
                (F.col("cj").cast("double") / F.col("n"))
                * F.log2(F.col("cj").cast("double") / F.col("n")),
                8,
            ).cast("decimal(18,8)").alias("term")
        )
        .agg(F.round(-F.sum("term").cast("double"), 6).alias("h_next"))
    )
    return (
        tot.select(F.col("n").alias("n_transitions"))
        .crossJoin(F.broadcast(cond))
        .crossJoin(F.broadcast(marg))
        .select(
            "n_transitions", "h_cond", "h_next",
            F.round(F.col("h_next") - F.col("h_cond"), 6).alias("info_rate"),
        )
    )
