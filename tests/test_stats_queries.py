"""Tests for queries_stats.py — statistical aggregates, resample/gap-fill,
stratified sampling, passage dedup, norm stats, Zipf fit.

Correctness vs the DuckDB oracle is covered by tools/selfcheck.py; these
tests pin semantics and plan shapes that the oracle compare can't see."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_corr_matches_builtin(spark):
    """The exact-moment corr must agree with Spark's double-accumulating
    corr() to well beyond the rounding precision on this data size."""
    from pulsar_ingestion_spark.queries_stats import q_agg_stats_corr

    ours = {r["l_returnflag"]: r["corr"] for r in q_agg_stats_corr(spark, SF).collect()}
    from pulsar_ingestion_spark.session import load_tables

    li = load_tables(spark, SF)["lineitem"]
    builtin = {
        r["l_returnflag"]: r["c"]
        for r in li.groupBy("l_returnflag")
        .agg(F.corr("l_quantity", "l_extendedprice").alias("c"))
        .collect()
    }
    assert set(ours) == set(builtin)
    for k in ours:
        assert abs(ours[k] - builtin[k]) < 1e-6, (k, ours[k], builtin[k])


def test_skew_kurtosis_match_builtins(spark):
    from pulsar_ingestion_spark.queries_stats import q_agg_skew_kurtosis

    ours = {r["event_type"]: (r["skewness"], r["kurtosis"])
            for r in q_agg_skew_kurtosis(spark, SF).collect()}
    from pulsar_ingestion_spark.session import load_tables

    ev = load_tables(spark, SF)["events"]
    ref = {
        r["event_type"]: (r["s"], r["k"])
        for r in ev.groupBy("event_type")
        .agg(F.skewness("value").alias("s"), F.kurtosis("value").alias("k"))
        .collect()
    }
    for k in ours:
        assert abs(ours[k][0] - ref[k][0]) < 1e-5
        assert abs(ours[k][1] - ref[k][1]) < 1e-5


def test_gapfill_grid_is_dense(spark):
    """Every event_type's bucket series must be contiguous at 900 s steps
    and cover [min, max] exactly; zero-filled buckets must exist."""
    from pulsar_ingestion_spark.queries_stats import q_ts_gapfill_15m

    out = q_ts_gapfill_15m(spark, SF)
    chk = out.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.min("bucket_s").alias("lo"),
        F.max("bucket_s").alias("hi"),
        F.sum(F.when(F.col("cnt") == 0, 1).otherwise(0)).alias("zeros"),
    ).collect()
    assert len(chk) > 0
    for r in chk:
        assert r["n"] == (r["hi"] - r["lo"]) // 900 + 1, r
    # at sf0.001 (10k events over a month) some 15-min buckets must be empty
    assert sum(r["zeros"] for r in chk) > 0


def test_stratified_sample_is_deterministic_and_stratified(spark):
    from pulsar_ingestion_spark.queries_stats import q_sample_stratified

    a = {r["doc_id"] for r in q_sample_stratified(spark, SF).collect()}
    b = {r["doc_id"] for r in q_sample_stratified(spark, SF).collect()}
    assert a == b and len(a) > 0
    # every stratum sampled at ~20% (binomial bounds, n=500 docs total)
    from pulsar_ingestion_spark.session import load_tables

    totals = {r["lang"]: r["n"] for r in load_tables(spark, SF)["documents"]
              .groupBy("lang").agg(F.count("*").alias("n")).collect()}
    sampled = {r["lang"]: r["n"] for r in q_sample_stratified(spark, SF)
               .groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, tot in totals.items():
        rate = sampled.get(lang, 0) / tot
        assert 0.05 < rate < 0.40, (lang, rate)


def test_passage_dedup_finds_known_duplicate(spark):
    """Two docs sharing an identical 15-word prefix must collide."""
    from pulsar_ingestion_spark.queries_stats import q_text_passage_dedup

    out = q_text_passage_dedup(spark, SF)
    assert out.filter(F.col("docs") > 1).count() > 0
    # every reported passage really occurs more than once
    assert out.filter(F.col("occurrences") <= 1).count() == 0


def test_zipf_slope_is_negative_and_stable(spark):
    from pulsar_ingestion_spark.queries_stats import q_text_zipf_slope

    r1 = q_text_zipf_slope(spark, SF).collect()[0]
    r2 = q_text_zipf_slope(spark, SF).collect()[0]
    assert r1["zipf_slope"] == r2["zipf_slope"]  # deterministic
    assert r1["zipf_slope"] < 0  # frequency falls with rank
    assert r1["n_tokens"] > 10


def test_moment_aggs_single_shuffle(spark):
    """The one-pass moment queries must plan exactly one Exchange
    (the group-by shuffle) — no window, no extra repartition."""
    from pulsar_ingestion_spark.queries_stats import (
        q_agg_regr_slope,
        q_agg_skew_kurtosis,
        q_agg_stats_corr,
    )

    for q in (q_agg_stats_corr, q_agg_regr_slope, q_agg_skew_kurtosis):
        plan = _plan(q(spark, SF))
        # formatted explain prints each node in the tree AND a detail
        # section — count the numbered detail headers only
        n_exchange = len(re.findall(r"\(\d+\) Exchange", plan))
        assert n_exchange <= 1, (q.__name__, plan)
        assert "Window" not in plan, (q.__name__, plan)


def test_resample_no_window_no_udf(spark):
    from pulsar_ingestion_spark.queries_stats import q_ts_resample_15m

    plan = _plan(q_ts_resample_15m(spark, SF))
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_agg_mode_deterministic_tiebreak(spark):
    from pulsar_ingestion_spark.queries_stats import q_agg_mode

    rows = q_agg_mode(spark, SF).collect()
    assert len(rows) == 3  # one mode per returnflag
    # the mode count must be the max over per-value counts
    from pulsar_ingestion_spark.session import load_tables

    li = load_tables(spark, SF)["lineitem"]
    for r in rows:
        best = (
            li.filter(F.col("l_returnflag") == r["l_returnflag"])
            .groupBy("l_quantity").count()
            .agg(F.max("count")).collect()[0][0]
        )
        assert r["mode_cnt"] == best


def test_zorder_key_interleaves_bits(spark):
    """zval must interleave: low bit of tb at position 0, low bit of ua
    at position 1."""
    from pulsar_ingestion_spark.queries_stats import q_layout_zorder_key

    rows = q_layout_zorder_key(spark, SF).limit(200).collect()
    assert rows
    for r in rows:
        assert (r["zval"] >> 0) & 1 == r["tb"] & 1
        assert (r["zval"] >> 1) & 1 == r["ua"] & 1
        assert (r["zval"] >> 2) & 1 == (r["tb"] >> 1) & 1
        # locality: close (ua, tb) pairs share high bits — structural sanity
        assert r["zval"] < (1 << 32)


def test_emb_dim_stats_finds_all_dims(spark):
    from pulsar_ingestion_spark.queries_stats import q_emb_dim_stats

    rows = q_emb_dim_stats(spark, SF).collect()
    assert len(rows) == 64
    assert all(r["variance"] >= 0 for r in rows)


def test_salted_join_matches_plain_join(spark):
    from pulsar_ingestion_spark.queries_stats import q_join_salted_skew

    out = q_join_salted_skew(spark, SF)
    assert out.count() == 1000  # every fact row exactly once (no dup, no loss)
    # spot-check one type against the straightforward computation
    from pulsar_ingestion_spark.session import load_tables

    ev = load_tables(spark, SF)["events"]
    et = ev.select("event_type").first()["event_type"]
    avg = (
        ev.filter(F.col("event_type") == et)
        .agg((F.sum(F.col("value").cast("decimal(18,4)")).cast("double") / F.count("value")))
        .collect()[0][0]
    )
    row = out.filter(F.col("event_type") == et).first()
    raw = ev.filter(F.col("event_id") == row["event_id"]).first()["value"]
    assert abs(row["deviation"] - round(raw - avg, 4)) < 1e-9


def test_multires_rollup_levels_are_consistent(spark):
    """Each coarser level's total must equal the sum of its finer rows."""
    from pulsar_ingestion_spark.queries_stats import q_ts_rollup_multires

    rows = q_ts_rollup_multires(spark, SF).collect()
    total = [r for r in rows if r["day_b"] == -1]
    assert len(total) == 1
    day_rows = [r for r in rows if r["day_b"] != -1 and r["hour_b"] == -1]
    assert sum(r["cnt"] for r in day_rows) == total[0]["cnt"]
    hour_rows = [r for r in rows if r["hour_b"] != -1 and r["q_b"] == -1]
    assert sum(r["cnt"] for r in hour_rows) == total[0]["cnt"]


def test_entropy_bounds(spark):
    """Entropy of a K-way categorical is in [0, ln K]."""
    import math

    from pulsar_ingestion_spark.queries_stats import q_agg_entropy

    rows = q_agg_entropy(spark, SF).collect()
    assert len(rows) == 8
    for r in rows:
        assert 0 <= r["entropy_nats"] <= math.log(5) + 1e-9  # 5 event types


def test_js_divergence_bounds_and_self_zero(spark):
    """JS divergence is within [0, ln 2]; identical distributions give 0."""
    import math

    from pulsar_ingestion_spark.queries_stats import q_text_js_divergence

    r = q_text_js_divergence(spark, SF).collect()[0]
    assert 0 <= r["js_divergence"] <= math.log(2) + 1e-9
    assert r["vocab"] > 10


def test_pca_power_component_aligns_with_numpy(spark):
    """After two power steps the component must (a) be unit-norm and
    (b) align with numpy's dominant right singular vector of X."""
    import numpy as np

    from pulsar_ingestion_spark.queries_stats import q_emb_pca_power
    from pulsar_ingestion_spark.session import load_tables

    rows = q_emb_pca_power(spark, SF).orderBy("dim").collect()
    v = np.array([r["component"] for r in rows])
    assert abs(np.linalg.norm(v) - 1.0) < 1e-6

    X = np.array(
        [r["embedding"] for r in load_tables(spark, SF)["embeddings"].collect()],
        dtype=np.float64,
    )
    # numpy ground truth: 2 power steps from the same uniform start
    ref = np.full(64, 0.125)
    for _ in range(2):
        ref = X.T @ (X @ ref)
        ref = ref / np.linalg.norm(ref)
    cos = abs(float(v @ ref))
    assert cos > 0.9999, cos
