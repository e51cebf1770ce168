"""Semantic invariants of the round-5c families (graph, sketches III,
warehouse II, time-series II, bigram LM) — properties the oracle hash
can't see failing for the RIGHT reason, checked at sf0.001 on the
shared session."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


def test_pagerank_mass_conserved(spark):
    """Without dangling redistribution, total rank = Σ teleport + d·(mass
    that flowed through edges) ≤ 1 and ≥ (1-d); with every node having
    out-edges it stays close to 1.  Also: every rank ≥ (1-d)/N."""
    from pulsar_ingestion_spark.queries_graph import q_graph_pagerank

    rows = q_graph_pagerank(spark, SF).collect()
    n = len(rows)
    total = sum(r["pagerank"] for r in rows)
    assert all(r["pagerank"] >= (1 - 0.85) / n - 1e-9 for r in rows)
    assert 0.15 - 1e-6 <= total <= 1.0 + 1e-6
    # all five event types participate
    assert n == 5


def test_triangle_count_matches_bruteforce(spark):
    """Degree-oriented counting equals the naive u<v<w enumeration."""
    from pulsar_ingestion_spark.queries_graph import _cooc_edges, q_graph_triangle_count
    from pulsar_ingestion_spark.session import load_tables

    got = q_graph_triangle_count(spark, SF).collect()[0]
    ev = load_tables(spark, SF)["events"]
    edges = {(r["u"], r["v"]) for r in _cooc_edges(ev).collect()}
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    nodes = sorted(adj)
    brute = sum(
        1
        for i, u in enumerate(nodes)
        for v in sorted(adj[u])
        if v > u
        for w in sorted(adj[u] & adj[v])
        if w > v
    )
    assert got["n_triangles"] == brute
    assert got["n_edges"] == len(edges)
    assert got["n_nodes"] == len(nodes)


def test_degree_stats_handshake_lemma(spark):
    """Σ degree·n_nodes = 2·|edges| (every edge contributes two degree
    endpoints)."""
    from pulsar_ingestion_spark.queries_graph import _cooc_edges, q_graph_degree_stats
    from pulsar_ingestion_spark.session import load_tables

    dist = q_graph_degree_stats(spark, SF).collect()
    ev = load_tables(spark, SF)["events"]
    n_edges = _cooc_edges(ev).count()
    assert sum(r["degree"] * r["n_nodes"] for r in dist) == 2 * n_edges


def test_kmv_membership_and_bounds(spark):
    """Sketch size ≤ k; estimates are positive; Jaccard ∈ [0,1]; and on
    this tiny fixture (15 users < plausible k regimes) the union
    estimate lands within a loose 3x band of the exact count."""
    from pulsar_ingestion_spark.queries_sketch import q_sketch_kmv_intersect

    r = q_sketch_kmv_intersect(spark, SF).collect()[0]
    assert r["sketch_size"] <= r["k"]
    assert 0.0 <= r["jaccard_est"] <= 1.0
    assert r["union_est"] > 0
    assert r["union_est"] <= 3 * r["exact_union"] + 1
    assert r["inter_est"] <= r["union_est"] + 1e-9


def test_quantile_logbins_within_relative_error(spark):
    """The bin lower bound is ≤ the true quantile and within the two-
    significant-digit relative error of it (est_lo ≤ q_true < est_lo·1.1
    + one bin step)."""
    from pulsar_ingestion_spark.queries_sketch import q_sketch_quantile_logbins
    from pulsar_ingestion_spark.session import load_tables

    rows = {r["q"]: r for r in q_sketch_quantile_logbins(spark, SF).collect()}
    orders = load_tables(spark, SF)["orders"]
    vals = sorted(v["o_totalprice"] for v in orders.select("o_totalprice").collect())
    n = len(vals)
    for q, r in rows.items():
        true_q = vals[math.ceil(q * n) - 1]
        assert r["est_lo"] <= true_q + 1e-9
        # next bin boundary: bump the two leading digits by one
        assert true_q < r["est_lo"] * 1.1 + 1e-6 or true_q - r["est_lo"] < r["est_lo"] * 0.1 + 1

def test_weighted_sample_favors_heavy_rows(spark):
    """Selected rows' mean weight exceeds the population mean weight —
    the point of weighting the priorities (hash/w shrinks as w grows)."""
    from pulsar_ingestion_spark.queries_sketch import q_sample_weighted_kmv
    from pulsar_ingestion_spark.session import load_tables

    sample = q_sample_weighted_kmv(spark, SF).agg(F.avg("value")).collect()[0][0]
    pop = (
        load_tables(spark, SF)["events"]
        .filter(F.col("value") > 0)
        .agg(F.avg("value"))
        .collect()[0][0]
    )
    assert sample > pop


def test_incremental_agg_equals_direct(spark):
    """Partial-merge == direct recompute, month by month."""
    from pulsar_ingestion_spark.queries_warehouse import q_warehouse_incremental_agg
    from pulsar_ingestion_spark.session import load_tables

    merged = {
        r["month"]: (r["order_cnt"], r["revenue"])
        for r in q_warehouse_incremental_agg(spark, SF).collect()
    }
    direct = {
        r["month"]: (r["cnt"], float(r["rev"]))
        for r in load_tables(spark, SF)["orders"]
        .groupBy(F.date_trunc("month", F.col("o_orderdate").cast("date")).alias("month"))
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("rev"),
        )
        .collect()
    }
    assert merged.keys() == direct.keys()
    for m, (cnt, rev) in direct.items():
        assert merged[m][0] == cnt
        assert abs(merged[m][1] - rev) < 1e-6


def test_changelog_compact_drops_deletes_keeps_latest(spark):
    """No compacted key's final op is D, and every surviving key carries
    its maximum version."""
    from pulsar_ingestion_spark.queries_warehouse import q_warehouse_changelog_compact
    from pulsar_ingestion_spark.session import load_tables

    out = q_warehouse_changelog_compact(spark, SF)
    assert out.filter(F.col("last_op") == "D").count() == 0
    li = load_tables(spark, SF)["lineitem"]
    maxv = {
        r["key"]: r["mv"]
        for r in li.groupBy(F.col("l_orderkey").alias("key"))
        .agg(F.max("l_linenumber").alias("mv"))
        .collect()
    }
    for r in out.collect():
        assert r["last_version"] == maxv[r["key"]]


def test_prune_stats_zone_map_is_truthful(spark):
    """can_prune ⇒ n_match = 0 (a zone map must never skip a partition
    that contains matches)."""
    from pulsar_ingestion_spark.queries_warehouse import q_warehouse_partition_prune_stats

    for r in q_warehouse_partition_prune_stats(spark, SF).collect():
        if r["can_prune"]:
            assert r["n_match"] == 0
        assert r["min_tp"] <= r["max_tp"]


def test_interp_linear_bounded_and_exact_on_observed(spark):
    """Observed buckets keep their exact value; interpolated buckets lie
    between their neighbors' values (monotone segment bound)."""
    from pulsar_ingestion_spark.queries_stats import q_ts_interp_linear

    rows = q_ts_interp_linear(spark, SF).orderBy("event_type", "bucket_s").collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for series in by_type.values():
        obs = [(i, r["val"]) for i, r in enumerate(series) if not r["interpolated"]]
        assert obs, "grid endpoints must be observed"
        assert not series[0]["interpolated"] and not series[-1]["interpolated"]
        # every interpolated point is within [min, max] of surrounding obs
        for (i1, v1), (i2, v2) in zip(obs, obs[1:]):
            lo, hi = min(v1, v2), max(v1, v2)
            for k in range(i1 + 1, i2):
                assert lo - 1e-9 <= series[k]["val"] <= hi + 1e-9


def test_theil_sen_matches_numpy_median(spark):
    """The explicit-rank median equals the python median of the same
    slope multiset."""
    from pulsar_ingestion_spark.queries_stats import q_ts_theil_sen
    from pulsar_ingestion_spark.session import load_tables

    got = {r["event_type"]: r for r in q_ts_theil_sen(spark, SF).collect()}
    ev = load_tables(spark, SF)["events"]
    daily = (
        ev.select(
            "event_type",
            F.expr("unix_micros(ts) div 86400000000").alias("x"),
            "value",
        )
        .groupBy("event_type", "x")
        .agg(
            (F.sum(F.col("value").cast("decimal(18,4)")).cast("double") / F.count("*"))
            .alias("y")
        )
        .collect()
    )
    series: dict[str, list] = {}
    for r in daily:
        series.setdefault(r["event_type"], []).append((r["x"], r["y"]))
    for t, pts in series.items():
        pts.sort()
        slopes = sorted(
            (y2 - y1) / (x2 - x1)
            for i, (x1, y1) in enumerate(pts)
            for (x2, y2) in pts[i + 1 :]
        )
        n = len(slopes)
        med = (
            slopes[n // 2]
            if n % 2
            else (slopes[n // 2 - 1] + slopes[n // 2]) / 2
        )
        assert got[t]["n_pairs"] == n
        assert abs(got[t]["theil_sen_slope"] - med) < 1e-9


def test_bigram_logprob_perplexity_sane(spark):
    """Per-bigram mean -log2 p is positive and bounded by log2(corpus
    bigram total): p(w₂|w₁) = cntb/cntp ≥ 1/N since cntp ≤ N and
    cntb ≥ 1; docs with <2 tokens are absent."""
    from pulsar_ingestion_spark.queries_llm import q_text_bigram_logprob

    out = q_text_bigram_logprob(spark, SF)
    rows = out.collect()
    assert all(r["n_bigrams"] >= 1 for r in rows)
    assert all(r["total_neg_log2p"] >= 0 for r in rows)
    corpus_bigrams = sum(r["n_bigrams"] for r in rows)
    for r in rows:
        mean_bits = r["total_neg_log2p"] / r["n_bigrams"]
        assert 0 <= mean_bits <= math.log2(corpus_bigrams) + 1e-6


def test_drift_psi_nonnegative(spark):
    """Each PSI term (p-q)·ln(p/q) is ≥ 0, so the sum is (up to term
    rounding) non-negative for every event type."""
    from pulsar_ingestion_spark.queries_quality import q_drift_psi

    rows = q_drift_psi(spark, SF).collect()
    assert len(rows) == 5
    assert all(r["psi"] >= -1e-4 for r in rows)


def test_drift_ks_bounds_and_counts(spark):
    """D ∈ [0,1]; window counts partition each type's rows."""
    from pulsar_ingestion_spark.queries_quality import q_drift_ks
    from pulsar_ingestion_spark.session import load_tables

    rows = q_drift_ks(spark, SF).collect()
    per_type = {
        r["event_type"]: r["cnt"]
        for r in load_tables(spark, SF)["events"]
        .groupBy("event_type")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    for r in rows:
        assert 0.0 <= r["ks_d"] <= 1.0
        assert r["n_a"] + r["n_b"] == per_type[r["event_type"]]


def test_drift_chi2_dof_and_sign(spark):
    from pulsar_ingestion_spark.queries_quality import q_drift_chi2

    r = q_drift_chi2(spark, SF).collect()[0]
    assert r["chi2"] >= 0
    assert r["dof"] == 4  # 5 event types × 2 windows
    assert r["n"] > 0


def test_k_anonymity_partitions_table(spark):
    """Group-size histogram covers every customer row exactly once, and
    the violates flag matches the size."""
    from pulsar_ingestion_spark.queries_quality import q_privacy_k_anonymity
    from pulsar_ingestion_spark.session import load_tables

    rows = q_privacy_k_anonymity(spark, SF).collect()
    n_customers = load_tables(spark, SF)["customer"].count()
    assert sum(r["n_rows"] for r in rows) == n_customers
    for r in rows:
        assert r["n_rows"] == r["group_size"] * r["n_groups"]
        assert r["violates_k5"] == (r["group_size"] < 5)


def test_cosine_histogram_is_linear_pair_sample(spark):
    """Bin counts sum to the number of sampled pairs (≤ n, never n²) and
    bins stay inside [-1, 1]."""
    from pulsar_ingestion_spark.queries_ml import q_emb_cosine_histogram
    from pulsar_ingestion_spark.session import load_tables

    rows = q_emb_cosine_histogram(spark, SF).collect()
    n = load_tables(spark, SF)["embeddings"].count()
    total_pairs = sum(r["n_pairs"] for r in rows)
    assert total_pairs <= n
    assert total_pairs >= n - n // 10  # only self-pairs are dropped
    for r in rows:
        assert 0 <= r["bin"] <= 19
        assert -1.0 <= r["bin_lo"] <= 0.9 + 1e-9


def test_interval_overlap_is_genuine(spark):
    """Every emitted pair genuinely overlaps (overlap_ms ≥ 0) and both
    intervals are well-formed."""
    from pulsar_ingestion_spark.queries_events import q_join_interval_overlap

    rows = q_join_interval_overlap(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["a_start"] <= r["a_end"] and r["b_start"] <= r["b_end"]
        assert r["overlap_ms"] >= 0
        lo = max(r["a_start"], r["b_start"])
        hi = min(r["a_end"], r["b_end"])
        assert r["overlap_ms"] == (hi - lo) // 1000


def test_drawdown_nonnegative_and_bounded(spark):
    """Drawdown ≥ 0 by construction (peak ≥ current) and can't exceed
    the total positive mass of the series."""
    from pulsar_ingestion_spark.queries_stats import q_win_drawdown

    rows = q_win_drawdown(spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["max_drawdown"] >= 0
        assert r["n_days"] >= 1


def test_changepoint_split_is_interior_and_maximal(spark):
    """The winning split is strictly inside the series, and its score
    matches a python recomputation of the argmax."""
    from pulsar_ingestion_spark.queries_stats import q_ts_changepoint_mean_shift
    from pulsar_ingestion_spark.session import load_tables

    got = {r["event_type"]: r for r in q_ts_changepoint_mean_shift(spark, SF).collect()}
    ev = load_tables(spark, SF)["events"]
    daily = (
        ev.groupBy("event_type", F.expr("unix_micros(ts) div 86400000000").alias("day"))
        .agg(F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("y"))
        .collect()
    )
    series: dict[str, list] = {}
    for r in daily:
        series.setdefault(r["event_type"], []).append((r["day"], r["y"]))
    for t, pts in series.items():
        pts.sort()
        days = [d for d, _ in pts]
        ys = [y for _, y in pts]
        n = len(ys)
        best = None
        for i in range(1, n):
            left = sum(ys[:i]) / i
            right = sum(ys[i:]) / (n - i)
            score = abs(left - right)
            if best is None or score > best[1] + 1e-12:
                best = (days[i - 1], score)
        assert got[t]["split_day"] == best[0]
        assert abs(got[t]["mean_shift"] - best[1]) < 1e-6
        assert days[0] <= got[t]["split_day"] < days[-1]


def test_survival_curve_monotone_nonincreasing(spark):
    from pulsar_ingestion_spark.queries_events import q_events_survival_curve

    rows = sorted(
        q_events_survival_curve(spark, SF).collect(), key=lambda r: r["day_offset"]
    )
    assert rows[0]["day_offset"] == 0
    assert rows[0]["survival_rate"] <= 1.0 + 1e-9
    for a, b in zip(rows, rows[1:]):
        assert b["n_alive"] <= a["n_alive"]


def test_ab_arms_partition_users(spark):
    """Arm sizes sum to the distinct-user count; proportions ∈ [0,1]."""
    from pulsar_ingestion_spark.queries_experiment import q_exp_ab_lift
    from pulsar_ingestion_spark.session import load_tables

    r = q_exp_ab_lift(spark, SF).collect()[0]
    n_users = (
        load_tables(spark, SF)["events"].select("user_id").distinct().count()
    )
    assert r["n_control"] + r["n_treatment"] == n_users
    assert 0 <= r["p_control"] <= 1 and 0 <= r["p_treatment"] <= 1


def test_srm_terms_consistent(spark):
    from pulsar_ingestion_spark.queries_experiment import q_exp_srm_check

    rows = q_exp_srm_check(spark, SF).collect()
    assert len(rows) == 2
    total = sum(r["n_units"] for r in rows)
    for r in rows:
        assert abs(r["expected"] - total / 2) < 1e-9
        assert r["chi2_term"] >= 0


def test_cuped_never_increases_variance(spark):
    """var_y_cuped = var_y − θ²·var_x ≤ var_y always."""
    from pulsar_ingestion_spark.queries_experiment import q_exp_cuped_adjust

    r = q_exp_cuped_adjust(spark, SF).collect()[0]
    assert r["var_y_cuped"] <= r["var_y"] + 1e-9
    assert r["var_y"] >= 0 and r["var_y_cuped"] >= 0


def test_dbscan_labels_are_true_components(spark):
    """The 8-iteration bound suffices on the fixture: cluster labels
    equal the exact connected components computed in python over the
    same core-cell adjacency."""
    from pulsar_ingestion_spark.queries_geo import q_geo_dbscan_grid
    from pulsar_ingestion_spark.session import load_tables

    got = q_geo_dbscan_grid(spark, SF).collect()
    ev = load_tables(spark, SF)["events"]
    cells = (
        ev.selectExpr(
            "CAST(floor(value / 10) AS BIGINT) AS cl",
            "CAST(floor(-value / 7) AS BIGINT) AS cn",
        )
        .groupBy("cl", "cn")
        .count()
        .filter(F.col("count") >= 5)
        .collect()
    )
    nodes = {(r["cl"], r["cn"]) for r in cells}
    # exact components via BFS over the 8-neighborhood
    seen, comps = set(), []
    for start in sorted(nodes):
        if start in seen:
            continue
        comp, stack = set(), [start]
        while stack:
            c = stack.pop()
            if c in comp:
                continue
            comp.add(c)
            for dl in (-1, 0, 1):
                for dn in (-1, 0, 1):
                    nb = (c[0] + dl, c[1] + dn)
                    if nb != c and nb in nodes and nb not in comp:
                        stack.append(nb)
        seen |= comp
        comps.append(comp)
    assert sorted(r["n_cells"] for r in got) == sorted(len(c) for c in comps)
    assert sum(r["n_cells"] for r in got) == len(nodes)


def test_auc_matches_python_recompute(spark):
    """AUC equals a direct pairwise-comparison computation (ties = 0.5)
    on the collected fixture."""
    from pulsar_ingestion_spark.queries_ml import q_ml_auc_roc
    from pulsar_ingestion_spark.session import load_tables

    r = q_ml_auc_roc(spark, SF).collect()[0]
    ev = load_tables(spark, SF)["events"].select("value", "event_type").collect()
    pos = sorted(e["value"] for e in ev if e["event_type"] == "purchase")
    neg = sorted(e["value"] for e in ev if e["event_type"] != "purchase")
    import bisect

    wins = 0.0
    for p in pos:
        lo = bisect.bisect_left(neg, p)
        hi = bisect.bisect_right(neg, p)
        wins += lo + 0.5 * (hi - lo)
    auc = wins / (len(pos) * len(neg))
    assert r["n_pos"] == len(pos) and r["n_neg"] == len(neg)
    assert abs(r["auc"] - auc) < 1e-9
    assert 0.0 <= r["auc"] <= 1.0


def test_calibration_and_confusion_identities(spark):
    from pulsar_ingestion_spark.queries_ml import (
        q_ml_calibration_bins,
        q_ml_confusion_threshold,
    )
    from pulsar_ingestion_spark.session import load_tables

    n_events = load_tables(spark, SF)["events"].count()
    bins = q_ml_calibration_bins(spark, SF).collect()
    assert sum(b["n"] for b in bins) == n_events
    for b in bins:
        assert 0.0 <= b["obs_rate"] <= 1.0
        assert 0.0 <= b["mean_pred"] <= 1.0 + 1e-9
    cm = q_ml_confusion_threshold(spark, SF).collect()[0]
    assert cm["tp"] + cm["fp"] + cm["fn"] + cm["tn"] == n_events
    p, r, f1 = cm["precision_"], cm["recall_"], cm["f1"]
    assert abs(f1 - 2 * p * r / (p + r)) < 1e-9


def test_prefix_filter_join_equals_bruteforce_jaccard(spark):
    """Prefix filtering is EXACT: the result equals the all-pairs
    Jaccard ≥ t computation done in python on the collected fixture."""
    from pulsar_ingestion_spark.queries_llm import q_dedup_jaccard_prefix_filter
    from pulsar_ingestion_spark.session import load_tables

    got = {
        (r["id_a"], r["id_b"]): (r["jaccard"], r["pair_weight"])
        for r in q_dedup_jaccard_prefix_filter(spark, SF).collect()
    }
    docs = load_tables(spark, SF)["documents"].select("doc_id", "text").collect()
    # exact-dedup to min-doc_id representatives, then 3-gram shingle sets
    clusters: dict[str, list[int]] = {}
    texts: dict[int, str] = {}
    for r in docs:
        clusters.setdefault(r["text"], []).append(r["doc_id"])
        texts[r["doc_id"]] = r["text"]
    reps = {min(ids): len(ids) for ids in clusters.values()}
    sets = {}
    for rid in reps:
        t = texts[rid].strip().lower().split()
        if len(t) >= 3:
            sets[rid] = {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}
    ids = sorted(sets)
    brute = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            if inter == 0:
                continue
            j = inter / len(sets[a] | sets[b])
            if j >= 0.6:
                brute[(a, b)] = (j, reps[a] * reps[b])
    assert set(got) == set(brute)
    for k, (j, w) in brute.items():
        assert abs(got[k][0] - j) < 1e-9
        assert got[k][1] == w


def test_frequent_pairs_match_bruteforce(spark):
    """A-priori pruning loses nothing: pair supports equal the direct
    per-basket enumeration."""
    from collections import Counter
    from itertools import combinations

    from pulsar_ingestion_spark.queries_tpch import q_basket_frequent_pairs
    from pulsar_ingestion_spark.session import load_tables

    got = {
        (r["item_a"], r["item_b"]): r["pair_support"]
        for r in q_basket_frequent_pairs(spark, SF).collect()
    }
    li = load_tables(spark, SF)["lineitem"].select("l_orderkey", "l_partkey").collect()
    baskets: dict[int, set[int]] = {}
    for r in li:
        baskets.setdefault(r["l_orderkey"], set()).add(r["l_partkey"])
    counts: Counter = Counter()
    for items in baskets.values():
        for a, b in combinations(sorted(items), 2):
            counts[(a, b)] += 1
    brute = {k: v for k, v in counts.items() if v >= 3}
    assert got == brute


def test_drift_ks_matches_python_recompute(spark):
    """The windowed two-sample KS equals a direct python computation of
    sup |F_a - F_b| over the pooled support."""
    from pulsar_ingestion_spark.queries_quality import q_drift_ks
    from pulsar_ingestion_spark.session import load_tables

    got = {r["event_type"]: r for r in q_drift_ks(spark, SF).collect()}
    ev = load_tables(spark, SF)["events"].select("event_type", "value", "ts").collect()
    import datetime

    split = datetime.datetime(2024, 1, 16)
    series: dict[str, tuple[list, list]] = {}
    for r in ev:
        a, b = series.setdefault(r["event_type"], ([], []))
        (a if r["ts"] < split else b).append(r["value"])
    for t, (a, b) in series.items():
        a.sort()
        b.sort()
        import bisect

        d = 0.0
        for v in sorted(set(a) | set(b)):
            fa = bisect.bisect_right(a, v) / len(a)
            fb = bisect.bisect_right(b, v) / len(b)
            d = max(d, abs(fa - fb))
        assert got[t]["n_a"] == len(a) and got[t]["n_b"] == len(b)
        assert abs(got[t]["ks_d"] - round(d, 6)) < 2e-6


def test_drift_psi_matches_python_recompute(spark):
    from pulsar_ingestion_spark.queries_quality import q_drift_psi
    from pulsar_ingestion_spark.session import load_tables
    import datetime
    import math

    got = {r["event_type"]: r["psi"] for r in q_drift_psi(spark, SF).collect()}
    ev = load_tables(spark, SF)["events"].select("event_type", "value", "ts").collect()
    split = datetime.datetime(2024, 1, 16)
    counts: dict[str, tuple[list, list]] = {}
    for r in ev:
        ca, cb = counts.setdefault(r["event_type"], ([0] * 10, [0] * 10))
        b = min(int(r["value"] // 40), 9)
        (ca if r["ts"] < split else cb)[b] += 1
    for t, (ca, cb) in counts.items():
        na, nb = sum(ca), sum(cb)
        psi = sum(
            round(
                ((ca[i] + 1) / (na + 10) - (cb[i] + 1) / (nb + 10))
                * math.log(((ca[i] + 1) / (na + 10)) / ((cb[i] + 1) / (nb + 10))),
                6,
            )
            for i in range(10)
        )
        assert abs(got[t] - psi) < 1e-9
