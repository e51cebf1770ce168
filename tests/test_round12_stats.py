"""Round-12 contingency/variance tests vs independent ground truth.

The registry oracles are DuckDB twins of the SAME formulas; these tests
recompute each statistic a THIRD way — exact rational arithmetic
(``fractions``/``math.comb``) or plain numpy-free Python floats over
counts pulled straight from the parquet — so a shared formula error
can't hide behind engine parity.
"""

from __future__ import annotations

import math

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"

_DOW = "((epoch_us(ts) // 86400000000 + 4) % 7)"
_WK = f"CASE WHEN {_DOW} IN (6, 0) THEN 1 ELSE 0 END"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF_DIR}/events.parquet')"
    )
    return con


def _table(duck):
    return duck.execute(f"""
        SELECT CAST(SUM(wk * er) AS BIGINT),
               CAST(SUM(wk * (1 - er)) AS BIGINT),
               CAST(SUM((1 - wk) * er) AS BIGINT),
               CAST(SUM((1 - wk) * (1 - er)) AS BIGINT)
        FROM (SELECT {_WK} AS wk,
                     CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS er
              FROM events)
    """).fetchone()


def test_fisher_exact_matches_rational_ground_truth(spark):
    """p_right recomputed with EXACT integer combinatorics
    (math.comb + Fraction-free float division at the very end) must
    agree with the Stirling-backed engine fold to ~1e-9 — far inside
    the 6 dp output round."""
    from fractions import Fraction

    import __spark_entry__ as e

    out = e.queries()["stats_fisher_exact_2x2"](spark, SF_DIR).first()
    a, b, c, d = out["n11"], out["n12"], out["n21"], out["n22"]
    r1, r2, c1 = a + b, c + d, a + c
    n = a + b + c + d
    denom = math.comb(n, c1)
    p = Fraction(0)
    for k in range(a, min(r1, c1) + 1):
        p += Fraction(math.comb(r1, k) * math.comb(r2, c1 - k), denom)
    assert abs(out["p_right"] - float(p)) <= 1e-6 + 1e-9
    assert abs(out["odds_ratio"] - (a * d) / (b * c)) <= 1e-6


def test_g_test_matches_python_ground_truth(spark, duck):
    import __spark_entry__ as e

    out = e.queries()["stats_g_test"](spark, SF_DIR).first()
    cells = duck.execute(f"""
        SELECT event_type, {_WK} AS wk, count(*) FROM events GROUP BY 1, 2
    """).fetchall()
    n = sum(o for _, _, o in cells)
    rt = {}
    ct = {}
    for et, wk, o in cells:
        rt[et] = rt.get(et, 0) + o
        ct[wk] = ct.get(wk, 0) + o
    g = 2 * sum(o * math.log(o * n / (rt[et] * ct[wk])) for et, wk, o in cells)
    assert out["n"] == n
    assert out["df"] == (len(rt) - 1) * (len(ct) - 1)
    assert abs(out["g_statistic"] - g) <= 1e-5


def test_bartlett_matches_python_ground_truth(spark, duck):
    import __spark_entry__ as e

    out = e.queries()["stats_bartlett"](spark, SF_DIR).first()
    groups = duck.execute("""
        SELECT count(*), SUM(CAST(value AS DECIMAL(18,4))),
               SUM(CAST(value AS DECIMAL(18,4)) * CAST(value AS DECIMAL(18,4)))
        FROM events GROUP BY event_type
    """).fetchall()
    nn = sum(g[0] for g in groups)
    k = len(groups)
    variances = [
        (float(ss) - float(s) * float(s) / n) / (n - 1) for n, s, ss in groups
    ]
    sp2 = sum((g[0] - 1) * v for g, v in zip(groups, variances)) / (nn - k)
    t = ((nn - k) * math.log(sp2)
         - sum((g[0] - 1) * math.log(v) for g, v in zip(groups, variances)))
    c = 1 + (sum(1 / (g[0] - 1) for g in groups) - 1 / (nn - k)) / (3 * (k - 1))
    assert out["n"] == nn and out["k_groups"] == k
    assert abs(out["pooled_var"] - sp2) <= 1e-4
    assert abs(out["bartlett_t"] - t / c) <= 1e-4


def test_cmh_matches_python_ground_truth(spark, duck):
    import __spark_entry__ as e

    out = e.queries()["stats_cmh"](spark, SF_DIR).first()
    strata = duck.execute(f"""
        SELECT count(*), SUM(wk), SUM(hi), SUM(wk * hi)
        FROM (SELECT event_type, {_WK} AS wk,
                     CASE WHEN value >= 250 THEN 1 ELSE 0 END AS hi
              FROM events)
        GROUP BY event_type
    """).fetchall()
    dev = sum(a - r1 * c1 / n for n, r1, c1, a in strata)
    var = sum(
        r1 * (n - r1) * c1 * (n - c1) / (n * n * (n - 1))
        for n, r1, c1, a in strata
    )
    assert out["k_strata"] == len(strata)
    assert out["sum_a"] == sum(a for _, _, _, a in strata)
    assert abs(out["sum_dev"] - dev) <= 1e-4
    assert abs(out["cmh_statistic"] - dev * dev / var) <= 1e-4


def test_fisher_term_guard_message():
    """The guard names the scale-appropriate alternatives."""
    import inspect

    from pulsar_ingestion_spark import queries_stats as qs

    src = inspect.getsource(qs.q_stats_fisher_exact_2x2)
    assert "1_000_000" in src and "stats_g_test" in src


def test_trigram_stupid_backoff_matches_python_ground_truth(spark, duck):
    """Recompute the held-out stupid-backoff scores in pure Python
    (dict counts over the raw parquet text) and compare every doc's
    term counts exactly and its score to 1e-4."""
    import re
    from collections import Counter

    import __spark_entry__ as e

    rows = duck.execute(
        "SELECT doc_id, text FROM read_parquet("
        f"'{SF_DIR}/documents.parquet')"
    ).fetchall()
    uni: Counter = Counter()
    bi: Counter = Counter()
    tri: Counter = Counter()
    test_docs = {}
    for doc_id, text in rows:
        t = re.split(r"\s+", text.strip().lower())
        if doc_id % 7 != 0:
            uni.update(t)
            bi.update(zip(t, t[1:]))
            tri.update(zip(t, t[1:], t[2:]))
        else:
            test_docs[doc_id] = list(zip(t, t[1:], t[2:]))
    n = sum(uni.values())
    want = {}
    for doc_id, grams in test_docs.items():
        if not grams:
            continue
        total, unscored = 0.0, 0
        for g in grams:
            w1, w2, w3 = g
            if tri[g]:
                s = tri[g] / bi[(w1, w2)]
            elif bi[(w2, w3)]:
                s = 0.4 * bi[(w2, w3)] / uni[w2]
            elif uni[w3]:
                s = 0.16 * uni[w3] / n
            else:
                unscored += 1
                continue
            total += round(-math.log2(s), 6)
        want[doc_id] = (len(grams), unscored, total)
    got = {
        r["doc_id"]: (r["n_trigrams"], r["n_unscored"], r["total_neg_log2s"])
        for r in e.queries()["text_trigram_stupid_backoff"](
            spark, SF_DIR
        ).collect()
    }
    assert set(got) == set(want)
    for doc_id in want:
        assert got[doc_id][0] == want[doc_id][0], doc_id
        assert got[doc_id][1] == want[doc_id][1], doc_id
        if want[doc_id][0] > want[doc_id][1]:
            assert abs(got[doc_id][2] - want[doc_id][2]) <= 1e-4, doc_id
    # the held-out split must actually exercise the backoff ladder
    assert any(v[1] > 0 for v in want.values()) or any(
        v[2] and v[0] for v in want.values()
    )


def test_breusch_pagan_matches_python_ground_truth(spark, duck):
    import __spark_entry__ as e

    out = e.queries()["stats_breusch_pagan"](spark, SF_DIR).first()
    rows = duck.execute("""
        SELECT CAST((epoch_us(ts) // 3600000000) % 24 AS BIGINT),
               CAST(CAST(value AS DECIMAL(18,4)) AS DOUBLE), value
        FROM events
    """).fetchall()
    n = len(rows)
    sx = sum(x for x, _, _ in rows)
    sxx = sum(x * x for x, _, _ in rows)
    sy = sum(y4 for _, y4, _ in rows)
    sxy = sum(x * y4 for x, y4, _ in rows)
    b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    a = (sy - b * sx) / n
    e2 = [(x, (y - a - b * x) ** 2) for x, _, y in rows]
    se2 = sum(v for _, v in e2)
    sxe2 = sum(x * v for x, v in e2)
    se2e2 = sum(v * v for _, v in e2)
    r2_num = (sxe2 - sx * se2 / n) ** 2
    r2_den = (sxx - sx * sx / n) * (se2e2 - se2 * se2 / n)
    lm = n * r2_num / r2_den
    assert out["n"] == n and out["df"] == 1
    assert abs(out["slope"] - b) <= 1e-5
    assert abs(out["lm_statistic"] - lm) <= max(1e-3, abs(lm) * 1e-4)


def test_mood_median_matches_python_ground_truth(spark, duck):
    import __spark_entry__ as e

    out = e.queries()["stats_mood_median"](spark, SF_DIR).first()
    vals = [v for (v,) in duck.execute("SELECT value FROM events").fetchall()]
    vals.sort()
    n = len(vals)
    # quantile_cont interpolated median
    if n % 2:
        m = vals[n // 2]
    else:
        m = (vals[n // 2 - 1] + vals[n // 2]) / 2
    groups = duck.execute(f"""
        SELECT event_type, count(*),
               SUM(CASE WHEN value > {m!r} THEN 1 ELSE 0 END)
        FROM events GROUP BY 1
    """).fetchall()
    nn = sum(g[1] for g in groups)
    ta = sum(g[2] for g in groups)
    p = ta / nn
    chi2 = sum(
        (a - gn * p) ** 2 / (gn * p)
        + ((gn - a) - gn * (1 - p)) ** 2 / (gn * (1 - p))
        for _, gn, a in groups
    )
    assert out["k_groups"] == len(groups)
    assert abs(out["grand_median"] - m) <= 1e-6
    assert out["df"] == len(groups) - 1
    assert abs(out["chi2_statistic"] - chi2) <= 1e-4


def test_spectral_entropy_matches_python_ground_truth(spark, duck):
    import __spark_entry__ as e

    rows = {
        r["event_type"]: (r["spectral_entropy"], r["top_bin_share"])
        for r in e.queries()["ts_spectral_entropy"](spark, SF_DIR).collect()
    }
    hourly = duck.execute("""
        SELECT event_type, epoch_us(ts) // 3600000000, count(*)
        FROM events GROUP BY 1, 2
    """).fetchall()
    from collections import defaultdict

    series = defaultdict(list)
    for et, t, cnt in hourly:
        series[et].append((t, cnt))
    two_pi = 6.283185307179586
    for et, pts in series.items():
        powers = []
        for k in range(1, 9):
            c = sum(round(cnt * math.cos(two_pi * k * (t % 24) / 24.0), 6)
                    for t, cnt in pts)
            s = sum(round(cnt * math.sin(two_pi * k * (t % 24) / 24.0), 6)
                    for t, cnt in pts)
            powers.append(c * c + s * s)
        tp = sum(powers)
        h = sum(-(p / tp) * math.log(p / tp) for p in powers if p > 0) / math.log(8)
        assert abs(rows[et][0] - h) <= 1e-4, et
        assert abs(rows[et][1] - max(powers) / tp) <= 1e-4, et
    # both entropy bounds hold
    assert all(0 <= v[0] <= 1 + 1e-9 for v in rows.values())


def test_pacf_durbin_matches_python_ground_truth(spark, duck):
    """Recompute lag-1..3 PACF via a full Durbin-Levinson recursion in
    pure Python over the dense hourly series and compare (the query
    uses the closed forms; the recursion is the independent spelling)."""
    import __spark_entry__ as e
    from collections import defaultdict

    rows = {
        r["event_type"]: (r["pacf1"], r["pacf2"], r["pacf3"])
        for r in e.queries()["ts_pacf_durbin"](spark, SF_DIR).collect()
    }
    hourly = duck.execute("""
        SELECT event_type, epoch_us(ts) // 3600000000, count(*)
        FROM events GROUP BY 1, 2
    """).fetchall()
    series = defaultdict(dict)
    for et, hr, cnt in hourly:
        series[et][hr] = cnt
    for et, pts in series.items():
        lo, hi = min(pts), max(pts)
        y = [pts.get(h, 0) for h in range(lo, hi + 1)]
        n = len(y)
        ybar = sum(y) / n
        dev = [v - ybar for v in y]
        s0 = sum(round(d * d, 6) for d in dev)
        r = [1.0]
        for k in (1, 2, 3):
            num = sum(round(dev[i] * dev[i - k], 6) for i in range(k, n))
            r.append(num / s0)
        # Durbin-Levinson recursion
        phi = {1: {1: r[1]}}
        v = 1 - r[1] * r[1]
        for k in (2, 3):
            num = r[k] - sum(phi[k - 1][j] * r[k - j] for j in range(1, k))
            pkk = num / (1 - sum(phi[k - 1][j] * r[j] for j in range(1, k)))
            phi[k] = {k: pkk}
            for j in range(1, k):
                phi[k][j] = phi[k - 1][j] - pkk * phi[k - 1][k - j]
        want = (r[1], phi[2][2], phi[3][3])
        for got, exp in zip(rows[et], want):
            assert abs(got - exp) <= 1e-4, (et, got, exp)
    # lag-1 PACF must equal lag-1 ACF by definition
    assert all(abs(v[0]) <= 1 + 1e-9 for v in rows.values())


def test_tost_matches_python_ground_truth(spark, duck):
    import __spark_entry__ as e

    out = e.queries()["stats_tost_equivalence"](spark, SF_DIR).first()
    arms = {}
    for et, n, s, ss in duck.execute("""
        SELECT event_type, count(*),
               SUM(CAST(value AS DECIMAL(18,4))),
               SUM(CAST(value AS DECIMAL(18,4)) * CAST(value AS DECIMAL(18,4)))
        FROM events WHERE event_type IN ('click', 'error') GROUP BY 1
    """).fetchall():
        arms[et] = (n, float(s), float(ss))
    na, sa, ssa = arms["click"]
    nb, sb, ssb = arms["error"]
    ma, mb = sa / na, sb / nb
    van = (ssa - sa * sa / na) / (na - 1) / na
    vbn = (ssb - sb * sb / nb) / (nb - 1) / nb
    se = math.sqrt(van + vbn)
    d = ma - mb
    assert out["n_a"] == na and out["n_b"] == nb
    assert abs(out["mean_diff"] - d) <= 1e-5
    assert abs(out["t_lower"] - (d + 5.0) / se) <= 1e-4
    assert abs(out["t_upper"] - (d - 5.0) / se) <= 1e-4
    want_eq = 1 if ((d + 5.0) / se > 1.6449 and (d - 5.0) / se < -1.6449) else 0
    assert out["equivalent_at_90"] == want_eq


def test_poisson_dispersion_matches_python_ground_truth(spark, duck):
    import __spark_entry__ as e
    from collections import defaultdict

    rows = {
        r["event_type"]: r
        for r in e.queries()["stats_poisson_dispersion"](
            spark, SF_DIR
        ).collect()
    }
    hourly = duck.execute("""
        SELECT event_type, epoch_us(ts) // 3600000000, count(*)
        FROM events GROUP BY 1, 2
    """).fetchall()
    series = defaultdict(dict)
    for et, hr, cnt in hourly:
        series[et][hr] = cnt
    for et, pts in series.items():
        lo, hi = min(pts), max(pts)
        y = [pts.get(h, 0) for h in range(lo, hi + 1)]
        n = len(y)
        mean = sum(y) / n
        var = sum((v - mean) ** 2 for v in y) / (n - 1)
        r = rows[et]
        assert r["n_hours"] == n and r["df"] == n - 1
        assert abs(r["mean_per_hour"] - mean) <= 1e-5
        assert abs(r["dispersion_index"] - var / mean) <= 1e-4
        assert abs(r["chi2_statistic"] - (n - 1) * var / mean) <= 1e-2


def test_interarrival_ks_matches_python_ground_truth(spark, duck):
    import __spark_entry__ as e
    from collections import defaultdict

    rows = {
        r["event_type"]: r
        for r in e.queries()["events_interarrival_expon_ks"](
            spark, SF_DIR
        ).collect()
    }
    evs = duck.execute("""
        SELECT event_type, epoch_us(ts), event_id FROM events
        ORDER BY event_type, ts, event_id
    """).fetchall()
    series = defaultdict(list)
    for et, us, _ in evs:
        series[et].append(us)
    for et, uss in series.items():
        gaps = sorted(b - a for a, b in zip(uss, uss[1:]))
        n = len(gaps)
        mean = sum(gaps) / n
        d = 0.0
        from collections import Counter

        cnt = Counter(gaps)
        cc = 0
        for g in sorted(cnt):
            c = cnt[g]
            f0 = 1 - math.exp(-(g / mean))
            d = max(d, abs((cc + c) / n - f0), abs(cc / n - f0))
            cc += c
        r = rows[et]
        assert r["n_gaps"] == n, et
        assert abs(r["mean_gap_s"] - mean / 1e6) <= 1e-5, et
        assert abs(r["ks_d"] - d) <= 1e-5, et
