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
