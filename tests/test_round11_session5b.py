"""Round-11 session-5 batch-9 invariants: brute-force twins for
Cochran's Q, Durbin-Watson, the seasonal-naive MASE backtest, and the
classical STL decomposition.

Each test recomputes the statistic with an INDEPENDENT in-memory
algorithm (pandas / numpy), not a third SQL engine — catching
shared-formula mistakes the DuckDB oracle can't (the oracle mirrors the
expression tree by design; these do not).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"

KINDS = ["click", "error", "purchase", "signup", "view"]


def _run(spark, qid, sf=SF):
    import __spark_entry__ as e

    return e.queries()[qid](spark, sf).toPandas()


def _events():
    ev = pd.read_parquet(f"{SF}/events.parquet")
    us = ev["ts"].astype("datetime64[us]").astype("int64")
    return ev.assign(us=us, hr=us // 3_600_000_000)


def test_cochran_q_brute_force(spark):
    out = _run(spark, "stats_cochran_q").iloc[0]
    ev = _events()
    flags = pd.DataFrame(
        {
            kind: ((ev["event_type"] == kind) & (ev["value"] > 300))
            .groupby(ev["user_id"])
            .any()
            .astype(int)
            for kind in KINDS
        }
    )
    k = 5
    c = flags.sum(axis=0)
    r = flags.sum(axis=1)
    t = int(c.sum())
    assert out["n_blocks"] == len(flags)
    for i, kind in enumerate(KINDS):
        assert out[f"c{i + 1}"] == c[kind]
    assert out["t"] == t
    assert out["sum_r_sq"] == int((r * r).sum())
    denom = k * t - int((r * r).sum())
    if denom:
        q = (k - 1) * (k * int((c * c).sum()) - t * t) / denom
        assert abs(out["q_stat"] - q) < 1e-9
        # textbook form agrees with the integer rearrangement
        q_text = k * (k - 1) * ((c - t / k) ** 2).sum() / denom
        assert abs(q - q_text) < 1e-9
        assert out["q_stat"] >= 0
    else:
        assert pd.isna(out["q_stat"])
    assert out["df"] == 4


def test_durbin_watson_brute_force(spark):
    out = _run(spark, "stats_durbin_watson").set_index("event_type")
    ev = _events()
    ev["y"] = ev["value"].round(4)
    for kind in KINDS:
        sub = ev[ev["event_type"] == kind].copy()
        x = (sub["hr"] - sub["hr"].min()).to_numpy(dtype=float)
        y = sub["y"].to_numpy(dtype=float)
        n = len(sub)
        sx, sy, sxy, sxx = x.sum(), y.sum(), (x * y).sum(), (x * x).sum()
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        intercept = (sy - slope * sx) / n
        sub["e"] = y - intercept - slope * x
        sub = sub.sort_values(["ts", "event_id"])
        ss = sd = sc = 0.0
        n_pairs = 0
        for _, grp in sub.groupby("user_id"):
            e = grp["e"].to_numpy()
            ss += (e * e).sum()
            sd += ((e[1:] - e[:-1]) ** 2).sum()
            sc += (e[1:] * e[:-1]).sum()
            n_pairs += max(len(e) - 1, 0)
        row = out.loc[kind]
        assert row["n"] == n
        assert row["n_pairs"] == n_pairs
        assert abs(row["slope"] - slope) < 1e-4
        assert abs(row["dw"] - sd / ss) < 1e-4
        assert abs(row["rho1"] - sc / ss) < 1e-4
        # domain invariants: DW in [0, 4], |rho1| bounded by AM-GM
        assert 0 <= row["dw"] <= 4
        assert abs(row["rho1"]) <= 1 + 1e-9


def _dense_series(ev):
    """Per-type dense hourly count series (zero-filled)."""
    out = {}
    for kind, sub in ev.groupby("event_type"):
        lo, hi = int(sub["hr"].min()), int(sub["hr"].max())
        idx = np.arange(lo, hi + 1)
        cnt = sub.groupby("hr").size().reindex(idx, fill_value=0)
        out[kind] = cnt
    return out


def test_seasonal_naive_mase_brute_force(spark):
    out = _run(spark, "ts_seasonal_naive_mase").set_index("event_type")
    series = _dense_series(_events())
    for kind, cnt in series.items():
        y = cnt.to_numpy(dtype=np.int64)
        row = out.loc[kind]
        assert row["n_hours"] == len(y)
        if len(y) <= 168:
            assert row["n_eval"] == 0
            continue
        e = y[168:] - y[:-168]
        p = y[1:] - y[:-1]
        assert row["n_eval"] == len(e)
        mae_s = np.abs(e).mean()
        mae_n = np.abs(p).mean()
        assert row["mae_seasonal"] == mae_s
        assert row["mae_naive"] == mae_n
        if mae_n:
            assert abs(row["mase"] - mae_s / mae_n) < 1e-12
        yc, f = y[168:], y[:-168]
        den = yc + f
        terms = np.where(den > 0, 2.0 * np.abs(yc - f) / np.where(den, den, 1), 0.0)
        assert abs(row["smape"] - terms.mean()) < 1e-6
        assert abs(row["bias"] - e.mean()) < 1e-12
        # sMAPE lives in [0, 2]
        assert 0 <= row["smape"] <= 2


def test_stl_classical_brute_force(spark):
    out = _run(spark, "ts_stl_classical")
    series = _dense_series(_events())
    for kind, cnt in series.items():
        y = cnt.to_numpy(dtype=float)
        n = len(y)
        # centered 2x24 MA trend, NULL at the 12-row edges
        trend = np.full(n, np.nan)
        for i in range(12, n - 12):
            trend[i] = (
                0.5 * y[i - 12] + y[i - 11 : i + 12].sum() + 0.5 * y[i + 12]
            ) / 24
        hod = (np.asarray(cnt.index) % 24).astype(int)
        det = y - trend
        ok = ~np.isnan(trend)
        sub = out[out["event_type"] == kind].set_index("hod").sort_index()
        s_raw = {}
        for h in range(24):
            mask = ok & (hod == h)
            s_raw[h] = det[mask].mean()
            assert sub.loc[h, "n_obs"] == int(mask.sum())
        grand = np.mean([s_raw[h] for h in range(24)])
        seasonal = {h: s_raw[h] - grand for h in range(24)}
        for h in range(24):
            assert abs(sub.loc[h, "seasonal"] - seasonal[h]) < 1e-4
        # centered: the 24 seasonal components sum to ~0
        assert abs(sub["seasonal"].sum()) < 24 * 1e-5
        # strength = max(0, 1 - Var(resid)/Var(detrended)), population var
        resid = np.array([det[i] - seasonal[hod[i]] for i in range(n) if ok[i]])
        detok = det[ok]
        strength = max(0.0, 1 - resid.var() / detok.var())
        got = sub["strength"].iloc[0]
        assert (sub["strength"] == got).all()
        assert abs(got - strength) < 1e-4
        assert 0 <= got <= 1
