"""Round-11 session-5 batch-10 invariants: brute-force twins for HITS
hubs/authorities and the Ljung-Box portmanteau test — independent
pandas/numpy recomputations, not a third SQL engine.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _run(spark, qid, sf=SF):
    import __spark_entry__ as e

    return e.queries()[qid](spark, sf).toPandas()


def _events():
    ev = pd.read_parquet(f"{SF}/events.parquet")
    us = ev["ts"].astype("datetime64[us]").astype("int64")
    return ev.assign(us=us, hr=us // 3_600_000_000)


def test_graph_hits_brute_force(spark):
    out = _run(spark, "graph_hits").set_index("node")
    ev = _events().sort_values(["user_id", "ts", "event_id"])
    # weighted directed transition edges
    edges: dict[tuple[str, str], int] = {}
    for _, grp in ev.groupby("user_id"):
        types = grp["event_type"].tolist()
        for a, b in zip(types, types[1:]):
            edges[(a, b)] = edges.get((a, b), 0) + 1
    nodes = sorted(ev["event_type"].unique())
    # float twin of the two scaled-share rounds (engine uses x1e8
    # BIGINT shares between rounds -> agree to ~1e-7)
    a1 = {n: 0.0 for n in nodes}
    for (_, j), w in edges.items():
        a1[j] += w
    ta = sum(a1.values())
    a1s = {n: a1[n] / ta for n in nodes}
    h1 = {n: 0.0 for n in nodes}
    for (i, j), w in edges.items():
        h1[i] += w * a1s[j]
    th = sum(h1.values())
    h1s = {n: h1[n] / th for n in nodes}
    a2 = {n: 0.0 for n in nodes}
    for (i, j), w in edges.items():
        a2[j] += w * h1s[i]
    ta2 = sum(a2.values())
    assert set(out.index) == set(nodes)
    for n in nodes:
        assert abs(out.loc[n, "authority"] - a2[n] / ta2) < 1e-5
        assert abs(out.loc[n, "hub"] - h1[n] / th) < 1e-5
        assert out.loc[n, "authority"] >= 0 and out.loc[n, "hub"] >= 0
    # shares partition the mass (each column sums to 1 up to rounding)
    assert abs(out["authority"].sum() - 1.0) < 1e-4
    assert abs(out["hub"].sum() - 1.0) < 1e-4


def test_ts_ljung_box_brute_force(spark):
    out = _run(spark, "ts_ljung_box")
    ev = _events()
    for kind, sub in ev.groupby("event_type"):
        lo, hi = int(sub["hr"].min()), int(sub["hr"].max())
        idx = np.arange(lo, hi + 1)
        y = sub.groupby("hr").size().reindex(idx, fill_value=0).to_numpy(float)
        n = len(y)
        ybar = y.mean()
        dev = y - ybar
        s0 = (dev * dev).sum()
        rows = out[out["event_type"] == kind].set_index("lag").sort_index()
        assert list(rows.index) == [1, 2, 3, 4, 5, 6]
        assert (rows["n_hours"] == n).all()
        qsum = 0.0
        for k in range(1, 7):
            rho = (dev[k:] * dev[:-k]).sum() / s0
            assert abs(rows.loc[k, "rho"] - rho) < 1e-4
            assert abs(rows.loc[k, "rho"]) <= 1 + 1e-9
            qsum += rho * rho / (n - k)
        q = n * (n + 2) * qsum
        got = rows["q_stat"].iloc[0]
        assert (rows["q_stat"] == got).all()  # one Q per type
        assert abs(got - q) < 1e-3
        assert got >= 0


def test_cochran_armitage_brute_force(spark):
    out = _run(spark, "stats_cochran_armitage").iloc[0]
    ev = _events()
    hod = (ev["hr"] % 24).astype(int)
    s = (ev["event_type"] == "purchase").astype(int)
    df = pd.DataFrame({"t": hod, "s": s})
    cell = df.groupby("t").agg(n=("s", "size"), r=("s", "sum"))
    t = cell.index.to_numpy(float)
    n_i, r_i = cell["n"].to_numpy(float), cell["r"].to_numpy(float)
    N, R = n_i.sum(), r_i.sum()
    assert out["n_total"] == N and out["n_success"] == R
    assert out["sum_t_r"] == (t * r_i).sum()
    assert out["sum_t_n"] == (t * n_i).sum()
    num = N * (t * r_i).sum() - R * (t * n_i).sum()
    den = R * (N - R) * (N * (t * t * n_i).sum() - (t * n_i).sum() ** 2)
    assert abs(out["z_squared"] - N * num * num / den) < 1e-9
    assert out["z_squared"] >= 0
    # agreement with the textbook p-difference form: z^2 equals the
    # squared standardized score-covariance statistic
    pbar = R / N
    cov = (t * (r_i - n_i * pbar)).sum()
    var = pbar * (1 - pbar) * ((t * t * n_i).sum() - (t * n_i).sum() ** 2 / N)
    assert abs(out["z_squared"] - cov * cov / var) < 1e-6


def test_seasonal_residuals_brute_force(spark):
    out = _run(spark, "events_seasonal_residuals").set_index(["dow", "hr"])
    ev = _events()
    dow = ((ev["us"] // 86_400_000_000 + 4) % 7).astype(int)
    hr = (ev["hr"] % 24).astype(int)
    cell = pd.DataFrame({"dow": dow, "hr": hr}).groupby(["dow", "hr"]).size()
    n = cell.sum()
    rd = cell.groupby(level=0).sum()
    ch = cell.groupby(level=1).sum()
    assert len(out) == len(cell)
    chi2 = 0.0
    for (d, h), o in cell.items():
        e = rd[d] * ch[h] / n
        row = out.loc[(d, h)]
        assert row["observed"] == o
        assert abs(row["expected"] - e) < 1e-9
        assert abs(row["std_residual"] - (o - e) / e**0.5) < 1e-9
        chi2 += (o - e) ** 2 / e
    # residuals partition the chi-square statistic
    assert abs((out["std_residual"] ** 2).sum() - chi2) < 1e-6


def test_entropy_rate_brute_force(spark):
    out = _run(spark, "events_entropy_rate").iloc[0]
    ev = _events().sort_values(["user_id", "ts", "event_id"])
    pairs: dict[tuple[str, str], int] = {}
    for _, grp in ev.groupby("user_id"):
        types = grp["event_type"].tolist()
        for a, b in zip(types, types[1:]):
            pairs[(a, b)] = pairs.get((a, b), 0) + 1
    n = sum(pairs.values())
    assert out["n_transitions"] == n
    ci: dict[str, int] = {}
    cj: dict[str, int] = {}
    for (a, b), c in pairs.items():
        ci[a] = ci.get(a, 0) + c
        cj[b] = cj.get(b, 0) + c
    h_cond = -sum(c / n * np.log2(c / ci[a]) for (a, _), c in pairs.items())
    h_next = -sum(c / n * np.log2(c / n) for c in cj.values())
    assert abs(out["h_cond"] - h_cond) < 1e-5
    assert abs(out["h_next"] - h_next) < 1e-5
    assert abs(out["info_rate"] - (h_next - h_cond)) < 1e-5
    # information inequalities: 0 <= H(next|cur) <= H(next) <= log2(k)
    assert 0 <= out["h_cond"] <= out["h_next"] + 1e-9
    assert out["h_next"] <= np.log2(len(cj)) + 1e-9
    assert out["info_rate"] >= -1e-9


def test_page_trend_brute_force(spark):
    out = _run(spark, "stats_page_trend").iloc[0]
    ev = _events()
    ev["dow"] = ((ev["us"] // 86_400_000_000 + 4) % 7).astype(int)
    mv = ev.groupby(["user_id", "dow"])["value"].mean().unstack()
    complete = mv.dropna()
    b = len(complete)
    assert out["n_blocks"] == b
    # average ranks within each block (scipy-free)
    l_stat = 0.0
    for _, row in complete.iterrows():
        ranks = row.rank(method="average")
        l_stat += sum((int(d) + 1) * ranks[d] for d in ranks.index)
    assert abs(out["l_stat"] - l_stat) < 1e-6
    k = 7
    e_l = b * k * (k + 1) ** 2 / 4
    assert out["e_l"] == e_l
    var = b * k * k * (k + 1) * (k * k - 1) / 144
    assert abs(out["z_untied"] - (l_stat - e_l) / var**0.5) < 1e-9
    # rank-sum mass conservation: L is bounded by the extreme orderings
    lo = b * sum((j + 1) * (k - j) for j in range(k))
    hi = b * sum((j + 1) * (j + 1) for j in range(k))
    assert lo <= out["l_stat"] <= hi


def test_two_way_anova_brute_force(spark):
    out = _run(spark, "stats_two_way_anova").iloc[0]
    ev = _events()
    a = ((ev["us"] // 86_400_000_000 + 4) % 7).astype(int)
    b = ((ev["hr"] % 24) // 6).astype(int)
    y = ev["value"].round(4)
    df = pd.DataFrame({"a": a, "b": b, "y": y})
    n = len(df)
    gm = y.mean()
    assert out["n"] == n
    ss_total = ((y - gm) ** 2).sum()
    assert abs(out["ss_total"] - ss_total) < 1e-2
    cells = df.groupby(["a", "b"])["y"].agg(["size", "mean"])
    ss_cells = (cells["size"] * (cells["mean"] - gm) ** 2).sum()
    assert abs(out["ss_cells"] - ss_cells) < 1e-2
    ma = df.groupby("a")["y"].agg(["size", "mean"])
    ss_a = (ma["size"] * (ma["mean"] - gm) ** 2).sum()
    mb = df.groupby("b")["y"].agg(["size", "mean"])
    ss_b = (mb["size"] * (mb["mean"] - gm) ** 2).sum()
    assert abs(out["ss_dow"] - ss_a) < 1e-2
    assert abs(out["ss_hour_block"] - ss_b) < 1e-2
    assert abs(out["ss_interaction"] - (ss_cells - ss_a - ss_b)) < 5e-2
    # variance partition: between-cells never exceeds total
    assert 0 <= out["ss_cells"] <= out["ss_total"] + 1e-6
    k = len(cells)
    f = (ss_cells / (k - 1)) / ((ss_total - ss_cells) / (n - k))
    assert abs(out["f_cells"] - f) < 1e-4
    assert out["f_cells"] >= 0
