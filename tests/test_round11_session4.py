"""Round-11 session-4 invariants: brute-force twins for the twelve new
queries (Kendall tau-b, log-rank, Friedman, regression scorecard,
2-D skyline, null profile, weighted median, Anderson-Darling,
circular hour stats, Theil's U, closeness centrality, Hurst R/S),
plus plan-shape and degenerate-input regression guards.

Each test recomputes the statistic with an INDEPENDENT in-memory
algorithm (itertools / pandas), not a third SQL engine — catching
shared-formula mistakes the DuckDB oracle can't (the oracle mirrors the
expression tree by design; these do not).
"""

from __future__ import annotations

import itertools
import math

import pandas as pd

SF = "/root/testdata/sf0.001"


def _run(spark, qid, sf=SF):
    import __spark_entry__ as e

    return e.queries()[qid](spark, sf).toPandas()


def test_kendall_tau_brute_force(spark):
    out = _run(spark, "stats_kendall_tau").iloc[0]
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    g = cust.groupby("c_nationkey").agg(
        x=("c_custkey", "size"), y=("c_acctbal", lambda s: round(s.sum(), 2))
    )
    pts = list(zip(g["x"], g["y"]))
    c = d = tx = ty = 0
    for (xa, ya), (xb, yb) in itertools.combinations(pts, 2):
        if xa == xb:
            tx += 1
        if ya == yb:
            ty += 1
        if (xa < xb and ya < yb) or (xa > xb and ya > yb):
            c += 1
        elif (xa < xb and ya > yb) or (xa > xb and ya < yb):
            d += 1
    n0 = len(pts) * (len(pts) - 1) // 2
    assert out["n_groups"] == len(pts)
    assert out["n_pairs"] == n0
    assert out["concordant"] == c
    assert out["discordant"] == d
    tau = (c - d) / math.sqrt((n0 - tx) * (n0 - ty))
    assert abs(out["tau_b"] - round(tau, 6)) <= 1e-6
    assert -1.0 <= out["tau_b"] <= 1.0


def test_logrank_brute_force(spark):
    out = _run(spark, "stats_logrank_test").iloc[0]
    ev = pd.read_parquet(f"{SF}/events.parquet")
    day = (ev["ts"].astype("datetime64[us]").astype("int64") // 10**6) // 86400
    u = pd.DataFrame(
        {
            "user": ev["user_id"],
            "day": day,
            "death": (ev["event_type"] == "purchase").astype(int),
        }
    ).groupby("user").agg(t_lo=("day", "min"), t_hi=("day", "max"), ev=("death", "max"))
    u["t"] = u["t_hi"] - u["t_lo"]
    u["g"] = (u.index % 2).astype(int)
    o1 = e1 = v = 0.0
    for t in sorted(u.loc[u["ev"] == 1, "t"].unique()):
        at = u[u["t"] >= t]
        n, n1 = len(at), int((at["g"] == 1).sum())
        dead = u[(u["t"] == t) & (u["ev"] == 1)]
        dd, d1 = len(dead), int((dead["g"] == 1).sum())
        o1 += d1
        e1 += round(dd * n1 / n, 8)
        if n > 1:
            v += round(dd * (n1 / n) * (1 - n1 / n) * (n - dd) / (n - 1), 8)
    assert out["observed_1"] == o1
    assert abs(out["expected_1"] - round(e1, 6)) <= 1e-6
    assert abs(out["variance"] - round(v, 6)) <= 1e-6
    assert abs(out["chi2"] - round((o1 - e1) ** 2 / v, 4)) <= 2e-4


def test_friedman_brute_force(spark):
    out = _run(spark, "stats_friedman").iloc[0]
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    cell = (
        orders.assign(blk=orders["o_orderdate"].dt.strftime("%Y-%m"))
        .groupby(["blk", "o_orderpriority"])
        .size()
        .rename("val")
        .reset_index()
    )
    k = cell["o_orderpriority"].nunique()
    sizes = cell.groupby("blk").size()
    full = sizes[sizes == k].index
    cell = cell[cell["blk"].isin(full)]
    n = len(full)
    # doubled average ranks per block (exact integers)
    r2sum: dict[str, int] = {}
    a4 = 0
    for _, grp in cell.groupby("blk"):
        vals = sorted(grp["val"])
        for _, row in grp.iterrows():
            rank = 1 + sum(1 for v in vals if v < row["val"])
            ties = sum(1 for v in vals if v == row["val"])
            dr = 2 * rank + ties - 1
            r2sum[row["o_orderpriority"]] = r2sum.get(row["o_orderpriority"], 0) + dr
            a4 += dr * dr
    num4 = sum((b - n * (k + 1)) ** 2 for b in r2sum.values())
    den = a4 - n * k * (k + 1) ** 2
    assert out["n_blocks"] == n
    assert out["k_treatments"] == k
    assert abs(out["q_statistic"] - round((k - 1) * num4 / den, 6)) <= 1e-6


def test_regression_metrics_brute_force(spark):
    out = _run(spark, "ml_regression_metrics").set_index("l_linestatus")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    for ls, grp in li.groupby("l_linestatus"):
        y = grp["l_extendedprice"].round(4)
        res = y - (950 * grp["l_quantity"].round(4) + 500)
        row = out.loc[ls]
        assert row["n"] == len(grp)
        assert abs(row["rmse"] - round(math.sqrt((res**2).mean()), 4)) <= 2e-4
        assert abs(row["mae"] - round(res.abs().mean(), 4)) <= 2e-4
        sst = (y**2).sum() - y.sum() ** 2 / len(y)
        assert abs(row["r2"] - round(1 - (res**2).sum() / sst, 6)) <= 2e-5
        mape = (res.abs() / y).round(10).mean()
        assert abs(row["mape"] - round(mape, 6)) <= 2e-6
        assert abs(row["mean_bias"] - round(res.mean(), 4)) <= 2e-4
        # QM >= AM on |residuals|
        assert row["rmse"] >= row["mae"]


def _dominates(q, p):
    return (q[0] < p[0] and q[1] >= p[1]) or (q[0] <= p[0] and q[1] > p[1])


def test_skyline_brute_force(spark):
    out = _run(spark, "rank_skyline_2d")
    part = pd.read_parquet(f"{SF}/part.parquet")
    pts = {
        pk: (pr, sz)
        for pk, pr, sz in zip(part["p_partkey"], part["p_retailprice"], part["p_size"])
    }
    expect = {
        pk
        for pk, p in pts.items()
        if not any(_dominates(q, p) for q in pts.values())
    }
    got = set(out["p_partkey"])
    assert got == expect
    # mutual non-domination among survivors
    sky = [pts[pk] for pk in got]
    for a, b in itertools.permutations(sky, 2):
        assert not _dominates(a, b)
    # every non-survivor is dominated by some skyline point
    for pk, p in pts.items():
        if pk not in got:
            assert any(_dominates(s, p) for s in sky)


def test_null_profile_brute_force(spark):
    out = _run(spark, "dq_null_profile").set_index("col")
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    docs["n_chars"] = docs["n_chars"].astype("Int64").astype(str)
    for col in ("lang", "source", "text", "n_chars"):
        s = docs[col]
        row = out.loc[col]
        assert row["n_rows"] == len(s)
        assert row["n_null"] == int(s.isna().sum())
        assert row["n_distinct"] == s.dropna().nunique()
        vc = s.dropna().value_counts()
        assert row["top_freq"] == (int(vc.iloc[0]) if len(vc) else 0)


def test_weighted_median_brute_force(spark):
    out = _run(spark, "agg_weighted_median").set_index("l_returnflag")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    li["w"] = li["l_quantity"].astype("int64")
    for flag, grp in li.groupby("l_returnflag"):
        g = grp.groupby("l_extendedprice")["w"].sum().sort_index()
        tw = int(g.sum())
        cw = g.cumsum()
        med = cw.index[(2 * cw >= tw).argmax()]
        row = out.loc[flag]
        assert row["total_weight"] == tw
        assert row["weighted_median_price"] == med
        # the median is an observed price of the group
        assert med in set(grp["l_extendedprice"])


def test_anderson_darling_brute_force(spark):
    out = _run(spark, "stats_anderson_darling_uniform").iloc[0]
    ev = pd.read_parquet(f"{SF}/events.parquet")
    xs = sorted(v for v in ev["value"] if 0 < v < 500)
    n = len(xs)
    s = 0.0
    for i, x in enumerate(xs, start=1):
        f = x / 500.0
        fr = xs[n - i] / 500.0
        s += (2 * i - 1) * (round(math.log(f), 8) + round(math.log(1 - fr), 8))
    a2 = -n - s / n
    assert out["n"] == n
    assert abs(out["a_squared"] - round(a2, 4)) <= 2e-4


def test_circular_hour_stats_brute_force(spark):
    out = _run(spark, "events_circular_hour_stats").set_index("event_type")
    ev = pd.read_parquet(f"{SF}/events.parquet")
    hours = ev["ts"].dt.hour
    for et, grp in ev.assign(h=hours).groupby("event_type"):
        ss = sum(round(math.sin(2 * math.pi * h / 24), 8) for h in grp["h"])
        sc = sum(round(math.cos(2 * math.pi * h / 24), 8) for h in grp["h"])
        n = len(grp)
        row = out.loc[et]
        assert row["n"] == n
        assert abs(row["resultant_r"] - math.hypot(ss, sc) / n) <= 1e-4
        mh = ((math.atan2(ss, sc) + 2 * math.pi) % (2 * math.pi)) / (2 * math.pi) * 24
        assert abs(row["mean_hour"] - mh) <= 1e-3
        assert 0.0 <= row["resultant_r"] <= 1.0
        assert 0.0 <= row["mean_hour"] < 24.0


def test_theil_u_brute_force(spark):
    from collections import Counter

    out = _run(spark, "stats_theil_u").iloc[0]
    ev = pd.read_parquet(f"{SF}/events.parquet")
    xs = ev["event_type"]
    ys = [min(int(v // 50), 9) for v in ev["value"]]
    n = len(xs)
    cx, cy, cxy = Counter(xs), Counter(ys), Counter(zip(xs, ys))

    def ent(counter):
        return -sum((c / n) * math.log(c / n) for c in counter.values())

    hx, hy = ent(cx), ent(cy)
    hxgy = -sum((c / n) * math.log(c / cy[y]) for (x, y), c in cxy.items())
    hygx = -sum((c / n) * math.log(c / cx[x]) for (x, y), c in cxy.items())
    assert abs(out["h_x"] - hx) <= 1e-5
    assert abs(out["h_y"] - hy) <= 1e-5
    assert abs(out["u_x_given_y"] - (hx - hxgy) / hx) <= 1e-5
    assert abs(out["u_y_given_x"] - (hy - hygx) / hy) <= 1e-5
    # uncertainty coefficients live in [0, 1]
    assert -1e-9 <= out["u_x_given_y"] <= 1.0
    assert -1e-9 <= out["u_y_given_x"] <= 1.0


def test_closeness_centrality_brute_force(spark):
    from collections import defaultdict, deque
    import hashlib

    out = _run(spark, "graph_closeness_centrality").set_index("src")
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev.assign(
        hr=(ev["ts"].astype("datetime64[us]").astype("int64") // (300 * 10**6))
    )
    adj = defaultdict(set)
    for (_, _), grp in ev.groupby(["event_type", "hr"]):
        users = sorted(
            set(grp["user_id"]),
            key=lambda u: (int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16), u),
        )[:64]
        for a, b in itertools.combinations(sorted(users), 2):
            adj[a].add(b)
            adj[b].add(a)
    seeds = sorted(adj)[:4]
    for s in seeds:
        dist = {s: 0}
        dq = deque([s])
        while dq:
            u = dq.popleft()
            if dist[u] >= 4:
                continue
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    dq.append(v)
        byd: dict[int, int] = {}
        for v, d in dist.items():
            if d > 0:
                byd[d] = byd.get(d, 0) + 1
        row = out.loc[s]
        assert row["n_reached"] == sum(byd.values())
        assert row["sum_dist"] == sum(d * c for d, c in byd.items())
        harm = sum(round(c / d, 8) for d, c in byd.items())
        assert abs(row["harmonic"] - round(harm, 6)) <= 1e-6
        assert abs(
            row["closeness"]
            - round(sum(byd.values()) / sum(d * c for d, c in byd.items()), 6)
        ) <= 1e-6


def test_skyline_and_weighted_median_plan_shapes(spark):
    """Plan-shape regression guards for the two session-4 scale claims:
    the skyline's join of parts against the distinct-price stats must be
    a BROADCAST hash join (the stats relation is bounded by the price
    domain; a shuffle join here would re-shuffle every part row), and
    the weighted median must contain NO partition-less window over the
    raw relation (keyed_running_sums is the point)."""
    import __spark_entry__ as e

    sky = e.queries()["rank_skyline_2d"](spark, SF)
    plan = sky._sc._jvm.PythonSQLUtils.explainString(
        sky._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan[:2000]
    # parts themselves must NOT be on the broadcast side: the build side
    # is the price-stats relation, keyed on price
    wm = e.queries()["agg_weighted_median"](spark, SF)
    wplan = wm._sc._jvm.PythonSQLUtils.explainString(
        wm._jdf.queryExecution(), "formatted"
    )
    # the running sum must ride a PARTITIONED window over the quantile
    # bucket (round 13: keyed_running_sums bucketizes with in-plan
    # quantiles — `_pid` — instead of an eager range repartition); the
    # raw relation must never flow through an unpartitioned window
    assert "_pid" in wplan, wplan[:2000]
    import re as _re

    for m in _re.finditer(r"windowspecdefinition\(([^)]*)", wplan):
        first = m.group(1).split(",")[0].strip()
        assert not first.startswith("specifiedwindowframe"), (
            "unpartitioned window over the weighted-median relation"
        )
    spark.catalog.clearCache()


def test_closeness_centrality_edgeless_graph_returns_empty(spark, tmp_path):
    """Session-4 review finding: an events table with no co-occurrence
    pairs (every (type, bucket) cell has one user) produces an EMPTY
    edge list — the query must return zero rows with the stable schema,
    not crash on an empty seed list."""
    import os

    import __spark_entry__ as e

    src = str(tmp_path / "sf_edgeless")
    os.makedirs(src)
    for name in ("region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "documents", "embeddings"):
        os.symlink(f"{SF}/{name}.parquet", f"{src}/{name}.parquet")
    spark.createDataFrame(
        [(i, f"2025-01-01 0{i}:00:00", i, "click", 1.0, "{}") for i in range(5)],
        "event_id long, ts_s string, user_id long, event_type string,"
        " value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts_s AS TIMESTAMP) AS ts", "user_id",
        "event_type", "value", "props"
    ).write.parquet(f"{src}/events.parquet")
    out = e.queries()["graph_closeness_centrality"](spark, src)
    assert out.count() == 0
    assert [f.name for f in out.schema] == [
        "src", "n_reached", "sum_dist", "closeness", "harmonic"
    ]


def test_hurst_rs_brute_force(spark):
    out = _run(spark, "ts_hurst_rs").iloc[0]
    ev = pd.read_parquet(f"{SF}/events.parquet").sort_values(
        ["ts", "event_id"], kind="mergesort"
    )
    xs = [round(v, 4) for v in ev["value"]]
    n = len(xs)
    assert out["n_series"] == n
    rs_avgs = {}
    for w in (16, 64, 256):
        chunks = n // w
        assert out[f"chunks_{w}"] <= chunks  # S=0 chunks are dropped
        terms = []
        for ci in range(chunks):
            seg = xs[ci * w : (ci + 1) * w]
            mean = sum(seg) / w
            cum, zs = 0.0, []
            for i, x in enumerate(seg, start=1):
                cum = round(cum + x, 4)  # decimal cumsum is exact at 4dp
                zs.append(cum - i * mean)
            r = max(zs) - min(zs)
            s2 = sum(v * v for v in seg) / w - mean * mean
            s = math.sqrt(s2) if s2 > 0 else 0.0
            if s > 0:
                terms.append(round(r / s, 8))
        rs_avgs[w] = sum(terms) / len(terms)
        assert abs(out[f"rs_{w}"] - round(rs_avgs[w], 6)) <= 1e-5, w
        # R/S of a w-sample chunk is bounded by sqrt(w) up to a constant
        assert 0 < rs_avgs[w] < 2 * math.sqrt(w)
    hurst = (math.log(rs_avgs[256]) - math.log(rs_avgs[16])) / (2 * math.log(4))
    assert abs(out["hurst"] - round(hurst, 4)) <= 2e-4
    assert 0.0 < out["hurst"] < 1.0


def test_kaplan_meier_brute_force(spark):
    out = _run(spark, "stats_kaplan_meier").set_index("death_time")
    ev = pd.read_parquet(f"{SF}/events.parquet")
    day = (ev["ts"].astype("datetime64[us]").astype("int64") // 10**6) // 86400
    u = pd.DataFrame(
        {"user": ev["user_id"], "day": day,
         "death": (ev["event_type"] == "purchase").astype(int)}
    ).groupby("user").agg(lo=("day", "min"), hi=("day", "max"), ev=("death", "max"))
    u["t"] = u["hi"] - u["lo"]
    surv = 1.0
    cl8 = 0
    for t in sorted(u.loc[u["ev"] == 1, "t"].unique()):
        n = int((u["t"] >= t).sum())
        d = int(((u["t"] == t) & (u["ev"] == 1)).sum())
        if d >= n:
            continue  # ln(0) exclusion — the curve's terminal drop
        cl8 += round(math.log(1 - d / n) * 1e8)
        row = out.loc[t]
        assert row["n_at_risk"] == n and row["n_deaths"] == d
        assert abs(row["factor"] - round(1 - d / n, 6)) <= 1e-6
        assert abs(row["survival"] - round(math.exp(cl8 / 1e8), 6)) <= 1e-6
        # the product-limit curve is non-increasing and in (0, 1]
        assert row["survival"] <= surv + 1e-9
        surv = row["survival"]


def test_nelson_aalen_brute_force_and_km_bound(spark):
    out = _run(spark, "stats_nelson_aalen").set_index("death_time")
    km = _run(spark, "stats_kaplan_meier").set_index("death_time")
    ev = pd.read_parquet(f"{SF}/events.parquet")
    day = (ev["ts"].astype("datetime64[us]").astype("int64") // 10**6) // 86400
    u = pd.DataFrame(
        {"user": ev["user_id"], "day": day,
         "death": (ev["event_type"] == "purchase").astype(int)}
    ).groupby("user").agg(lo=("day", "min"), hi=("day", "max"), ev=("death", "max"))
    u["t"] = u["hi"] - u["lo"]
    ch8 = 0
    prev_h = -1.0
    for t in sorted(u.loc[u["ev"] == 1, "t"].unique()):
        n = int((u["t"] >= t).sum())
        d = int(((u["t"] == t) & (u["ev"] == 1)).sum())
        ch8 += round(d / n * 1e8)
        row = out.loc[t]
        assert row["n_at_risk"] == n and row["n_deaths"] == d
        assert abs(row["cum_hazard"] - round(ch8 / 1e8, 6)) <= 1e-6
        assert abs(row["fh_survival"] - round(math.exp(-ch8 / 1e8), 6)) <= 1e-6
        # hazard is non-decreasing
        assert row["cum_hazard"] >= prev_h
        prev_h = row["cum_hazard"]
        # Fleming-Harrington dominates the product-limit estimate
        # pointwise (exp(-x) >= 1-x applied factor-wise)
        if t in km.index:
            assert row["fh_survival"] >= km.loc[t]["survival"] - 1e-6
