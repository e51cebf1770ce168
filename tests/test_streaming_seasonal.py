"""Streaming seasonal grid (streaming/seasonal.py): counts, means,
shares and intensities must equal the batch events_seasonal_dow_hour
EXACTLY for any micro-batch cut; the per-cell user estimate must be
cut-invariant (register max-merge) and track the exact countDistinct
within the HLL band; replays must be no-ops for the ADD-merged state
and harmless for the MAX-merged registers."""

from __future__ import annotations

import pandas as pd

SF_DIR = "/root/testdata/sf0.001"
COLS = ["ts", "user_id", "value"]


def _stream_events(spark, tmp_path, maintainer, n_files, tag=""):
    src = str(tmp_path / f"src{tag}{n_files}")
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(*COLS)
    ev.repartition(n_files).write.parquet(src)
    q = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(maintainer)
        .option("checkpointLocation", str(tmp_path / f"ckpt{tag}{n_files}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def _batch_grid(spark):
    import __spark_entry__ as e

    return (
        e.queries()["events_seasonal_dow_hour"](spark, SF_DIR)
        .toPandas()
        .set_index(["dow", "hr"])
        .sort_index()
    )


def test_seasonal_grid_exact_stats_equal_batch_any_cut(spark, tmp_path):
    from pulsar_ingestion_spark.streaming.seasonal import SeasonalGridMaintainer

    batch = _batch_grid(spark)
    for n_files in (1, 4):
        m = SeasonalGridMaintainer()
        _stream_events(spark, tmp_path, m, n_files)
        grid = pd.DataFrame(m.grid()).set_index(["dow", "hr"]).sort_index()
        assert len(grid) == len(batch), n_files
        for key, row in batch.iterrows():
            g = grid.loc[key]
            assert g["n_events"] == row["n_events"], (key, n_files)
            # exact DECIMAL add-merge -> identical final division
            assert g["avg_value"] == row["avg_value"], (key, n_files)
            assert g["share"] == row["share"], (key, n_files)
            assert g["intensity"] == row["intensity"], (key, n_files)


def test_seasonal_grid_user_estimate_cut_invariant_and_sane(spark, tmp_path):
    from pulsar_ingestion_spark.streaming.seasonal import SeasonalGridMaintainer

    batch = _batch_grid(spark)
    one = SeasonalGridMaintainer()
    _stream_events(spark, tmp_path, one, 1, tag="a")
    four = SeasonalGridMaintainer()
    _stream_events(spark, tmp_path, four, 4, tag="b")
    g1 = pd.DataFrame(one.grid()).set_index(["dow", "hr"]).sort_index()
    g4 = pd.DataFrame(four.grid()).set_index(["dow", "hr"]).sort_index()
    # register max-merge: estimate identical at every cut
    assert (g1["n_users_est"] == g4["n_users_est"]).all()
    # tracks the exact countDistinct within the m=64 HLL band (~13%;
    # allow 2.5x for the fixture's tiny per-cell cardinalities)
    for key, row in batch.iterrows():
        exact = int(row["n_users"])
        est = float(g1.loc[key, "n_users_est"])
        assert abs(est - exact) <= max(3.0, 0.33 * exact), (key, exact, est)


def test_seasonal_grid_replay_is_noop(spark):
    from pulsar_ingestion_spark.streaming.seasonal import SeasonalGridMaintainer

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(*COLS)
    m = SeasonalGridMaintainer()
    m(ev, 0)
    snap = pd.DataFrame(m.grid())
    m(ev, 0)  # at-least-once replay of the same batch id
    again = pd.DataFrame(m.grid())
    pd.testing.assert_frame_equal(snap, again)
    # a later batch with the same rows max-merges registers (no change)
    # but is a NEW id, so counts double — the add/max split in action
    m(ev, 1)
    doubled = pd.DataFrame(m.grid()).set_index(["dow", "hr"])
    base = snap.set_index(["dow", "hr"])
    assert (doubled["n_events"] == 2 * base["n_events"]).all()
    assert (doubled["n_users_est"] == base["n_users_est"]).all()
    assert (doubled["avg_value"] == base["avg_value"]).all()
