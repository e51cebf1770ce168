"""Streaming Cochran-Armitage trend monitor (streaming/trend.py): the
Z^2 statistic must equal the batch stats_cochran_armitage EXACTLY (bit
equality, not a tolerance) for any micro-batch cut, because every
moment is an ADD-merged integer; replays must be no-ops."""

from __future__ import annotations

SF_DIR = "/root/testdata/sf0.001"
COLS = ["ts", "event_type"]


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


def test_trend_monitor_equals_batch_any_cut(spark, tmp_path):
    import __spark_entry__ as e
    from pulsar_ingestion_spark.streaming.trend import TrendMonitor

    batch = e.queries()["stats_cochran_armitage"](spark, SF_DIR).toPandas().iloc[0]
    for n_files in (1, 5):
        m = TrendMonitor()
        _stream_events(spark, tmp_path, m, n_files)
        snap = m.snapshot()
        assert snap["n_total"] == batch["n_total"], n_files
        assert snap["n_success"] == batch["n_success"], n_files
        assert snap["sum_t_r"] == batch["sum_t_r"], n_files
        assert snap["sum_t_n"] == batch["sum_t_n"], n_files
        # EXACT: same closed form over identical integer moments
        assert snap["z_squared"] == batch["z_squared"], n_files


def test_trend_monitor_replay_is_noop_and_degenerate_none(spark):
    from pyspark.sql import functions as F

    from pulsar_ingestion_spark.streaming.trend import TrendMonitor

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(*COLS)
    m = TrendMonitor()
    m(ev, 0)
    snap = m.snapshot()
    m(ev, 0)  # replayed id — guarded, no double count
    assert m.snapshot() == snap
    m(ev, 1)  # same rows, new id — moments double, Z^2 scales by 2
    assert m.snapshot()["n_total"] == 2 * snap["n_total"]
    assert abs(m.snapshot()["z_squared"] - 2 * snap["z_squared"]) < 1e-6
    # degenerate: no successes -> None, never a ZeroDivisionError
    empty = TrendMonitor(success_value="nonexistent-type")
    empty(ev, 0)
    assert empty.snapshot()["z_squared"] is None
