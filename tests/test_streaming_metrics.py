"""Metrics/observability export (VERDICT r7 "What's missing" #5): the
JsonlMetricsListener must land started/progress/terminated records with
rates, durations, and the pipeline's observe() metrics."""

from __future__ import annotations

import json
import time

from pyspark.sql import functions as F

from pulsar_ingestion_spark.streaming.metrics import (
    attach_metrics,
    read_metrics,
    throughput_summary,
)


def _wait_for(pred, timeout=30.0):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if pred():
            return True
        time.sleep(0.2)
    return False


def test_metrics_listener_end_to_end(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    (src / "a.jsonl").write_text(
        "\n".join(json.dumps({"k": i % 3, "v": i}) for i in range(60)) + "\n"
    )
    log = str(tmp_path / "metrics.jsonl")
    listener = attach_metrics(spark, log)
    try:
        stream = (
            spark.readStream.schema("k long, v long").json(str(src))
            .observe("route_metrics", F.count(F.lit(1)).alias("routed"))
            .groupBy("k").count()
        )
        q = (
            stream.writeStream.outputMode("complete")
            .format("memory").queryName("metrics_q")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # listener callbacks are async — poll for the terminated record
        assert _wait_for(lambda: any(
            r["event"] == "terminated" for r in read_metrics(log)
        )), read_metrics(log)
    finally:
        spark.streams.removeListener(listener)

    recs = read_metrics(log)
    events = [r["event"] for r in recs]
    assert "started" in events and "terminated" in events
    prog = [r for r in recs if r["event"] == "progress" and r["num_input_rows"]]
    assert prog, recs
    p = prog[0]
    assert p["name"] == "metrics_q"
    assert p["num_input_rows"] == 60
    assert p["sources"] and p["sources"][0]["num_input_rows"] == 60
    assert "triggerExecution" in p["duration_ms"]
    # the observe() custom metric rides along
    assert p["observed_metrics"]["route_metrics"]["routed"] == 60
    # state operator facts present for the streaming aggregation
    assert p["state_operators"] and p["state_operators"][0]["rows_total"] == 3
    term = [r for r in recs if r["event"] == "terminated"][0]
    assert term["exception"] is None

    summary = throughput_summary(recs)
    assert summary["metrics_q"]["rows"] == 60
    assert summary["metrics_q"]["batches"] >= 1
    assert summary["metrics_q"]["max_batch_ms"] > 0


def test_metrics_listener_multiple_queries_are_distinguished(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    (src / "a.jsonl").write_text(
        "\n".join(json.dumps({"v": i}) for i in range(10)) + "\n"
    )
    log = str(tmp_path / "metrics.jsonl")
    listener = attach_metrics(spark, log)
    try:
        stream = spark.readStream.schema("v long").json(str(src))
        qs = []
        for name in ("qa", "qb"):
            qs.append(
                stream.writeStream.format("memory").queryName(name)
                .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
                .trigger(availableNow=True)
                .start()
            )
        for q in qs:
            q.awaitTermination(120)
        assert _wait_for(lambda: sum(
            r["event"] == "terminated" for r in read_metrics(log)
        ) >= 2)
    finally:
        spark.streams.removeListener(listener)
    summary = throughput_summary(read_metrics(log))
    assert summary["qa"]["rows"] == 10 and summary["qb"]["rows"] == 10
