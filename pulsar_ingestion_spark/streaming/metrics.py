"""Streaming metrics export: a ``StreamingQueryListener`` that lands
every query's per-batch progress as JSONL records an operator (or a
Grafana-style dashboard) can tail.

The reference only ever log-lines its per-batch counts (the translator
consumers print processed/routed counts; its Grafana dashboard ships as
an empty placeholder — deployment/grafana pulsar-overview.json), so the
observability surface a production pipeline actually needs is exactly
what Structured Streaming already computes per micro-batch:
input/processed rates, batch durations, state-store sizes, watermark,
and any ``df.observe(...)`` custom metrics (plans/pipeline.py attaches
``route_metrics`` with routed + distinct-tenant counts).  This module
exports that stream of facts instead of letting it die in the driver
log.

Scale notes: the listener runs driver-side on the ALREADY-AGGREGATED
per-batch progress object — O(1) per micro-batch regardless of data
volume, no executor involvement, no extra jobs.  The JSONL sink is a
stand-in for a metrics topic / TSDB push; records are self-contained so
any collector can ship them.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.streaming import StreamingQueryListener


def _compact_progress(p: dict) -> dict:
    """Flatten a QueryProgress json into the fields a dashboard charts.
    Keeps observedMetrics verbatim (custom per-batch counters)."""
    return {
        "event": "progress",
        "query_id": p.get("id"),
        "run_id": p.get("runId"),
        "name": p.get("name"),
        "batch_id": p.get("batchId"),
        "timestamp": p.get("timestamp"),
        "num_input_rows": p.get("numInputRows"),
        "input_rows_per_sec": p.get("inputRowsPerSecond"),
        "processed_rows_per_sec": p.get("processedRowsPerSecond"),
        "duration_ms": p.get("durationMs", {}),
        "state_operators": [
            {
                "operator": s.get("operatorName"),
                "rows_total": s.get("numRowsTotal"),
                "rows_updated": s.get("numRowsUpdated"),
                "memory_bytes": s.get("memoryUsedBytes"),
            }
            for s in p.get("stateOperators", [])
        ],
        "sources": [
            {
                "description": s.get("description"),
                "num_input_rows": s.get("numInputRows"),
            }
            for s in p.get("sources", [])
        ],
        "watermark": (p.get("eventTime") or {}).get("watermark"),
        "observed_metrics": p.get("observedMetrics", {}),
    }


class JsonlMetricsListener(StreamingQueryListener):
    """Append one JSONL record per streaming lifecycle event to ``path``:

    * ``{"event": "started", ...}`` on query start;
    * ``{"event": "progress", ...}`` per micro-batch (rates, durations,
      state sizes, watermark, observed metrics);
    * ``{"event": "terminated", ...}`` with the exception, if any.

    Driver-side and O(1) per batch — safe to leave attached in
    production.  Attach with :func:`attach_metrics`.
    """

    def __init__(self, path: str):
        self.path = path

    def _emit(self, rec: dict) -> None:
        # one os-level append per micro-batch; atomic for line-sized
        # writes, and a crashed driver loses at most the in-flight line
        with open(self.path, "a") as fh:
            fh.write(json.dumps(rec) + "\n")

    def onQueryStarted(self, event) -> None:
        self._emit({
            "event": "started",
            "query_id": str(event.id),
            "run_id": str(event.runId),
            "name": event.name,
            "timestamp": event.timestamp,
        })

    def onQueryProgress(self, event) -> None:
        self._emit(_compact_progress(json.loads(event.progress.json)))

    def onQueryIdle(self, event) -> None:
        pass  # idle ticks carry no new facts worth a record

    def onQueryTerminated(self, event) -> None:
        self._emit({
            "event": "terminated",
            "query_id": str(event.id),
            "run_id": str(event.runId),
            "exception": event.exception,
        })


def attach_metrics(spark, path: str) -> JsonlMetricsListener:
    """Create, register, and return a :class:`JsonlMetricsListener`.
    Detach with ``spark.streams.removeListener(listener)``."""
    listener = JsonlMetricsListener(path)
    spark.streams.addListener(listener)
    return listener


def read_metrics(path: str) -> list[dict]:
    """Parse the JSONL metrics log back (operator tooling / tests)."""
    if not os.path.exists(path):
        return []
    with open(path) as fh:
        return [json.loads(line) for line in fh if line.strip()]


def throughput_summary(records: list[dict]) -> dict[str, dict]:
    """Per-query-name rollup of the progress records: batches, rows,
    mean processed rate, max batch duration — the numbers an operator
    checks first when a pipeline lags."""
    out: dict[str, dict] = {}
    for r in records:
        if r.get("event") != "progress":
            continue
        name = r.get("name") or r.get("query_id")
        s = out.setdefault(
            name,
            {"batches": 0, "rows": 0, "rates": [], "max_batch_ms": 0},
        )
        s["batches"] += 1
        s["rows"] += r.get("num_input_rows") or 0
        if r.get("processed_rows_per_sec"):
            s["rates"].append(r["processed_rows_per_sec"])
        trig = (r.get("duration_ms") or {}).get("triggerExecution") or 0
        s["max_batch_ms"] = max(s["max_batch_ms"], trig)
    for s in out.values():
        rates = s.pop("rates")
        s["mean_processed_rows_per_sec"] = (
            round(sum(rates) / len(rates), 2) if rates else None
        )
    return out
