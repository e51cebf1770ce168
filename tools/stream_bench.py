#!/usr/bin/env python
"""Micro-batch timing for the streaming maintainer modules (round 14,
VERDICT r13 item 5): the 16 ``streaming/`` modules had never been timed
by any harness — bench.py can only time batch-checkable plans, and the
maintainers are foreachBatch closures over driver-held model-sized
state.

This harness emulates Structured Streaming's foreachBatch loop exactly
the way the equivalence tests do (tests/test_streaming_*.py): the
source table is cut into N deterministic micro-batches
(``pmod(xxhash64(id), N) == i`` — the guide §2.5 deterministic-key
rule) and each maintainer's ``process(batch_df, batch_id)`` runs over
all cuts.  Reported per maintainer: total wall for all batches, the
per-batch list, and the first-batch/steady-state split (batch 0 pays
codegen).

NOT part of bench.py's driver contract — this writes its own sidecar
(``STREAM_BENCH.json``) and is additions-only evidence.

The window/stateful operators (tumbling/sliding/session/dedup,
ignition transitions) are NOT here: their batch-checkable plans are
already timed by bench.py as stream_* headline rows.

Usage: python tools/stream_bench.py [n_batches]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def cuts(df, id_col: str, n: int):
    """Deterministic micro-batch cuts: pmod(xxhash64(id), n)."""
    return [
        df.filter(F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(n)) == i)
        for i in range(n)
    ]


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pulsar_ingestion_spark.session import get_spark, load_tables

    spark = get_spark("stream-bench")
    spark.sparkContext.setLogLevel("ERROR")
    tabs = load_tables(spark, sf_dir)
    ev, docs, emb, li, orders = (
        tabs["events"], tabs["documents"], tabs["embeddings"],
        tabs["lineitem"], tabs["orders"],
    )
    # warm JVM + footers
    ev.count(); docs.count(); emb.count(); li.count(); orders.count()

    tmp = tempfile.mkdtemp(prefix="stream-bench-")
    results: dict[str, dict] = {}

    def run(name: str, make_process, batches, teardown=None):
        """Time process(batch, i) over every cut; state roots are fresh
        per maintainer so exactly-once watermarks never skip work."""
        process = make_process()
        per = []
        for i, b in enumerate(batches):
            t0 = time.perf_counter()
            process(b, i)
            per.append(round(time.perf_counter() - t0, 4))
        results[name] = {
            "total": round(sum(per), 4),
            "batch0": per[0],
            "steady_mean": round(sum(per[1:]) / max(1, len(per) - 1), 4),
            "per_batch": per,
        }
        if teardown:
            teardown()
        spark.catalog.clearCache()
        print(f"{name:<28} total {results[name]['total']:>7.2f}  "
              f"batch0 {per[0]:>6.2f}  steady {results[name]['steady_mean']:>6.3f}")

    ev_cuts = cuts(ev, "user_id", n_batches)
    doc_cuts = cuts(docs, "doc_id", n_batches)
    emb_cuts = cuts(emb, "vec_id", n_batches)
    li_cuts = cuts(li.withColumn("_id", F.monotonically_increasing_id()), "_id", n_batches)
    ord_cuts = cuts(orders, "o_orderkey", n_batches)

    # --- stateful (versioned-table) maintainers -------------------------
    from pulsar_ingestion_spark.streaming.ann_index import (
        stream_ann_index, stream_ivf_index, _write_ivf_centroids,
    )
    from pulsar_ingestion_spark.streaming.dedup_cascade import stream_dedup_cascade

    ann_root = os.path.join(tmp, "ann")
    run("ann_index", lambda: stream_ann_index(ann_root, app_id="sb", dim=64,
                                              num_planes=8), emb_cuts)

    ivf_root = os.path.join(tmp, "ivf")
    cents = [
        (r["vec_id"], r["embedding"])
        for r in emb.orderBy(F.md5(F.col("vec_id").cast("string")))
        .limit(16).collect()
    ]
    _write_ivf_centroids(ivf_root, cents)
    run("ivf_index", lambda: stream_ivf_index(ivf_root, app_id="sb",
                                              centroids=cents), emb_cuts)

    casc_root = os.path.join(tmp, "cascade")
    run("dedup_cascade", lambda: stream_dedup_cascade(casc_root, app_id="sb"),
        doc_cuts)

    # --- driver-state maintainers ---------------------------------------
    from pulsar_ingestion_spark.streaming.sketches import (
        CmsStreamMaintainer, HllStreamMaintainer, MgStreamMaintainer,
    )
    run("sketch_hll", lambda: HllStreamMaintainer("user_id"), ev_cuts)
    run("sketch_cms", lambda: CmsStreamMaintainer("event_type"), ev_cuts)
    run("sketch_mg", lambda: MgStreamMaintainer("event_type"), ev_cuts)

    from pulsar_ingestion_spark.streaming.skyline import SkylineStreamMaintainer
    run("skyline", lambda: SkylineStreamMaintainer("l_quantity", "l_extendedprice"),
        li_cuts)

    from pulsar_ingestion_spark.streaming.quantile import (
        QuantileLogbinsStreamMaintainer,
    )
    run("quantile_logbins", lambda: QuantileLogbinsStreamMaintainer("o_totalprice"),
        ord_cuts)

    from pulsar_ingestion_spark.streaming.sampler import WeightedSampleMaintainer
    run("weighted_sample", lambda: WeightedSampleMaintainer(
        "event_type", "user_id", "value"), ev_cuts)

    from pulsar_ingestion_spark.streaming.seasonal import SeasonalGridMaintainer
    run("seasonal_grid", lambda: SeasonalGridMaintainer(), ev_cuts)

    from pulsar_ingestion_spark.streaming.trend import TrendMonitor
    run("trend_monitor", lambda: TrendMonitor(), ev_cuts)

    from pulsar_ingestion_spark.streaming.mixture import MixturePlanMaintainer
    run("mixture_plan", lambda: MixturePlanMaintainer(), doc_cuts)

    from pulsar_ingestion_spark.streaming.profile import ProfileStreamMaintainer
    run("profile", lambda: ProfileStreamMaintainer(
        ["event_type", "user_id", "value"]), ev_cuts)

    from pulsar_ingestion_spark.streaming.dim_enrich import DimEnrichMaintainer
    run("dim_enrich", lambda: DimEnrichMaintainer(
        "o_custkey", "o_orderkey", ["o_totalprice"]).apply_dim_batch, ord_cuts)

    from pulsar_ingestion_spark.streaming.monitor import drift_monitor, histogram
    ref = histogram(ev.limit(10_000), "value", 10.0)
    alert_log = os.path.join(tmp, "alerts.jsonl")
    run("drift_monitor", lambda: drift_monitor(ref, "value", 10.0, alert_log),
        ev_cuts)

    shutil.rmtree(tmp, ignore_errors=True)
    out = {
        "sf_dir": sf_dir,
        "n_batches": n_batches,
        "parallelism": spark.sparkContext.defaultParallelism,
        "maintainers": results,
    }
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "STREAM_BENCH.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
