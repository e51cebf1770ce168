#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"<name>": sec, ...}, "sf": <sf>}

Each query is executed to completion (count() on the result — forces full
plan execution without driver-side materialization of wide results).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: one per engine area — scan, filter, join (shuffle + broadcast),
# agg, window fn, event-time window, translator pipeline, router, dedup,
# text analysis, similarity search.
HEADLINE = [
    "scan_project",
    "filter_pred",
    "join_inner_equi",
    "join_broadcast",
    "join_asof",
    "agg_group_sum_avg_min_max_count",
    "agg_count_distinct",
    "win_topk_per_group",
    "win_lag_lead",
    "warehouse_vehicle_gaps",
    "stream_tumbling_agg",
    "stream_sliding_agg",
    "stream_session_window",
    "stream_dedup",
    "cmf_translate_geotab",
    "cmf_translate_calamp",
    "cmf_translate_ford",
    "route_tenant",
    "dedup_exact",
    "dedup_fingerprint",
    "dedup_embedding_blas",
    "text_stats",
    "text_token_count",
    "text_gopher_quality",
    "corpus_pack_sequences",
    "corpus_curate",
    "corpus_assemble",
    "sim_search_knn",
    "stateful_transitions",
    "telemetry_trip_distance",
    "fleet_dashboard",
    "cmf_events_explode",
    "agg_rollup",
    "win_distribution",
    "agg_pivot",
    # round 3: statistical / time-series family
    "agg_stats_corr",
    "ts_gapfill_15m",
    "text_passage_dedup",
    "text_zipf_slope",
    # round 4: relational warehouse, corpus hygiene, sketches, in-plan ML
    "tpch_pricing_summary",
    "tpch_revenue_by_region",
    "text_line_dedup",
    "sketch_hll_portable",
    "join_bloom_pruned",
    "emb_pq_encode",
    # round 5: warehouse management, fact-fact joins, IR ranking, overlap
    "tpch_shipmode_priority",
    "warehouse_merge_upsert",
    "dq_constraint_audit",
    "text_bm25_topk",
    "events_user_overlap_jaccard",
    "text_ppl_buckets",
    # round 5c: graph analytics, mergeable sketches, CDC compaction, bigram LM
    "graph_triangle_count",
    "sketch_kmv_intersect",
    "warehouse_changelog_compact",
    "text_bigram_logprob",
    # round 6: BOM closure + windowed-MERGE conflict resolution, semantic
    # dedup, PQ ADC search
    "warehouse_bom_rollup",
    "warehouse_merge_resolve_conflicts",
    "dedup_semantic_cluster",
    "sim_search_pq_adc",
    # round 8: the distributed k-core peel (the round-7 heavy) and the
    # xxhash64 minhash variant (the production-cost sibling of
    # dedup_minhash_banded)
    "graph_kcore",
    "dedup_minhash_fast",
    # round 8b: rank statistics (keyed-running-sums ranks), ranking
    # metrics (distributed global deciles), LPA communities, Holt fold
    "stats_mann_whitney",
    "agg_gini",
    "ml_lift_deciles",
    "graph_label_propagation",
    "ts_holt_smooth",
    "text_pmi_collocations",
    # round 9: the most expensive tracked query (capped-wedge link
    # prediction, ~5 s base) belongs where regressions get caught every
    # round (VERDICT r8 item 5)
    "graph_jaccard_linkpred",
    # round 10: Welch two-sample t, t-closeness privacy audit,
    # pre-decode media payload dedup
    "stats_welch_ttest",
    "privacy_t_closeness",
    "multimodal_dedup_bytes",
    # round 11 session 4: the one NEW plan shape — the distributed
    # skyline (bucketed sort-scan vs the quadratic oracle).  The other
    # session-4 ids reuse already-benched shapes (weighted median rides
    # keyed_running_sums = stats_mann_whitney's shape) and live in
    # SCALE_CURVE.json instead: the driver's ~2000-char stdout tail
    # capture caps the headline set (see
    # test_bench_stdout_line_fits_driver_tail_capture).
    "rank_skyline_2d",
    # round 11 session 5: NO new headliner — a 74th id pushes the
    # compact stdout line to 1964 chars, past the driver-tail cap the
    # line-fit test pins (ts_stl_classical was added, measured 2.57 s /
    # geomean 1.026 vs session-4 on the 73 common ids, then moved back
    # to SCALE_CURVE.json §6x with the other session-5 ids: grid
    # windows 0.17/x at 10x).  The cap, not the shape, decides.
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf"))
    except ValueError:
        sf = -1.0

    import __spark_entry__ as entrymod
    from pulsar_ingestion_spark.session import get_spark

    spark = get_spark("bench")
    # Quiet stderr so the ONE JSON line survives the driver's tail capture
    # (BENCH_r03 lost its parsed field to log/progress noise — VERDICT r3
    # item 4; showConsoleProgress is already off in session defaults).
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()

    # Warm the JVM + parquet footers once so per-query numbers measure the
    # engine, not first-touch costs.
    queries["scan_project"](spark, sf_dir).count()

    # Each measured run times BUILD + EXECUTE of a fresh plan (round-12
    # methodology fix): the old build-once/re-count policy let queries
    # with EAGER build-time work — the iterative peels (k-core, k-truss,
    # BFS, DBSCAN, link prediction) materialize their loops via
    # localCheckpoint during plan CONSTRUCTION — report only the cheap
    # post-materialization count (measured: graph_kcore 13.8 s honest vs
    # 0.9 s count-only at sf0.1).  A fresh build per run also matches
    # the DuckDB oracle methodology (min-of-3 FULL runs), so the
    # Spark/DuckDB ratio compares like with like.  The first run is a
    # discarded warm-up (JIT/codegen compile); the next N are measured,
    # reporting min + sample variance (VERDICT r2 item 6).
    # SPARK_GRAFT_BENCH_REPEATS raises the measured-run count for a
    # canonical variance refresh (VERDICT r11 item 2: >=5 repeats when
    # re-baselining); the default 3 keeps the per-round driver run fast.
    measured = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    samples: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for it in range(measured + 1):
        for name in HEADLINE:
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).count()
            dt = round(time.perf_counter() - t0, 4)
            if it > 0:  # run 0 = warm-up, excluded
                samples[name].append(dt)
            # per-query persists (ranking/dedup machinery, checkpointed
            # peel loops) must not carry between runs or queries
            spark.catalog.clearCache()
    timings = {name: min(s) for name, s in samples.items()}
    import statistics

    variances = {
        name: round(statistics.variance(s), 6) if len(s) >= 2 else 0.0
        for name, s in samples.items()
    }

    # End-to-end pipeline throughput: loadgen 50k Geotab docs → batch
    # pipeline (translate → route → partitioned parquet) — the flagship
    # ingest path as one timed unit.
    import shutil
    import tempfile

    from pulsar_ingestion_spark.plans.pipeline import PipelineSpec, SourceSpec, run_pipeline
    from tools.loadgen import generate

    tmp = tempfile.mkdtemp(prefix="bench-pipeline-")
    try:
        generate(os.path.join(tmp, "in"), "geotab", rows=50_000, files=32)
        # Round 14 (VERDICT r13 item 6/8): min-of-N like every other row —
        # run 0 is a discarded warm-up, runs 1..N are measured; it was the
        # noisiest row in both the builder's and the driver's r13 runs
        # (±2× single-shot swings).  Fresh output dir per run (the parquet
        # sink appends), removed before the next run so every run does
        # identical work.  Additions-only: same key, same methodology
        # class as the query rows.
        psamples: list[float] = []
        for it in range(measured + 1):
            out_dir = os.path.join(tmp, f"out{it}")
            spec = PipelineSpec(
                sources=[SourceSpec(kind="jsonl", translator="geotab",
                                    options={"path": os.path.join(tmp, "in")})],
                output_path=out_dir,
            )
            t0 = time.perf_counter()
            run_pipeline(spark, spec, streaming=False)
            dt = round(time.perf_counter() - t0, 4)
            if it > 0:
                psamples.append(dt)
            spark.catalog.clearCache()
            shutil.rmtree(out_dir, ignore_errors=True)
        timings["pipeline_e2e_50k"] = min(psamples)
        variances["pipeline_e2e_50k"] = (
            round(statistics.variance(psamples), 6) if len(psamples) >= 2 else 0.0
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    total = round(sum(timings.values()), 4)
    # Effective parallelism of the session that ran the bench (VERDICT r13
    # item 2): the scaling probe was undiagnosable from the JSON — nothing
    # proved which core count actually ran.  sc.defaultParallelism is the
    # ground truth for local[N].
    parallelism = spark.sparkContext.defaultParallelism
    line = json.dumps(
        {
            "metric": "headline_queries_total_wall",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "var": variances,
            "sf": sf,
            "parallelism": parallelism,
            "shuffle_partitions": int(spark.conf.get("spark.sql.shuffle.partitions")),
            "sf_dir": sf_dir,
        }
    )
    # The driver parses the JSON from a ~2000-char TAIL capture of the
    # process output: BENCH_r03..r08 all recorded "parsed": null because
    # this line (with full-precision timings + the var dict) outgrew the
    # capture and the tail began mid-line.  stdout therefore gets a
    # COMPACT twin — same contract fields, 2-decimal per-query seconds
    # (3-decimal outgrew the capture at 72 queries), no whitespace, no
    # var — fits the capture with margin; the sidecar file keeps full
    # precision + var.
    stdout_line = json.dumps(
        {
            "metric": "headline_queries_total_wall",
            "value": total,
            "unit": "sec",
            "queries": {k: round(v, 2) for k, v in timings.items()},
            "sf": sf,
            # scaling-probe contract (VERDICT r13 item 2): +~17 chars, the
            # 2000-char tail capture still holds the line with margin (the
            # line-fit test pins it)
            "parallelism": parallelism,
        },
        separators=(",", ":"),
    )
    # Belt and braces for the driver's parse: the JSON goes to stdout AND
    # to a file, so a truncated tail capture can't lose the round's number.
    # Only the canonical config (default SF dir, no CPU override) may
    # overwrite the committed headline file — an ad-hoc smoke run at
    # sf0.01/4-cpus must not silently clobber it (ADVICE r4).
    canonical = (
        "SPARK_GRAFT_SF_DIR" not in os.environ
        and "SPARK_GRAFT_CPUS" not in os.environ
        and "SPARK_GRAFT_SHUFFLE" not in os.environ
    )
    sidecar = "BENCH_LOCAL.json" if canonical else "BENCH_LOCAL_adhoc.json"
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), sidecar), "w") as fh:
        fh.write(line + "\n")
    print(stdout_line)


if __name__ == "__main__":
    main()
