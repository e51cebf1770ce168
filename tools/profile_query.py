#!/usr/bin/env python
"""Per-query profiling for the optimization round: split BUILD (plan
construction incl. any eager driver actions) from EXECUTE (noop sink),
and report job/stage counts from the status tracker.

Usage: python tools/profile_query.py <query> [query ...]
       python tools/profile_query.py --top  # the default expensive set
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TOP = [
    "graph_jaccard_linkpred", "graph_label_propagation", "graph_triangle_count",
    "graph_kcore", "stats_mann_whitney", "text_pmi_collocations", "agg_gini",
    "text_ppl_buckets", "dedup_minhash_fast", "dedup_embedding_blas",
    "ml_lift_deciles", "text_bigram_logprob", "warehouse_merge_resolve_conflicts",
    "sim_search_pq_adc", "rank_skyline_2d", "warehouse_bom_rollup",
    "warehouse_changelog_compact", "text_zipf_slope", "dedup_semantic_cluster",
    "sketch_kmv_intersect", "text_line_dedup", "corpus_curate", "text_bm25_topk",
]


def main() -> None:
    names = sys.argv[1:]
    if names == ["--top"]:
        names = TOP

    import __spark_entry__ as entrymod
    from pulsar_ingestion_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    # Warm JVM + parquet footers
    queries["scan_project"](spark, sf_dir).count()
    spark.catalog.clearCache()

    st = spark.sparkContext.statusTracker()
    print(f"{'query':<36} {'build':>7} {'exec':>7} {'total':>7} {'jobs':>5}")
    for name in names:
        for attempt in range(2):  # second rep after warm codegen
            j0 = len(st.getJobIdsForGroup(None) or [])
            t0 = time.perf_counter()
            df = queries[name](spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            jobs = len(st.getJobIdsForGroup(None) or []) - j0
            spark.catalog.clearCache()
            if attempt == 1:
                print(f"{name:<36} {t1-t0:>7.2f} {t2-t1:>7.2f} {t2-t0:>7.2f} {jobs:>5}")


if __name__ == "__main__":
    main()
