"""dedup_embedding_blas scale probe (SCALE.md §6k, VERDICT r8 item 2).

Measures, on the base sf0.1 leg and a synthesized 10× leg:
  * per-block occupancy (blocks / mean / max / p99 / Σ block²) across a
    ``target_block`` sweep — the quadratic-term / hot-block check;
  * full-query wall across the same sweep — if the wall tracks
    Σ block², the matmul dominates; if it is flat, the linear
    row-movement term does;
  * a stage decomposition at the canonical target_block=512.

Usage: python tools/blas_probe.py [--synth-dir DIR]
(--synth-dir reuses an existing 10× synthesis; otherwise one is
written to a temp dir via tools/scalecurve.synthesize.)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scalecurve import BASE_SF, synthesize  # noqa: E402

SWEEP = (1024, 512, 256, 128)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--synth-dir", help="existing 10x synthesis to reuse")
    a = ap.parse_args()

    import pyspark.sql.functions as F

    from pulsar_ingestion_spark.operators.dedup import embedding_near_dups_blas
    from pulsar_ingestion_spark.operators.similarity import (
        auto_num_planes,
        signlsh_buckets,
    )
    from pulsar_ingestion_spark.session import get_spark

    if a.synth_dir:
        out = a.synth_dir
    else:
        out = tempfile.mkdtemp(prefix="blasprobe-")
        synthesize(out, 10)
        print(f"synthesized 10x at {out}", file=sys.stderr)

    spark = get_spark("blasprobe")
    spark.sparkContext.setLogLevel("ERROR")

    def eight_tables(emb, p, with_vec=True):
        rows = emb.select(F.col("vec_id").alias("rid"),
                          F.col("embedding").alias("rvec"))
        cols = ["bucket", "id"] + (["vec"] if with_vec else [])
        tables = None
        for t in range(8):
            bt = signlsh_buckets(
                rows, 64, p, id_col="rid", vec_col="rvec", seed=42 + 7919 * t
            ).select(F.lit(t).alias("tbl"), *cols)
            tables = bt if tables is None else tables.unionByName(bt)
        return tables

    def occupancy(emb, n, tb):
        p = auto_num_planes(n, target_block=tb, lo=3)
        s = (
            eight_tables(emb, p, with_vec=False)
            .groupBy("tbl", "bucket").count()
            .agg(F.count("*").alias("blocks"),
                 F.round(F.mean("count"), 1).alias("mean"),
                 F.max("count").alias("max"),
                 F.expr("percentile(count, 0.99)").alias("p99"),
                 F.sum(F.col("count") * F.col("count")).alias("sum_sq"))
            .collect()[0]
        )
        return p, s.asDict()

    def wall(emb, n, tb, runs=3):
        p = auto_num_planes(n, target_block=tb, lo=3)
        df = embedding_near_dups_blas(emb, threshold=0.4, num_planes=p,
                                      num_tables=8, exact_rescore=True)
        df.count()  # warm-up
        ts = []
        for _ in range(runs):
            t0 = time.perf_counter()
            c = df.count()
            ts.append(time.perf_counter() - t0)
        spark.catalog.clearCache()
        return p, round(min(ts), 3), c

    for sf_dir, label in ((BASE_SF, "base"), (out, "x10")):
        emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        n = emb.count()
        for tb in SWEEP:
            p, occ = occupancy(emb, n, tb)
            print(json.dumps({"leg": label, "n": n, "target_block": tb,
                              "planes": p, "occ": occ}))
        for tb in SWEEP:
            p, w, c = wall(emb, n, tb)
            print(json.dumps({"leg": label, "n": n, "target_block": tb,
                              "planes": p, "wall": w, "pairs": c}))
    spark.stop()


if __name__ == "__main__":
    main()
