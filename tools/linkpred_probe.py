"""graph_jaccard_linkpred verify-plan probe (SCALE.md 6m).

Compares the shipped array_intersect verify against a narrow-rows
equi-join verify (common-neighbor COUNT via candidates x bidir(u) x
bidir(w)) at the base and a saved 100x synthesis.  Measured round 9:
the rows plan is 2.5x slower at base and OOMs an 8 GB JVM at 100x
(candidates x degree row expansion) - the array form stays.  Kept so
the negative result is reproducible.

Usage: python tools/linkpred_probe.py <x100-synth-dir>
"""
import sys, os, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
X100_DIR = sys.argv[1] if len(sys.argv) > 1 else '/tmp/scalecurve-x100'
from pulsar_ingestion_spark.session import get_spark, load_tables, fan_out
from pulsar_ingestion_spark.queries_graph import _cooc_edges, _LP_CAP, _LP_TOPK, jaccard_linkpred

import pyspark.sql.functions as F
from pyspark.sql import Window

spark = get_spark('lpx'); spark.sparkContext.setLogLevel('ERROR')

def jaccard_linkpred_rows(edges, cap, topk):
    """Narrow-rows verify: common-neighbor COUNT via equi-join instead of
    per-pair adjacency arrays."""
    bidir = edges.select(F.col("u").alias("node"), F.col("v").alias("nbr")).unionAll(
        edges.select(F.col("v").alias("node"), F.col("u").alias("nbr"))
    ).persist()
    wcap = Window.partitionBy("node").orderBy(
        F.conv(F.substring(F.md5(F.col("nbr").cast("string")), 1, 8), 16, 10)
        .cast("bigint"),
        F.asc("nbr"),
    )
    capped = (
        bidir.withColumn("rn", F.row_number().over(wcap))
        .filter(F.col("rn") <= cap)
        .drop("rn")
    )
    a, b = capped.alias("a"), capped.alias("b")
    wedges = (
        a.join(b, (F.col("a.node") == F.col("b.node"))
               & (F.col("a.nbr") < F.col("b.nbr")))
        .select(F.col("a.nbr").alias("u"), F.col("b.nbr").alias("w"))
        .distinct()
    )
    cands = wedges.join(
        edges, (wedges["u"] == edges["u"]) & (wedges["w"] == edges["v"]),
        "left_anti",
    ).persist()
    bu, bw = bidir.alias("bu"), bidir.alias("bw")
    cn = (
        cands.join(bu, F.col("u") == F.col("bu.node"))
        .join(bw, (F.col("w") == F.col("bw.node"))
              & (F.col("bu.nbr") == F.col("bw.nbr")))
        .groupBy("u", "w").agg(F.count(F.lit(1)).alias("cn"))
    )
    deg = bidir.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("ud"))
    dw = deg.select(F.col("node").alias("w"), F.col("deg").alias("wd"))
    inter = F.coalesce(F.col("cn"), F.lit(0))
    scored = (
        cands.join(cn, ["u", "w"], "left")
        .join(du, "u").join(dw, "w")
        .select(
            "u", "w",
            inter.cast("bigint").alias("common_neighbors"),
            F.round(
                inter.cast("double") / (F.col("ud") + F.col("wd") - inter), 6
            ).alias("jaccard"),
        )
    )
    return scored.orderBy(F.desc("jaccard"), F.asc("u"), F.asc("w")).limit(topk)

for sf_dir, label in (('/root/testdata/sf0.1','base'), (X100_DIR,'x100')):
    ev = fan_out(load_tables(spark, sf_dir)["events"], spark)
    edges = _cooc_edges(ev).persist()
    for name, fn in (("rows", jaccard_linkpred_rows), ("arrays", jaccard_linkpred)):
        df = fn(edges, _LP_CAP, _LP_TOPK)
        t0=time.perf_counter(); rows0 = df.collect(); warm=time.perf_counter()-t0
        ts=[]
        for _ in range(2):
            t0=time.perf_counter(); df.collect(); ts.append(time.perf_counter()-t0)
        print(json.dumps({'leg':label,'plan':name,'warm':round(warm,2),'wall':round(min(ts),2)}))
        if name=="rows": saved=rows0
        else:
            same = [tuple(r) for r in saved]==[tuple(r) for r in rows0]
            print(json.dumps({'leg':label,'outputs_identical':same}))
        spark.catalog.clearCache()
        edges = _cooc_edges(fan_out(load_tables(spark, sf_dir)["events"], spark)).persist()
spark.stop()
