"""Round-7 invariant tests: k-core peeling on known graphs, the
keyed-running-sums utility, and the re-planned drift_ks equivalence."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F


def test_kcore_peel_known_graph(spark):
    """Hand graph: triangle {1,2,3} + triangle {4,5,6} joined by bridge
    3-4, pendant 7 on 5, plus K4 {10,11,12,13}.  2-core drops only the
    pendant edge; 3-core = K4 alone (the bridge cascade dismantles both
    triangles); 4-core is empty."""
    from pulsar_ingestion_spark.queries_graph import _peel_to_kcore

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6), (4, 6), (5, 7),
         (10, 11), (10, 12), (10, 13), (11, 12), (11, 13), (12, 13)],
        "u long, v long",
    )
    core2 = _peel_to_kcore(edges, 2)
    assert core2.count() == 13  # all but (5,7)
    assert core2.filter((F.col("u") == 5) & (F.col("v") == 7)).count() == 0
    core3 = _peel_to_kcore(core2, 3)
    rows = {(r["u"], r["v"]) for r in core3.collect()}
    assert rows == {(10, 11), (10, 12), (10, 13), (11, 12), (11, 13), (12, 13)}
    core4 = _peel_to_kcore(core3, 4)
    assert core4.count() == 0


def test_kcore_fixpoint_is_stable(spark):
    """Peeling a k-core again at the same k is a no-op (fixpoint), and
    peeling at a higher k from the full graph equals the incremental
    path the query uses (cores are nested)."""
    from pulsar_ingestion_spark.queries_graph import _peel_to_kcore

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6), (4, 6), (5, 7),
         (10, 11), (10, 12), (10, 13), (11, 12), (11, 13), (12, 13)],
        "u long, v long",
    )
    core2 = _peel_to_kcore(edges, 2)
    again = _peel_to_kcore(core2, 2)
    assert {tuple(r) for r in again.collect()} == {
        tuple(r) for r in core2.collect()
    }
    direct3 = _peel_to_kcore(edges, 3)
    incr3 = _peel_to_kcore(core2, 3)
    assert {tuple(r) for r in direct3.collect()} == {
        tuple(r) for r in incr3.collect()
    }


def test_keyed_running_sums_matches_single_partition_window(spark):
    """keyed_running_sums (range partition + offsets) must be exactly the
    per-key unbounded-preceding window sum, for any partition count."""
    from pulsar_ingestion_spark.operators.ranking import keyed_running_sums

    rows = [(k, float(v), v % 3, (v * 7) % 5)
            for k in ("a", "b", "c") for v in range(40)]
    df = spark.createDataFrame(rows, "k string, val double, x long, y long")
    out, totals = keyed_running_sums(df, ["k"], [F.col("val")], ["x", "y"],
                                     num_partitions=7)
    w = (
        Window.partitionBy("k").orderBy("val")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ref = df.select(
        "k", "val",
        F.sum("x").over(w).alias("cum_x"), F.sum("y").over(w).alias("cum_y"),
    )
    got = {(r["k"], r["val"]): (r["cum_x"], r["cum_y"]) for r in out.collect()}
    want = {(r["k"], r["val"]): (r["cum_x"], r["cum_y"]) for r in ref.collect()}
    assert got == want
    tot = {r["k"]: (r["total_x"], r["total_y"]) for r in totals.collect()}
    # x: Σ v%3 over 0..39 = 39; y: Σ (7v)%5 = Σ (2v)%5 cycles 0,2,4,1,3 = 80
    assert tot == {"a": (39, 80), "b": (39, 80), "c": (39, 80)}


def test_keyed_running_sums_empty_input(spark):
    from pulsar_ingestion_spark.operators.ranking import keyed_running_sums

    df = spark.createDataFrame([], "k string, val double, x long")
    out, totals = keyed_running_sums(df, ["k"], [F.col("val")], ["x"])
    assert out.count() == 0
    assert totals.count() == 0
