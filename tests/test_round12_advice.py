"""Round-12 ADVICE/VERDICT regression tests.

* exact ``dedup_containment`` quadratic-tail guard (VERDICT r11 item 3)
* skyline broadcast size guard (VERDICT r11 item 7)
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _template_corpus(spark, n_docs=60):
    """Fixed-vocab template corpus: every doc shares the same shingles,
    so the co-shingle candidate volume is the full n·(n-1)/2 clique —
    the measured quadratic case from SCALE.md §6t."""
    rows = [(i, "alpha beta gamma delta epsilon zeta") for i in range(n_docs)]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_containment_guard_trips_on_template_corpus(spark):
    from pulsar_ingestion_spark.operators.dedup import ngram_containment_pairs

    docs = _template_corpus(spark, 60)
    # 60 identical docs × 4 shingles → Σ df(df-1)/2 = 4 · 1770 = 7080
    with pytest.raises(ValueError, match="max_candidate_pairs"):
        ngram_containment_pairs(docs, threshold=0.6, n=3,
                                max_candidate_pairs=5_000)


def test_containment_guard_message_points_to_banded_cure(spark):
    from pulsar_ingestion_spark.operators.dedup import ngram_containment_pairs

    docs = _template_corpus(spark, 60)
    with pytest.raises(ValueError, match="dedup_containment_banded"):
        ngram_containment_pairs(docs, threshold=0.6, n=3,
                                max_candidate_pairs=0)


def test_containment_guard_passes_under_bound_and_none_skips(spark):
    from pulsar_ingestion_spark.operators.dedup import ngram_containment_pairs

    docs = _template_corpus(spark, 8)  # 4 · 28 = 112 candidates
    bounded = ngram_containment_pairs(docs, threshold=0.6, n=3,
                                      max_candidate_pairs=200).count()
    forced = ngram_containment_pairs(docs, threshold=0.6, n=3,
                                     max_candidate_pairs=None).count()
    assert bounded == forced == 28  # full clique of identical docs


def test_containment_registry_query_unchanged_at_sf0001(spark):
    """The guard must not change the registry id's output (the driver
    hash-checks it): default bound far above sf-test candidate volume."""
    import __spark_entry__ as e

    out = e.queries()["dedup_containment"](spark, "/root/testdata/sf0.001")
    assert out.count() >= 0  # runs clean under the default bound


def _brute_skyline(rows):
    out = []
    for pk, pr, sz in rows:
        dominated = any(
            (qr < pr and qs >= sz) or (qr <= pr and qs > sz)
            for _, qr, qs in rows
        )
        if not dominated:
            out.append((pk, pr, sz))
    return sorted(out)


def test_skyline_fallback_matches_broadcast_and_brute_force(spark):
    """Wide-domain fixture (VERDICT r11 item 7): prices span many
    integer-dollar buckets; forcing max_broadcast_rows=0 must take the
    shuffle + exclusive-running-max path and agree with both the
    broadcast plan and the quadratic definition."""
    import random

    from pulsar_ingestion_spark.queries_rank import skyline_2d

    rng = random.Random(12)
    rows = [
        (i, round(rng.uniform(1.0, 5000.0), 2), rng.randint(1, 50))
        for i in range(400)
    ]
    part = spark.createDataFrame(
        rows, "p_partkey bigint, p_retailprice double, p_size int"
    )
    bcast = sorted(
        tuple(r) for r in skyline_2d(part).collect()
    )
    shuffled = sorted(
        tuple(r) for r in skyline_2d(part, max_broadcast_rows=0).collect()
    )
    assert bcast == shuffled == _brute_skyline(rows)


def test_global_exclusive_running_max_matches_window(spark):
    """The range-partitioned exclusive prefix max == the single-partition
    window spelling, including the NULL first row and NULL values."""
    from pyspark.sql import Window
    from pulsar_ingestion_spark.operators.ranking import (
        global_exclusive_running_max,
    )

    rows = [(1, 5), (2, None), (3, 3), (4, 9), (5, None), (6, 7), (7, 1)]
    df = spark.createDataFrame(rows, "k int, v int")
    got = {
        r["k"]: r["m"]
        for r in global_exclusive_running_max(df, "k", "v", "m").collect()
    }
    w = (
        Window.orderBy("k")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    want = {
        r["k"]: r["m"]
        for r in df.withColumn("m", F.max("v").over(w)).collect()
    }
    assert got == want
    assert got[1] is None and got[7] == 9


def test_global_exclusive_running_max_empty_input(spark):
    from pulsar_ingestion_spark.operators.ranking import (
        global_exclusive_running_max,
    )

    df = spark.createDataFrame([], "k int, v int")
    out = global_exclusive_running_max(df, "k", "v", "m")
    assert out.count() == 0
    assert out.schema["m"].dataType.typeName() == "integer"


def test_global_exclusive_running_max_fuzz_vs_window(spark):
    """Property: for random value sequences (with NULLs and duplicates
    in the order column disallowed — the documented unique-order
    precondition) and random partition counts, the range-partitioned
    exclusive prefix max equals the single-partition window spelling."""
    import random

    from pyspark.sql import Window
    from pulsar_ingestion_spark.operators.ranking import (
        global_exclusive_running_max,
    )

    for seed in (3, 17, 42):
        rng = random.Random(seed)
        n = rng.randint(1, 60)
        keys = rng.sample(range(1000), n)
        rows = [
            (k, rng.choice([None, rng.randint(-50, 50)])) for k in keys
        ]
        df = spark.createDataFrame(rows, "k int, v int")
        for nparts in (1, 3, 8):
            got = {
                r["k"]: r["m"]
                for r in global_exclusive_running_max(
                    df, "k", "v", "m", num_partitions=nparts
                ).collect()
            }
            w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)
            want = {
                r["k"]: r["m"]
                for r in df.withColumn("m", F.max("v").over(w)).collect()
            }
            assert got == want, (seed, nparts)


def test_skyline_shuffle_path_fuzz_vs_brute(spark):
    """The shuffle fallback must equal brute force on random wide-domain
    fixtures across seeds, including duplicate prices/sizes."""
    import random

    from pulsar_ingestion_spark.queries_rank import skyline_2d

    for seed in (5, 23):
        rng = random.Random(seed)
        rows = [
            (i, round(rng.uniform(1.0, 300.0), 1), rng.randint(1, 12))
            for i in range(150)
        ]
        part = spark.createDataFrame(
            rows, "p_partkey bigint, p_retailprice double, p_size int"
        )
        shuffled = sorted(
            tuple(r) for r in skyline_2d(part, max_broadcast_rows=0).collect()
        )
        assert shuffled == _brute_skyline(rows), seed
