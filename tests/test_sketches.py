"""Sketch-guarantee tests: the mathematical invariants each sketch
promises, checked against exact answers on the testdata (and, for the
bloom filter, on hypothesis-generated key sets).

The oracle gate (`tools/selfcheck.py`) proves the sketches are built
EXACTLY as declared; these tests prove the declared construction has
the properties that make it useful — CMS never undercounts, a bloom
filter never false-negatives, HLL lands within its standard-error
envelope.
"""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_cms_never_undercounts(spark, sf_dir):
    """Count-min guarantee: estimate >= exact for every key."""
    from pulsar_ingestion_spark.queries_sketch import q_sketch_countmin

    rows = q_sketch_countmin(spark, sf_dir).collect()
    assert rows, "CMS produced no keys"
    for r in rows:
        assert r["cms_est"] >= r["exact_cnt"], r


def test_hll_within_error_envelope(spark, sf_dir):
    """HLL(m=64) standard error is 1.04/sqrt(64) = 13%; the estimate must
    land within 3 sigma of the exact distinct count (the testdata
    cardinalities are far above the small-range correction regime)."""
    from pulsar_ingestion_spark.queries_sketch import q_sketch_hll_portable

    r = q_sketch_hll_portable(spark, sf_dir).collect()[0]
    rel_err = abs(r["hll_estimate"] - r["exact_distinct"]) / r["exact_distinct"]
    assert rel_err <= 3 * 1.04 / math.sqrt(64), (r, rel_err)


def test_bloom_word_popcount_consistent(spark, sf_dir):
    """The packed words' set-bit counts must equal the per-word position
    counts the same query reports (internal consistency of the packing)."""
    from pulsar_ingestion_spark.queries_sketch import q_sketch_bloom_build

    for r in q_sketch_bloom_build(spark, sf_dir).collect():
        assert bin(r["word_bits"] & 0xFFFFFFFF).count("1") == r["bits_set"], r
        assert 0 <= r["word_idx"] < 64  # 2048 bits / 32-bit words


@settings(max_examples=5, deadline=None)
@given(keys=st.sets(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=200))
def test_bloom_no_false_negatives(spark, keys):
    """Every inserted key must pass the k-probe membership test against
    the built words — the property that makes the bloom-pruned semi-join
    EXACT (false positives die in the exact join; false negatives would
    silently drop matches and cannot exist)."""
    from pulsar_ingestion_spark.queries_sketch import _BLOOM_BITS, _BLOOM_K

    df = spark.createDataFrame([(k,) for k in sorted(keys)], "k long")
    pos = (
        df.select(F.explode(F.array([F.lit(i) for i in range(_BLOOM_K)])).alias("i"), "k")
        .select(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("bf"), F.col("i").cast("string"),
                                   F.lit(":"), F.col("k").cast("string"))), 1, 8
                ), 16, 10,
            ).cast("bigint").__mod__(_BLOOM_BITS).alias("pos")
        )
    )
    words = {
        r["word_idx"]: r["word_bits"]
        for r in pos.groupBy(F.expr("pos div 32").alias("word_idx"))
        .agg(F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT)))")
             .alias("word_bits"))
        .collect()
    }
    # membership check in plain python against the built words
    import hashlib

    for k in keys:
        for i in range(_BLOOM_K):
            h = int(hashlib.md5(f"bf{i}:{k}".encode()).hexdigest()[:8], 16) % _BLOOM_BITS
            assert words.get(h // 32, 0) & (1 << (h % 32)), (k, i)
