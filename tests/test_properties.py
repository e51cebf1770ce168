"""Property-based tests (hypothesis) for codec/normalization invariants —
the randomized layer the reference's test suite lacks (SURVEY.md §5)."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

# One shared strategy: epoch millis in a sane range (1990..2100), second-aligned
EPOCH_MS = st.integers(min_value=631_152_000, max_value=4_102_444_800).map(lambda s: s * 1000)


@settings(max_examples=20, deadline=None)
@given(ms=EPOCH_MS)
def test_iso_roundtrip_ms(spark, ms):
    """epoch_ms → ISO-8601 Z → epoch_ms is the identity (second precision)."""
    from pulsar_ingestion_spark.functions.timeutil import (
        epoch_millis_to_iso8601,
        iso8601_to_epoch_millis,
    )

    df = spark.createDataFrame([(ms,)], "ms long")
    row = df.select(
        epoch_millis_to_iso8601(F.col("ms")).alias("iso"),
    ).select(
        "iso", iso8601_to_epoch_millis(F.col("iso")).alias("back")
    ).collect()[0]
    assert row["back"] == ms
    # canonical form: trailing Z, second precision, matches python's UTC render
    expected = dt.datetime.fromtimestamp(ms / 1000, dt.timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")
    assert row["iso"] == expected


@settings(max_examples=15, deadline=None)
@given(s=st.text(min_size=0, max_size=12))
def test_enum_normalize_closed_set(spark, s):
    """normalize_enum output is ALWAYS in the closed set, any input."""
    from pulsar_ingestion_spark.functions.enums import normalize_enum

    df = spark.createDataFrame([(s,)], "x string")
    out = df.select(normalize_enum(F.col("x"), "ignitionStatus").alias("e")).collect()[0]["e"]
    assert out in {"ON", "OFF", "UNKNOWN"}
    if s.upper() in ("ON", "OFF"):
        assert out == s.upper()


@settings(max_examples=10, deadline=None)
@given(
    docs=st.lists(
        st.text(alphabet="ab c", min_size=1, max_size=30), min_size=1, max_size=8
    )
)
def test_dedup_exact_partition_invariant(spark, docs):
    """Exact dedup: group count == distinct text count, sum of dup_cnt ==
    row count — regardless of content."""
    from pulsar_ingestion_spark.operators.dedup import dedup_exact

    df = spark.createDataFrame([(i, t) for i, t in enumerate(docs)], "doc_id long, text string")
    out = dedup_exact(df).collect()
    assert len(out) == len(set(docs))
    assert sum(r["dup_cnt"] for r in out) == len(docs)


@settings(max_examples=20, deadline=None)
@given(ms=st.integers(min_value=631_152_000_000, max_value=4_102_444_800_000))
def test_iso_roundtrip_fractional_ms(spark, ms):
    """Non-whole-second instants render .SSS (ISO_OFFSET_DATE_TIME
    behavior) and roundtrip exactly — ADVICE r1: millis must not be
    silently truncated."""
    import datetime as dt

    from pulsar_ingestion_spark.functions.timeutil import (
        epoch_millis_to_iso8601,
        iso8601_to_epoch_millis,
    )

    df = spark.createDataFrame([(ms,)], "ms long")
    row = df.select(epoch_millis_to_iso8601(F.col("ms")).alias("iso")).select(
        "iso", iso8601_to_epoch_millis(F.col("iso")).alias("back")
    ).collect()[0]
    assert row["back"] == ms
    u = dt.datetime.fromtimestamp(ms / 1000, dt.timezone.utc)
    if ms % 1000 == 0:
        assert row["iso"] == u.strftime("%Y-%m-%dT%H:%M:%SZ")
    else:
        assert row["iso"] == u.strftime("%Y-%m-%dT%H:%M:%S.") + f"{ms % 1000:03d}Z"


def test_strict_iso_parse_rejects_lenient_forms(spark):
    """Instant.parse parity: offset-less / space-separated / date-only
    strings must NOT translate (the reference dead-letters them)."""
    from pulsar_ingestion_spark.functions.timeutil import iso8601_to_epoch_millis

    cases = [
        ("2023-10-26T10:00:00Z", True),
        ("2023-10-26T10:00:00.123Z", True),
        ("2023-10-26T10:00:00+02:00", True),
        ("2023-10-26 10:00:00", False),   # space separator, no offset
        ("2023-10-26T10:00:00", False),   # no offset
        ("2023-10-26", False),            # date only
        ("not a time", False),
    ]
    df = spark.createDataFrame([(s,) for s, _ in cases], "iso string")
    got = {r["iso"]: r["ms"] for r in df.select(
        "iso", iso8601_to_epoch_millis(F.col("iso")).alias("ms")).collect()}
    for s, ok in cases:
        assert (got[s] is not None) == ok, s


@settings(max_examples=10, deadline=None)
@given(
    toks=st.lists(st.integers(min_value=1, max_value=500), min_size=1, max_size=40),
    budget=st.sampled_from([64, 256, 1024]),
)
def test_pack_sequences_invariants(spark, toks, budget):
    """Contiguous packing invariants for any token-length distribution:
    (a) pack ids are dense from 0 within a stream; (b) a pack never holds
    more than budget tokens UNLESS a single document alone exceeds it;
    (c) assignment is independent of input row order."""
    from pyspark.sql import Window

    rows = [(i, t) for i, t in enumerate(toks)]
    df = spark.createDataFrame(rows, "doc_id long, tokens long")
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    start = F.sum("tokens").over(w) - F.col("tokens")
    packed = df.select(
        "doc_id", "tokens",
        F.floor(start / F.lit(float(budget))).cast("bigint").alias("pack_id"),
    )
    got = {r["doc_id"]: r for r in packed.collect()}
    # (c) shuffled input produces identical assignment
    import random

    shuffled = rows[:]
    random.Random(0).shuffle(shuffled)
    df2 = spark.createDataFrame(shuffled, "doc_id long, tokens long")
    packed2 = df2.select(
        "doc_id",
        F.floor((F.sum("tokens").over(w) - F.col("tokens")) / F.lit(float(budget)))
        .cast("bigint")
        .alias("pack_id"),
    )
    assert {r["doc_id"]: r["pack_id"] for r in packed2.collect()} == {
        k: v["pack_id"] for k, v in got.items()
    }
    # (a) packs start at 0 and are non-decreasing in doc order; ids are
    # dense when no single doc exceeds the budget (an oversize doc's
    # successor starts several budget-windows later, skipping ids)
    ordered = [got[i]["pack_id"] for i in sorted(got)]
    assert ordered[0] == 0
    assert all(a <= b for a, b in zip(ordered, ordered[1:]))
    if max(toks) <= budget:
        ids = sorted(set(ordered))
        assert ids == list(range(len(ids)))
    # (b) budget respected modulo oversize singletons: a pack's total starts
    # below budget only exceeds it via its LAST doc (contiguous fill) —
    # every doc's start offset lies inside its pack's budget window
    for r in got.values():
        pass  # start < (pack_id+1)*budget is definitional; checked via sums
    totals: dict[int, int] = {}
    for r in got.values():
        totals[r["pack_id"]] = totals.get(r["pack_id"], 0) + r["tokens"]
    for pid, tot in totals.items():
        docs_in = [r for r in got.values() if r["pack_id"] == pid]
        if tot > budget:
            # overflow only by the trailing doc that straddles the boundary
            assert tot - max(r["tokens"] for r in docs_in) < budget


@settings(max_examples=10, deadline=None)
@given(ids=st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=50, unique=True))
def test_split_assignment_is_stable_under_corpus_changes(spark, ids):
    """A document's split never depends on which OTHER documents exist."""
    bucket = lambda c: (  # noqa: E731
        F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast("bigint") % 100
    )
    df_all = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    df_half = spark.createDataFrame([(i,) for i in ids[: max(1, len(ids) // 2)]], "doc_id long")
    split_expr = (
        F.when(bucket(F.col("doc_id")) < 80, "train")
        .when(bucket(F.col("doc_id")) < 90, "validation")
        .otherwise("test")
    )
    all_map = {r["doc_id"]: r["s"] for r in df_all.select("doc_id", split_expr.alias("s")).collect()}
    half_map = {r["doc_id"]: r["s"] for r in df_half.select("doc_id", split_expr.alias("s")).collect()}
    assert all(all_map[k] == v for k, v in half_map.items())


@settings(max_examples=10, deadline=None)
@given(vals=st.lists(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False), min_size=1, max_size=30))
def test_ewma_fold_matches_pandas(spark, vals):
    """The F.aggregate EWMA fold must equal pandas' ewm(alpha, adjust=False)
    seeded at the first observation — the reference semantics."""
    import pandas as pd

    rows = [(0, i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "user_id long, seq long, value double")
    seq = df.groupBy("user_id").agg(
        F.sort_array(F.collect_list(F.struct("seq", "value"))).alias("s")
    )
    v = F.col("s").getField("value")
    ewma = F.aggregate(
        F.slice(v, 2, F.greatest(F.size(v) - 1, F.lit(0))),
        F.element_at(v, 1),
        lambda acc, x: F.lit(0.3) * x + F.lit(0.7) * acc,
    )
    got = seq.select(ewma.alias("e")).collect()[0]["e"]
    want = pd.Series(vals).ewm(alpha=0.3, adjust=False).mean().iloc[-1]
    assert abs(got - want) <= 1e-9 * max(1.0, abs(want))


def test_global_row_number_matches_unpartitioned_window(spark):
    """operators/ranking.py must reproduce the single-task window's exact
    row numbers (and therefore exact ntile) on arbitrary data."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from pulsar_ingestion_spark.operators.ranking import (
        global_row_number,
        ntile_from_row_number,
    )

    df = spark.range(0, 937).select(
        F.col("id"),
        (F.xxhash64(F.col("id")) % 97).alias("metric"),  # heavy ties
    )
    order = [F.desc("metric"), F.asc("id")]
    ranked, n = global_row_number(df, order, num_partitions=7)
    assert n == 937
    got = {r["id"]: (r["_rn"], ) for r in ranked.collect()}
    w = Window.orderBy(*order)
    want = {r["id"]: (r["rn"], ) for r in
            df.withColumn("rn", F.row_number().over(w).cast("long")).collect()}
    assert got == want
    tiles = {r["id"]: r["t"] for r in ranked.select(
        "id", ntile_from_row_number(F.col("_rn"), n, 5).alias("t")).collect()}
    wt = {r["id"]: r["t"] for r in df.withColumn(
        "t", F.ntile(5).over(w).cast("long")).collect()}
    assert tiles == wt
