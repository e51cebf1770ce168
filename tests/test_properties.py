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
