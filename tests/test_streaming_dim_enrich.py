"""Streaming dimension enrichment (streaming/dim_enrich.py): the
latest-wins snapshot must equal the batch changelog collapse for any
micro-batch cut and any delivery order; replay is idempotent; a lower
version never overwrites a higher one; the key guard fires."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

CHANGELOG = [
    # (user_id, version, tier)
    (1, 1, "bronze"), (1, 2, "silver"), (1, 3, "gold"),
    (2, 1, "bronze"), (2, 2, "gold"),
    (3, 5, "silver"),
]


def _expected_latest():
    best = {}
    for k, v, p in CHANGELOG:
        if k not in best or v > best[k][0]:
            best[k] = (v, p)
    return {k: (v, p) for k, (v, p) in best.items()}


def test_latest_wins_any_batch_split_and_order(spark):
    from pulsar_ingestion_spark.streaming.dim_enrich import DimEnrichMaintainer

    want = _expected_latest()
    splits = [
        [CHANGELOG],                      # one batch
        [CHANGELOG[:3], CHANGELOG[3:]],   # two batches
        [list(reversed(CHANGELOG))],      # reversed delivery
        [CHANGELOG[3:], CHANGELOG[:3]],   # out-of-order batches
    ]
    for i, batches in enumerate(splits):
        m = DimEnrichMaintainer("user_id", "version", ["tier"])
        for bid, rows in enumerate(batches):
            m.apply_dim_batch(
                spark.createDataFrame(
                    rows, "user_id int, version int, tier string"
                ),
                bid,
            )
        got = {k: v_and_p for k, v_and_p in (
            (k, (ver, payload[0])) for k, (ver, payload) in m._state.items()
        )}
        assert got == want, i


def test_replay_and_stale_version_are_noops(spark):
    from pulsar_ingestion_spark.streaming.dim_enrich import DimEnrichMaintainer

    m = DimEnrichMaintainer("user_id", "version", ["tier"])
    df = spark.createDataFrame(CHANGELOG, "user_id int, version int, tier string")
    m.apply_dim_batch(df, 0)
    state1 = dict(m._state)
    m.apply_dim_batch(df, 0)  # replay
    assert m._state == state1
    stale = spark.createDataFrame(
        [(1, 1, "bronze")], "user_id int, version int, tier string"
    )
    m.apply_dim_batch(stale, 1)  # lower version — must not regress
    assert m._state == state1


def test_enrich_matches_batch_changelog_collapse(spark):
    from pulsar_ingestion_spark.streaming.dim_enrich import DimEnrichMaintainer

    m = DimEnrichMaintainer("user_id", "version", ["tier"])
    df = spark.createDataFrame(CHANGELOG, "user_id int, version int, tier string")
    m.apply_dim_batch(df, 0)
    facts = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 3), (13, 4)], "event_id int, user_id int"
    )
    out = {
        r["event_id"]: (r["tier"], r["dim_version"])
        for r in m.enrich(facts).collect()
    }
    assert out[10] == ("gold", 3)
    assert out[11] == ("gold", 2)
    assert out[12] == ("silver", 5)
    assert out[13] == (None, None)  # unmatched fact keeps NULL payload
    # plan check: the snapshot side must be broadcast
    plan = m.enrich(facts)._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan


def test_empty_snapshot_enrich_keeps_schema(spark):
    from pulsar_ingestion_spark.streaming.dim_enrich import DimEnrichMaintainer

    m = DimEnrichMaintainer("user_id", "version", ["tier"])
    facts = spark.createDataFrame([(10, 1)], "event_id int, user_id int")
    out = m.enrich(facts)
    assert set(out.columns) == {"event_id", "user_id", "tier", "dim_version"}
    r = out.first()
    assert r["tier"] is None and r["dim_version"] is None


def test_key_guard_fires(spark):
    from pulsar_ingestion_spark.streaming.dim_enrich import DimEnrichMaintainer

    m = DimEnrichMaintainer("user_id", "version", ["tier"], max_keys=2)
    df = spark.createDataFrame(
        [(i, 1, "x") for i in range(5)], "user_id int, version int, tier string"
    )
    with pytest.raises(ValueError, match="max_keys"):
        m.apply_dim_batch(df, 0)
