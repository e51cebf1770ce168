"""Driver-contract robustness: __spark_entry__ must work under a VANILLA
SparkSession (the driver builds its own — none of our session defaults)."""

from __future__ import annotations

import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="module")
def vanilla_spark(spark):
    # A second session from the same JVM with driver-like defaults:
    # non-UTC timezone, default shuffle partitions, no nanos conf.
    s = (
        spark.newSession()
    )
    s.conf.set("spark.sql.session.timeZone", "America/Chicago")
    s.conf.unset("spark.sql.legacy.parquet.nanosAsLong") if s.conf.get(
        "spark.sql.legacy.parquet.nanosAsLong", None
    ) else None
    return s


def test_entry_on_vanilla_session(vanilla_spark):
    import __spark_entry__ as e

    df = e.entry(vanilla_spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.schema.simpleString().startswith("struct<source_type:string,hour:timestamp")


def test_queries_oracle_keys_subset(vanilla_spark):
    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    assert set(oracles) <= set(qs)  # every oracle belongs to a query
    assert len(qs) >= 100


def test_iso_output_utc_under_foreign_tz(vanilla_spark):
    """The ISO-8601 Z invariant must hold even when the driver session
    runs in another timezone."""
    import __spark_entry__ as e
    from pyspark.sql import functions as F

    row = (
        e.queries()["ts_normalize"](vanilla_spark, "/root/testdata/sf0.001")
        .orderBy("event_id")
        .first()
    )
    # epoch 1704067207... → 2024-01-01T00:00:xxZ in UTC (not Chicago -6h)
    assert row["iso_utc"].startswith("2024-01-01T00:")


def test_rotation_covers_every_registered_id():
    """Rotation consistency: every registered query id is either already
    driver-checked (_CHECKED_PRIOR) or pinned in the current round's
    prefix (_ROUND13_PREFIX) — a new query registered without joining the
    prefix would silently strand without a driver CORRECTNESS row.
    (Round 9: the prefix is re-verification of the stalest r1/r2-era
    rows, so prefix ids may ALSO be in _CHECKED_PRIOR — that overlap is
    intentional and allowed.)"""
    import __spark_entry__ as e

    registered = set(e.queries())
    covered = set(e._CHECKED_PRIOR) | set(e._ROUND13_PREFIX)
    stranded = registered - covered
    assert not stranded, sorted(stranded)
    # every prefix id must actually exist in the registry
    ghost = set(e._ROUND13_PREFIX) - registered
    assert not ghost, sorted(ghost)
    # the driver checks ~50: the prefix must fit the bound
    assert len(e._ROUND13_PREFIX) <= 50, len(e._ROUND13_PREFIX)


def test_bench_stdout_line_fits_driver_tail_capture():
    """BENCH_r03..r08 all recorded "parsed": null because the stdout
    JSON line outgrew the driver's ~2000-char tail capture (round-9
    find).  Pin the compact-line transform bench.py uses to stay under
    the capture with margin, so adding headline queries can't silently
    break the driver's parse again."""
    import json
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_LOCAL.json")
    with open(path) as fh:
        d = json.loads(fh.read())
    compact = json.dumps(
        {
            "metric": d["metric"],
            "value": d["value"],
            "unit": "sec",
            "queries": {k: round(v, 2) for k, v in d["queries"].items()},
            "sf": d["sf"],
            # round 14: the scaling-probe contract field (VERDICT r13
            # item 2) — worst case "parallelism":128 = +19 chars
            "parallelism": 128,
        },
        separators=(",", ":"),
    )
    # The driver capture is EXACTLY 2000 chars (measured: every BENCH_rN
    # "tail" field is len 2000, ending with the JSON line + newline).
    # 1980 keeps ≥20 chars of margin for per-query second-digit growth.
    assert len(compact) < 1980, (
        f"compact bench line is {len(compact)} chars — the driver tail "
        "capture is 2000; trim the headline set or the precision"
    )
