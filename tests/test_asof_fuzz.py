"""As-of join parity fuzz: the union-sort plan (operators/joins.py,
the machinery behind join_asof) vs DuckDB's NATIVE ``ASOF JOIN`` — an
independent implementation of the same contract (the registry oracle
uses the equi-join + max spelling, so this is a THIRD algorithm
agreeing).  Hypothesis draws left/right filters, key-density mods and
the inclusive/exclusive bound; every draw must produce the identical
(left row, matched right timestamp) multiset.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, Phase, given, settings
from hypothesis import strategies as st

SF_DIR = "/root/testdata/sf0.001"
TYPES = ["click", "error", "purchase", "signup", "view"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF_DIR}/events.parquet')"
    )
    return con


def _spark_asof(spark, ltype, lmod, rtype, rval, inclusive):
    from pyspark.sql import functions as F

    from pulsar_ingestion_spark.operators.joins import asof_backward
    from pulsar_ingestion_spark.session import load_tables

    ev = load_tables(spark, SF_DIR)["events"]
    left = ev.filter(
        (F.col("event_type") == ltype) & (F.col("user_id") % lmod == 0)
    ).select("event_id", "user_id", "ts")
    right = ev.filter(
        (F.col("event_type") == rtype) & (F.col("value") >= rval)
    ).select("user_id", F.col("ts").alias("rts"))
    out = asof_backward(
        left, right, on="user_id", left_ts="ts", right_ts="rts",
        inclusive=inclusive,
    )
    return sorted(
        (int(r["event_id"]), str(r["matched_ts"]))
        for r in out.select("event_id", "matched_ts").collect()
    )


def _duck_asof(duck, ltype, lmod, rtype, rval, inclusive):
    op = ">=" if inclusive else ">"
    rows = duck.execute(f"""
        SELECT l.event_id, r.ts AS matched_ts
        FROM (SELECT event_id, user_id, ts FROM events
              WHERE event_type = '{ltype}' AND user_id % {lmod} = 0) l
        ASOF JOIN (SELECT user_id, ts FROM events
                   WHERE event_type = '{rtype}' AND value >= {rval}) r
          ON l.user_id = r.user_id AND l.ts {op} r.ts
    """).fetchall()
    return sorted((int(e), str(t)) for e, t in rows)


@settings(
    max_examples=25, deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
    phases=[Phase.generate, Phase.shrink],
)
@given(
    ltype=st.sampled_from(TYPES),
    lmod=st.integers(min_value=1, max_value=5),
    rtype=st.sampled_from(TYPES),
    rval=st.sampled_from([0, 100, 300, 450]),
    inclusive=st.booleans(),
)
def test_asof_backward_matches_native_asof_join(
    spark, duck, ltype, lmod, rtype, rval, inclusive
):
    s = _spark_asof(spark, ltype, lmod, rtype, rval, inclusive)
    d = _duck_asof(duck, ltype, lmod, rtype, rval, inclusive)
    assert s == d, (ltype, lmod, rtype, rval, inclusive, len(s), len(d))


def test_asof_self_match_inclusive_exclusive(spark, duck):
    """ltype == rtype: inclusive lets every surviving left row match
    ITSELF (matched_ts == own ts for rows passing both filters);
    exclusive must match strictly earlier."""
    s_inc = _spark_asof(spark, "purchase", 1, "purchase", 0, True)
    d_inc = _duck_asof(duck, "purchase", 1, "purchase", 0, True)
    assert s_inc == d_inc
    s_exc = _spark_asof(spark, "purchase", 1, "purchase", 0, False)
    d_exc = _duck_asof(duck, "purchase", 1, "purchase", 0, False)
    assert s_exc == d_exc
    # exclusive is a strict subset of inclusive match-keys
    assert {e for e, _ in s_exc} <= {e for e, _ in s_inc}
    assert len(s_exc) < len(s_inc)


def test_asof_empty_right_yields_empty(spark):
    from pyspark.sql import functions as F

    from pulsar_ingestion_spark.operators.joins import asof_backward
    from pulsar_ingestion_spark.session import load_tables

    ev = load_tables(spark, SF_DIR)["events"]
    left = ev.select("event_id", "user_id", "ts")
    right = ev.filter(F.col("value") < -1).select(
        "user_id", F.col("ts").alias("rts")
    )
    out = asof_backward(left, right, on="user_id", left_ts="ts", right_ts="rts")
    assert out.count() == 0


def test_asof_reserved_column_names_rejected(spark):
    from pyspark.sql import functions as F

    from pulsar_ingestion_spark.operators.joins import asof_backward
    from pulsar_ingestion_spark.session import load_tables

    ev = load_tables(spark, SF_DIR)["events"]
    left = ev.select("event_id", "user_id", "ts",
                     F.lit(0).alias("matched_ts"))
    right = ev.select("user_id", F.col("ts").alias("rts"))
    with pytest.raises(ValueError, match="reserved"):
        asof_backward(left, right, on="user_id", left_ts="ts", right_ts="rts")


def test_asof_tolerance_equals_filtered_native(spark, duck):
    """Tolerance as-of (match only within max_gap) == plain backward
    as-of followed by a gap filter, because any OLDER candidate is
    strictly farther — checked against DuckDB's native ASOF JOIN with
    the same post-filter, at three gap widths."""
    from pyspark.sql import functions as F

    from pulsar_ingestion_spark.operators.joins import asof_backward
    from pulsar_ingestion_spark.session import load_tables

    ev = load_tables(spark, SF_DIR)["events"]
    left = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    right = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("rts")
    )
    base = asof_backward(left, right, on="user_id", left_ts="ts",
                         right_ts="rts")
    for gap_s in (3600, 86400, 7 * 86400):
        s = sorted(
            (int(r["event_id"]), str(r["matched_ts"]))
            for r in base.filter(
                F.unix_micros("ts") - F.unix_micros("matched_ts")
                <= gap_s * 1_000_000
            ).collect()
        )
        d = sorted(
            (int(e), str(t))
            for e, t in duck.execute(f"""
                SELECT l.event_id, r.ts FROM
                  (SELECT event_id, user_id, ts FROM events
                   WHERE event_type = 'purchase') l
                ASOF JOIN
                  (SELECT user_id, ts FROM events
                   WHERE event_type = 'click') r
                  ON l.user_id = r.user_id AND l.ts >= r.ts
                WHERE epoch_us(l.ts) - epoch_us(r.ts) <= CAST({gap_s} AS BIGINT) * 1000000
            """).fetchall()
        )
        assert s == d, gap_s
    # sanity: wider gaps never lose matches
    n = [base.filter(
            F.unix_micros("ts") - F.unix_micros("matched_ts")
            <= g * 1_000_000).count() for g in (3600, 86400, 7 * 86400)]
    assert n[0] <= n[1] <= n[2]


def test_asof_null_keys_and_null_ts_never_match(spark, duck):
    """NULL join keys / NULL timestamps never match (ADVICE r11): the
    window-partition plan would otherwise co-group NULL keys into one
    partition and let a NULL-key left row see a NULL-key right row.
    Parity-checked against DuckDB's native ASOF JOIN on a fixture where
    every null placement appears."""
    from pulsar_ingestion_spark.operators.joins import asof_backward

    lrows = [
        (1, 10, 100), (2, None, 100), (3, 10, None), (4, None, None),
        (5, 20, 50), (6, 20, 500),
    ]
    rrows = [
        (10, 90), (10, None), (None, 80), (None, None), (20, 400),
    ]
    left = spark.createDataFrame(lrows, "event_id int, k int, t int")
    right = spark.createDataFrame(rrows, "k int, rt int")
    out = asof_backward(left, right, on="k", left_ts="t", right_ts="rt")
    s = sorted(
        (r["event_id"], r["matched_ts"])
        for r in out.select("event_id", "matched_ts").collect()
    )
    duck.execute("CREATE OR REPLACE TABLE nl (event_id INT, k INT, t INT)")
    duck.execute("CREATE OR REPLACE TABLE nr (k INT, rt INT)")
    duck.executemany("INSERT INTO nl VALUES (?, ?, ?)", lrows)
    duck.executemany("INSERT INTO nr VALUES (?, ?)", rrows)
    d = sorted(duck.execute(
        "SELECT l.event_id, r.rt FROM nl l "
        "ASOF JOIN nr r ON l.k = r.k AND l.t >= r.rt"
    ).fetchall())
    assert s == d == [(1, 90), (6, 400)]


def _spark_asof_fwd(spark, ltype, lmod, rtype, rval, inclusive):
    from pyspark.sql import functions as F

    from pulsar_ingestion_spark.operators.joins import asof_forward
    from pulsar_ingestion_spark.session import load_tables

    ev = load_tables(spark, SF_DIR)["events"]
    left = ev.filter(
        (F.col("event_type") == ltype) & (F.col("user_id") % lmod == 0)
    ).select("event_id", "user_id", "ts")
    right = ev.filter(
        (F.col("event_type") == rtype) & (F.col("value") >= rval)
    ).select("user_id", F.col("ts").alias("rts"))
    out = asof_forward(
        left, right, on="user_id", left_ts="ts", right_ts="rts",
        inclusive=inclusive,
    )
    return sorted(
        (int(r["event_id"]), str(r["matched_ts"]))
        for r in out.select("event_id", "matched_ts").collect()
    )


def _duck_asof_fwd(duck, ltype, lmod, rtype, rval, inclusive):
    op = "<=" if inclusive else "<"
    rows = duck.execute(f"""
        SELECT l.event_id, r.ts AS matched_ts
        FROM (SELECT event_id, user_id, ts FROM events
              WHERE event_type = '{ltype}' AND user_id % {lmod} = 0) l
        ASOF JOIN (SELECT user_id, ts FROM events
                   WHERE event_type = '{rtype}' AND value >= {rval}) r
          ON l.user_id = r.user_id AND l.ts {op} r.ts
    """).fetchall()
    return sorted((int(e), str(t)) for e, t in rows)


@settings(
    max_examples=25, deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
    phases=[Phase.generate, Phase.shrink],
)
@given(
    ltype=st.sampled_from(TYPES),
    lmod=st.integers(min_value=1, max_value=5),
    rtype=st.sampled_from(TYPES),
    rval=st.sampled_from([0, 100, 300, 450]),
    inclusive=st.booleans(),
)
def test_asof_forward_matches_native_asof_join(
    spark, duck, ltype, lmod, rtype, rval, inclusive
):
    s = _spark_asof_fwd(spark, ltype, lmod, rtype, rval, inclusive)
    d = _duck_asof_fwd(duck, ltype, lmod, rtype, rval, inclusive)
    assert s == d, (ltype, lmod, rtype, rval, inclusive, len(s), len(d))


def test_asof_forward_backward_mirror(spark):
    """On a symmetric fixture, forward(t) == backward(-t) with negated
    timestamps — the directions must be exact mirrors."""
    from pulsar_ingestion_spark.operators.joins import (
        asof_backward,
        asof_forward,
    )

    left = spark.createDataFrame(
        [(1, 1, 10), (2, 1, 20), (3, 1, 30), (4, 2, 5)],
        "event_id int, k int, t long",
    )
    right = spark.createDataFrame(
        [(1, 12), (1, 25), (2, 4)], "k int, rt long"
    )
    fwd = {
        (r["event_id"], r["matched_ts"])
        for r in asof_forward(left, right, "k", "t", "rt").collect()
    }
    nleft = left.selectExpr("event_id", "k", "-t AS t")
    nright = right.selectExpr("k", "-rt AS rt")
    bwd = {
        (r["event_id"], -r["matched_ts"])
        for r in asof_backward(nleft, nright, "k", "t", "rt").collect()
    }
    assert fwd == bwd == {(1, 12), (2, 25)}


def _pandas_asof(duck, ltype, lmod, rtype, rval, inclusive, direction):
    """Third independent engine: pandas merge_asof on the same frames
    (allow_exact_matches maps inclusive; direction backward/forward)."""
    import pandas as pd

    left = duck.execute(f"""
        SELECT event_id, user_id, ts FROM events
        WHERE event_type = '{ltype}' AND user_id % {lmod} = 0
        ORDER BY ts, event_id
    """).df()
    right = duck.execute(f"""
        SELECT user_id, ts AS rts FROM events
        WHERE event_type = '{rtype}' AND value >= {rval}
        ORDER BY ts
    """).df()
    if right.empty or left.empty:
        return []
    m = pd.merge_asof(
        left, right, left_on="ts", right_on="rts", by="user_id",
        direction=direction, allow_exact_matches=inclusive,
    )
    m = m.dropna(subset=["rts"])
    return sorted(
        (int(e), str(t)) for e, t in zip(m["event_id"], m["rts"])
    )


@settings(
    max_examples=15, deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
    phases=[Phase.generate, Phase.shrink],
)
@given(
    ltype=st.sampled_from(TYPES),
    lmod=st.integers(min_value=1, max_value=5),
    rtype=st.sampled_from(TYPES),
    rval=st.sampled_from([0, 100, 300]),
    inclusive=st.booleans(),
    forward=st.booleans(),
)
def test_asof_three_engines_agree(
    spark, duck, ltype, lmod, rtype, rval, inclusive, forward
):
    """Spark union-sort plan, DuckDB native ASOF JOIN, and pandas
    merge_asof — three independent implementations of the same as-of
    contract must emit the identical (left row, matched ts) multiset
    in BOTH directions and bound modes."""
    if forward:
        s = _spark_asof_fwd(spark, ltype, lmod, rtype, rval, inclusive)
        d = _duck_asof_fwd(duck, ltype, lmod, rtype, rval, inclusive)
        p = _pandas_asof(duck, ltype, lmod, rtype, rval, inclusive, "forward")
    else:
        s = _spark_asof(spark, ltype, lmod, rtype, rval, inclusive)
        d = _duck_asof(duck, ltype, lmod, rtype, rval, inclusive)
        p = _pandas_asof(duck, ltype, lmod, rtype, rval, inclusive, "backward")
    assert s == d == p, (ltype, lmod, rtype, rval, inclusive, forward,
                         len(s), len(d), len(p))
