"""Range-join + window-dedup parity fuzz vs native DuckDB plans
(round 12, VERDICT r11 item 5 — extending the as-of fuzz pattern).

Two independent-implementation checks:

* ``operators.joins.banded_range_join`` (band-explode equi-join +
  residual) vs DuckDB's native inequality-join path (IEJoin) on the
  same theta predicate — a genuinely different algorithm for the same
  contract.  Hypothesis draws side filters, gap width, one-sided vs
  symmetric bounds, and an optional equi-key.
* window dedup / top-k-per-group (``row_number/rank/dense_rank <= k``)
  vs DuckDB's ``QUALIFY`` — Spark filters a window column, DuckDB
  evaluates QUALIFY in its own window pipeline.  Hypothesis draws the
  partition keys, order spec, rank function and k.
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


# ---------------------------------------------------------------------------
# banded_range_join vs DuckDB IEJoin


def _spark_range(spark, ltype, rtype, gap_s, symmetric, keyed, rmod):
    from pyspark.sql import functions as F

    from pulsar_ingestion_spark.operators.joins import banded_range_join
    from pulsar_ingestion_spark.session import load_tables

    ev = load_tables(spark, SF_DIR)["events"]
    us = F.unix_micros(F.col("ts"))
    left = ev.filter(F.col("event_type") == ltype).select(
        F.col("event_id").alias("lid"), F.col("user_id").alias("user_id"),
        us.alias("lus"),
    )
    right = ev.filter(
        (F.col("event_type") == rtype) & (F.col("event_id") % rmod == 0)
    ).select(
        F.col("event_id").alias("rid"),
        F.col("user_id").alias("user_id") if keyed else F.col("user_id").alias("ruid"),
        us.alias("rus"),
    )
    out = banded_range_join(
        left, right, "lus", "rus", gap_s * 1_000_000,
        keys=["user_id"] if keyed else None, symmetric=symmetric,
    )
    return sorted(
        (int(r["lid"]), int(r["rid"]), int(r["gap"]))
        for r in out.select("lid", "rid", "gap").collect()
    )


def _duck_range(duck, ltype, rtype, gap_s, symmetric, keyed, rmod):
    g = gap_s * 1_000_000
    bound = (
        f"(epoch_us(b.ts) - epoch_us(a.ts)) BETWEEN {-g} AND {g}"
        if symmetric
        else f"(epoch_us(b.ts) - epoch_us(a.ts)) BETWEEN 0 AND {g}"
    )
    key = "AND b.user_id = a.user_id" if keyed else ""
    rows = duck.execute(f"""
        SELECT a.event_id, b.event_id,
               epoch_us(b.ts) - epoch_us(a.ts) AS gap
        FROM (SELECT * FROM events WHERE event_type = '{ltype}') a
        JOIN (SELECT * FROM events
              WHERE event_type = '{rtype}' AND event_id % {rmod} = 0) b
          ON {bound} {key}
    """).fetchall()
    return sorted((int(l), int(r), int(g)) for l, r, g in rows)


@settings(
    max_examples=20, deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
    phases=[Phase.generate, Phase.shrink],
)
@given(
    ltype=st.sampled_from(TYPES),
    rtype=st.sampled_from(TYPES),
    gap_s=st.sampled_from([1, 5, 30]),
    symmetric=st.booleans(),
    keyed=st.booleans(),
    rmod=st.sampled_from([2, 3, 7]),
)
def test_banded_range_join_matches_iejoin(
    spark, duck, ltype, rtype, gap_s, symmetric, keyed, rmod
):
    s = _spark_range(spark, ltype, rtype, gap_s, symmetric, keyed, rmod)
    d = _duck_range(duck, ltype, rtype, gap_s, symmetric, keyed, rmod)
    assert s == d, (ltype, rtype, gap_s, symmetric, keyed, rmod, len(s), len(d))


def test_banded_range_join_null_keys_never_match(spark):
    from pulsar_ingestion_spark.operators.joins import banded_range_join

    left = spark.createDataFrame(
        [(1, 10, 100), (2, None, 100), (3, 10, None)],
        "lid int, k int, lv bigint",
    )
    right = spark.createDataFrame(
        [(7, 10, 105), (8, None, 100), (9, 10, None)],
        "rid int, k int, rv bigint",
    )
    out = banded_range_join(left, right, "lv", "rv", 10, keys=["k"])
    assert sorted(
        (r["lid"], r["rid"]) for r in out.select("lid", "rid").collect()
    ) == [(1, 7)]


def test_banded_range_join_rejects_collisions_and_bad_gap(spark):
    from pulsar_ingestion_spark.operators.joins import banded_range_join

    df = spark.createDataFrame([(1, 2)], "a int, v bigint")
    with pytest.raises(ValueError, match="collision"):
        banded_range_join(df, df, "v", "v", 10)
    right = spark.createDataFrame([(1, 2)], "b int, w bigint")
    with pytest.raises(ValueError, match="max_gap"):
        banded_range_join(df, right, "v", "w", 0)
    # ADVICE r12: 'gap' is the OUTPUT column — an input already carrying
    # one (not shared, so it passes the collision check) must be rejected
    # instead of silently overwritten
    left_gap = spark.createDataFrame([(1, 2, 9)], "a int, v bigint, gap int")
    with pytest.raises(ValueError, match="'gap' is reserved"):
        banded_range_join(left_gap, right, "v", "w", 10)
    right_gap = spark.createDataFrame([(1, 2, 9)], "b int, w bigint, gap int")
    with pytest.raises(ValueError, match="'gap' is reserved"):
        banded_range_join(df, right_gap, "v", "w", 10)


# ---------------------------------------------------------------------------
# window dedup / top-k-per-group vs QUALIFY

_ORDERS = {
    "v_asc": ("F.col('value').asc(), F.col('event_id').asc()",
              "value ASC NULLS FIRST, event_id ASC"),
    "v_desc": ("F.col('value').desc(), F.col('event_id').asc()",
               "value DESC NULLS LAST, event_id ASC"),
    "ts": ("F.col('ts').asc(), F.col('event_id').asc()",
           "ts ASC NULLS FIRST, event_id ASC"),
}
_PARTS = {
    "user": (["user_id"], "user_id"),
    "type": (["event_type"], "event_type"),
    "user_type": (["user_id", "event_type"], "user_id, event_type"),
}
_FNS = ["row_number", "rank", "dense_rank"]


def _spark_qualify(spark, part, order, fn, k):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from pulsar_ingestion_spark.session import load_tables

    ev = load_tables(spark, SF_DIR)["events"]
    cols, _ = _PARTS[part]
    expr, _ = _ORDERS[order]
    w = Window.partitionBy(*cols).orderBy(*eval(expr))
    rank_col = getattr(F, fn)().over(w)
    out = ev.withColumn("_r", rank_col).filter(F.col("_r") <= k)
    return sorted(int(r["event_id"]) for r in out.select("event_id").collect())


def _duck_qualify(duck, part, order, fn, k):
    _, pcols = _PARTS[part]
    _, osql = _ORDERS[order]
    rows = duck.execute(f"""
        SELECT event_id FROM events
        QUALIFY {fn}() OVER (PARTITION BY {pcols} ORDER BY {osql}) <= {k}
    """).fetchall()
    return sorted(int(r[0]) for r in rows)


@settings(
    max_examples=20, deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
    phases=[Phase.generate, Phase.shrink],
)
@given(
    part=st.sampled_from(sorted(_PARTS)),
    order=st.sampled_from(sorted(_ORDERS)),
    fn=st.sampled_from(_FNS),
    k=st.sampled_from([1, 2, 5]),
)
def test_window_dedup_matches_qualify(spark, duck, part, order, fn, k):
    s = _spark_qualify(spark, part, order, fn, k)
    d = _duck_qualify(duck, part, order, fn, k)
    assert s == d, (part, order, fn, k, len(s), len(d))


# ---------------------------------------------------------------------------
# DataFrame pivot vs DuckDB NATIVE PIVOT (independent implementation of
# the same reshaping contract — the registry pivot oracles use the
# portable CASE-form spelling, so this is a second algorithm agreeing)

_PIVOT_CASES = {
    "flag_status": ("l_returnflag", ("A", "N", "R"), "l_linestatus"),
    "status_flag": ("l_linestatus", ("F", "O"), "l_returnflag"),
}
_PIVOT_AGGS = ["sum", "min", "max", "count"]


@pytest.fixture(scope="module")
def duck_li():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF_DIR}/lineitem.parquet')"
    )
    return con


@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
    phases=[Phase.generate, Phase.shrink],
)
@given(
    case=st.sampled_from(sorted(_PIVOT_CASES)),
    agg=st.sampled_from(_PIVOT_AGGS),
    mod=st.sampled_from([None, 2, 3]),
)
def test_dataframe_pivot_matches_native_duckdb_pivot(spark, duck_li, case, agg, mod):
    from pyspark.sql import functions as F

    pcol, pvals, key = _PIVOT_CASES[case]
    where_sql = f"WHERE l_orderkey % {mod} = 0" if mod else ""
    ddf = duck_li.execute(f"""
        PIVOT (SELECT {pcol}, {key}, l_suppkey FROM lineitem {where_sql})
        ON {pcol} IN {pvals!r}
        USING {agg}(l_suppkey)
        GROUP BY {key}
    """).df()
    df = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    if mod:
        df = df.filter(F.col("l_orderkey") % mod == 0)
    fn = {"sum": F.sum, "min": F.min, "max": F.max, "count": F.count}[agg]
    sdf = (
        df.groupBy(key).pivot(pcol, list(pvals))
        .agg(fn(F.col("l_suppkey")))
        .toPandas()
    )
    a = sdf.sort_values(key).reset_index(drop=True)
    b = ddf.sort_values(key).reset_index(drop=True)
    assert list(a[key]) == list(b[key])
    for v in pvals:
        av = a[v].astype("float64")
        bv = b[v].astype("float64")
        assert ((av == bv) | (av.isna() & bv.isna())).all(), (case, agg, mod, v)


# ---------------------------------------------------------------------------
# DataFrame unpivot vs DuckDB NATIVE UNPIVOT — the registry oracle uses
# the UNION-ALL-per-column spelling; the native statement is a second
# implementation.  Semantic pin: native UNPIVOT EXCLUDES NULL measures
# while DataFrame unpivot KEEPS them (the documented v10 rule), so the
# comparison filters NULLs on the Spark side and a dedicated case
# asserts the bare forms diverge on a NULL-bearing fixture.

_UNPIVOT_COLS = [
    ("l_partkey", "l_suppkey"),
    ("l_partkey", "l_suppkey", "l_linenumber"),
]


@settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
    phases=[Phase.generate, Phase.shrink],
)
@given(
    cols=st.sampled_from(_UNPIVOT_COLS),
    mod=st.sampled_from([2, 3, 5]),
)
def test_dataframe_unpivot_matches_native_duckdb_unpivot(spark, duck_li, cols, mod):
    from pyspark.sql import functions as F

    ddf = duck_li.execute(f"""
        UNPIVOT (SELECT l_orderkey, l_linenumber AS ln, {", ".join(cols)}
                 FROM lineitem WHERE l_orderkey % {mod} = 0)
        ON {", ".join(cols)}
        INTO NAME col VALUE val
    """).df()
    d = sorted(map(tuple, ddf[["l_orderkey", "ln", "col", "val"]].values.tolist()))
    df = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .filter(F.col("l_orderkey") % mod == 0)
        .select("l_orderkey", F.col("l_linenumber").alias("ln"), *cols)
        .unpivot(["l_orderkey", "ln"], list(cols), "col", "val")
        .filter(F.col("val").isNotNull())
    )
    s = sorted(
        (r["l_orderkey"], r["ln"], r["col"], r["val"]) for r in df.collect()
    )
    assert s == d, (cols, mod, len(s), len(d))


def test_unpivot_null_keeping_divergence_pinned(spark, duck_li):
    """Spark DataFrame unpivot KEEPS NULL measure values; DuckDB native
    UNPIVOT drops them — pinned so an engine upgrade that aligns the
    defaults is surfaced (the registry's UNION-ALL oracle spelling
    matches the null-KEEPING DataFrame semantics)."""
    duck_li.execute(
        "CREATE OR REPLACE TABLE unp (id INT, a INT, b INT)"
    )
    duck_li.execute("INSERT INTO unp VALUES (1, 10, NULL), (2, NULL, 20)")
    d = duck_li.execute(
        "UNPIVOT unp ON a, b INTO NAME col VALUE val"
    ).fetchall()
    assert len(d) == 2  # NULLs dropped
    sdf = spark.createDataFrame(
        [(1, 10, None), (2, None, 20)], "id int, a int, b int"
    ).unpivot(["id"], ["a", "b"], "col", "val")
    assert sdf.count() == 4  # NULLs kept
    assert sdf.filter("val IS NULL").count() == 2
