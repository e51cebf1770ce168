"""Bounded in-suite run of the Spark <-> DuckDB parity fuzzer.

The full grammar, compilers, and driver-semantics compare live in
``tools/parityfuzz.py`` (module docstring there covers scope and the
hazard classes the grammar probes).  The suite runs a fixed-seed bounded
sample so CI time stays sane; ``python tools/parityfuzz.py --examples N``
is the deep-soak entrypoint.  Fixed seed = reproducible, and new
hypothesis versions can't silently change suite runtime.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest
from hypothesis import HealthCheck, given, seed, settings

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import parityfuzz  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    parityfuzz.register_views(con, SF_DIR)
    yield con
    con.close()


@seed(20260815)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(plan=parityfuzz.plans())
def test_random_plans_match_duckdb(spark, duck, plan):
    diff = parityfuzz.check_plan(plan, spark, duck, SF_DIR)
    assert diff is None, (
        f"PARITY DIVERGENCE: {diff}\nplan={plan!r}\nsql={parityfuzz.compile_sql(plan)}"
    )


def test_known_hazards_expressed_in_grammar():
    """The grammar must keep covering the documented hazard classes: a
    NULL-injecting expression, the HUGEINT sum cast, and the ||-not-concat
    compile.  Guards against someone 'simplifying' them away."""
    sql = parityfuzz.compile_sql(
        ("agg", ("li",), None, (), (("sum", ("nullif", ("icol", "l_linenumber"), 3)),))
    )
    assert "CAST(sum(" in sql and "AS BIGINT)" in sql and "NULL" in sql
    ssql = parityfuzz.compile_sql(
        ("proj", ("li",), None, (("concat", ("scol", "l_returnflag"), ("slit", "x")),))
    )
    assert "||" in ssql and "concat(" not in ssql
    wsql = parityfuzz.compile_sql(
        ("win", ("lj",), None, ("scol", "o_orderstatus"), ("icol", "l_suppkey"), (("wsum", ("icol", "l_partkey")),))
    )
    # NULLS FIRST pinned (DuckDB ASC default is NULLS LAST, Spark's is FIRST)
    # and the Spark default RANGE frame made explicit
    assert "NULLS FIRST" in wsql and "RANGE BETWEEN UNBOUNDED PRECEDING" in wsql
    dsql = parityfuzz.compile_sql(
        ("agg", ("li",), None, (), (("sumd4", "l_quantity"), ("sumd4prod", "l_extendedprice", "l_discount")))
    )
    # the double-SUM convention: DECIMAL(18,4) partials cast back to double
    assert dsql.count("DECIMAL(18,4)") >= 3 and "AS DOUBLE" in dsql
    tsql = parityfuzz.compile_sql(("proj", ("li",), None, (("epochus", "l_shipdate"),)))
    # integer time arithmetic via epoch_us, never fractional epoch()
    assert "epoch_us(" in tsql and "epoch(" not in tsql.replace("epoch_us(", "")


def test_duckdb_decimal_to_double_cast_hazard(spark, duck):
    """Found by the fuzzer (first live catch): DuckDB's DECIMAL->DOUBLE
    cast computes int128 * 10^-scale in floating point, so once the
    UNSCALED value exceeds 2^53 the result can be off by 1 ulp from the
    correctly-rounded double; Spark's BigDecimal cast is always correctly
    rounded.  A scale-8 product sum (DECIMAL(18,4) * DECIMAL(19,4), the
    TPC-H Q1 shape) crosses 2^53 at |value| ~9e7, so raw unrounded casts
    of such sums hash-mismatch.  Safe pattern: rescale to DECIMAL(38,4)
    IN DECIMAL first (exact when the data carries <=2dp, as the fixture
    does), or keep a trailing round() with >=1-ulp headroom.

    This test pins BOTH engines' behavior so a DuckDB upgrade that fixes
    the cast (or a Spark change) is surfaced instead of silently shifting
    which oracles are safe."""
    from pyspark.sql import functions as F

    lit = "CAST('-7710396296.05000000' AS DECIMAL(38,8))"
    duck_direct = duck.execute(f"SELECT CAST({lit} AS DOUBLE)").fetchone()[0]
    duck_rescaled = duck.execute(
        f"SELECT CAST(CAST({lit} AS DECIMAL(38,4)) AS DOUBLE)"
    ).fetchone()[0]
    row = spark.range(1).select(
        F.expr(f"CAST({lit} AS DOUBLE)").alias("direct"),
        F.expr(f"CAST(CAST({lit} AS DECIMAL(38,4)) AS DOUBLE)").alias("rescaled"),
    ).collect()[0]
    assert row["direct"] == -7710396296.05  # Spark: correctly rounded
    assert duck_direct != row["direct"]  # DuckDB direct: 1 ulp off (the hazard)
    assert abs(duck_direct - row["direct"]) < 1e-5
    assert duck_rescaled == row["rescaled"] == -7710396296.05  # the safe pattern


def test_duckdb_decimal_multiply_overflow_asymmetry(spark, duck):
    """Fuzzer finding #2: the Q1 decimal pattern SUM(a * (1 - b)) is only
    engine-portable when b is a bounded rate.  With two large-magnitude
    operands, DuckDB's decimal multiply raises an overflow while Spark
    widens the result type to DECIMAL(38,8) and succeeds — so an oracle
    written this way would ERROR on one engine, not mismatch.  Pinned so
    a DuckDB upgrade that changes the behavior is surfaced."""
    import duckdb as _duckdb
    from pyspark.sql import functions as F

    expr = (
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))"
        " * (CAST(1 AS DECIMAL(18,4)) - CAST(l_extendedprice AS DECIMAL(18,4))))"
        " AS DOUBLE)"
    )
    with pytest.raises(_duckdb.OutOfRangeException):
        duck.execute(f"SELECT {expr} AS a0 FROM lineitem").fetchone()
    d = "decimal(18,4)"
    ep = F.col("l_extendedprice")
    n = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .agg(F.sum(ep.cast(d) * (F.lit(1).cast(d) - ep.cast(d))).cast("double").alias("a0"))
        .filter(F.col("a0").isNotNull())
        .count()
    )
    assert n == 1  # Spark evaluates the same expression fine


def test_spark_rollup_empty_input_divergence(spark, duck):
    """Fuzzer finding #3 (grammar v6, first soak): GROUP BY ROLLUP/CUBE
    over an EMPTY input emits ZERO rows in Spark (DataFrame rollup/cube
    AND spark.sql) but the ANSI grand-total row (NULL key, count 0) in
    DuckDB — the empty grouping set behaves like a global aggregate
    there.  Portable-oracle rule: rollup/cube SQL twins append
    ``HAVING count(*) > 0`` (real groups always carry count >= 1, so
    it is a no-op on non-empty inputs and removes exactly the
    empty-input grand-total row).  Pinned on BOTH engines so an
    upgrade that changes either behavior is surfaced."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1,)], "k long").filter(F.col("k") > 99)
    assert df.rollup(F.col("k")).agg(F.count(F.lit(1)).alias("c")).collect() == []
    assert df.cube(F.col("k")).agg(F.count(F.lit(1)).alias("c")).collect() == []
    # global aggregate over empty input DOES emit its row on both engines
    assert df.agg(F.count(F.lit(1)).alias("c")).collect()[0]["c"] == 0
    duck_rows = duck.execute(
        "SELECT k, count(*) c FROM (SELECT CAST(1 AS BIGINT) k WHERE 1=0) t"
        " GROUP BY ROLLUP(k)"
    ).fetchall()
    assert duck_rows == [(None, 0)]  # DuckDB: ANSI grand-total row
    guarded = duck.execute(
        "SELECT k, count(*) c FROM (SELECT CAST(1 AS BIGINT) k WHERE 1=0) t"
        " GROUP BY ROLLUP(k) HAVING count(*) > 0"
    ).fetchall()
    assert guarded == []  # the portable twin matches Spark
    # and the guard is a no-op on non-empty input
    full = duck.execute(
        "SELECT k, count(*) c FROM (SELECT CAST(1 AS BIGINT) k) t"
        " GROUP BY ROLLUP(k) HAVING count(*) > 0 ORDER BY k NULLS FIRST"
    ).fetchall()
    assert full == [(None, 1), (1, 1)]


def test_v7_constructs_expressed_in_grammar():
    """v7 compile pins: ROWS frame emitted on the SQL side aggregates the
    ORDER expression; rollup/cube SQL carries GROUPING() flags AND the
    empty-input guard; set-op ALL forms; csub threshold subquery."""
    wsql = parityfuzz.compile_sql(
        ("win", ("li",), None, ("scol", "l_returnflag"),
         ("icol", "l_suppkey"), (("fsum",),), ("rows", 3))
    )
    assert "ROWS BETWEEN 3 PRECEDING AND CURRENT ROW" in wsql
    assert "sum(CAST(l_suppkey AS BIGINT))" in wsql  # the ORDER expr itself
    rsql = parityfuzz.compile_sql(
        ("aggroll", "cube", ("li",), None,
         (("scol", "l_returnflag"),), (("count_star",),))
    )
    assert "GROUP BY CUBE" in rsql and "GROUPING(" in rsql
    assert "HAVING count(*) > 0" in rsql  # finding #3 guard retained
    ssql = parityfuzz.compile_sql(
        ("setop", "exceptall", ("li",), None, None,
         (("icol", "l_linenumber"),))
    )
    assert "EXCEPT ALL" in ssql
    csql = parityfuzz.compile_sql(
        ("csub", ("cnt",), None, None, (">", "maxi"))
    )
    assert "(SELECT max(CAST(o_custkey AS BIGINT)) FROM orders)" in csql
    assert csql.count("SELECT") == 3  # outer + correlated + threshold


def test_v8_constructs_expressed_in_grammar():
    """v8 compile pins: QUALIFY-style rank filter wraps a subquery;
    date_trunc keys render to second-precision strings; strjoin uses
    ordered string_agg coalesced to '' (the all-NULL-group twin of
    Spark's empty-array array_join)."""
    qsql = parityfuzz.compile_sql(
        ("winq", ("li",), None, ("scol", "l_returnflag"),
         ("icol", "l_suppkey"), 3)
    )
    assert "WHERE w0 <= 3" in qsql and "rank() OVER" in qsql
    ksql = parityfuzz.compile_sql(
        ("winq", ("li",), None, ("ktrunc", "l_shipdate", "month"),
         ("icol", "l_suppkey"), 1)
    )
    assert "strftime(date_trunc('month', l_shipdate)" in ksql
    asql = parityfuzz.compile_sql(
        ("agg", ("li",), None, (("scol", "l_returnflag"),),
         (("strjoin", "l_linestatus"),), None)
    )
    # sort AFTER aggregation (finding #4): never the ordered-aggregate form
    assert "list_sort(" in asql and "string_agg" not in asql


def test_duckdb_ordered_string_agg_rollup_divergence(duck):
    """Fuzzer finding #4 (grammar v8, first soak): DuckDB's ordered
    aggregate ``string_agg(x, sep ORDER BY x)`` does NOT honor the ORDER
    in ROLLUP/CUBE super-aggregate rows — the coarser grouping sets are
    built by merging the finer sets' sorted partial states without a
    final re-sort, so the grand-total concatenation arrives in merge
    order (reproduces deterministically at fixture scale, even with
    SET threads=1; per-key rows and plain GROUP BY stay sorted; tiny
    VALUES inputs stay sorted — single partial state).  Portable-oracle
    rule: sort AFTER aggregation
    (``array_to_string(list_sort(list(x) FILTER ...), sep)`` — exactly
    Spark's ``array_join(sort_array(collect_list))``).  Pinned so a
    DuckDB upgrade that fixes the merge is surfaced."""
    rows = duck.execute(
        "SELECT l_returnflag, string_agg(l_returnflag, '|' ORDER BY l_returnflag)"
        " FROM lineitem GROUP BY ROLLUP(l_returnflag)"
    ).fetchall()
    per_key_sorted, total_sorted = [], None
    for k, a in rows:
        parts = a.split("|")
        if k is None:
            total_sorted = parts == sorted(parts)
        else:
            per_key_sorted.append(parts == sorted(parts))
    assert all(per_key_sorted)          # finest grouping set: ordered
    assert total_sorted is False        # super-aggregate: merge order (the bug)
    fixed = duck.execute(
        "SELECT coalesce(array_to_string(list_sort("
        "list(l_returnflag) FILTER (WHERE l_returnflag IS NOT NULL)), '|'), '')"
        " FROM lineitem GROUP BY ROLLUP(l_returnflag)"
    ).fetchall()
    for (a,) in fixed:
        parts = a.split("|")
        assert parts == sorted(parts)   # the portable twin: always sorted


def test_v11_constructs_expressed_in_grammar():
    """v11 compile pins: explicit GROUPING SETS renders drawn subsets
    (incl. the empty set) AND keeps the finding-#3 empty-input guard;
    named-WINDOW SQL declares w1 (unframed) + w2 (ROWS framed) and its
    framed aggregates take the order expression; quantile aggregates
    compile to quantile_cont CAST to DOUBLE; pad/translate/calendar-
    shift string ops render in the sign-safe / non-empty-pad forms."""
    gsql = parityfuzz.compile_sql(
        ("aggroll", ("gsets", ((0,), (), (0, 1))), ("li",), None,
         (("scol", "l_returnflag"), ("scol", "l_linestatus")),
         (("count_star",),))
    )
    # v20: keys are PRE-PROJECTED (finding #7 artifact fix), so the
    # sets reference the aliased k{i} columns
    assert "GROUP BY GROUPING SETS ((k0), (), (k0, k1))" in gsql
    assert "l_returnflag AS k0" in gsql and "l_linestatus AS k1" in gsql
    assert "HAVING count(*) > 0" in gsql and "GROUPING(" in gsql
    wsql = parityfuzz.compile_sql(
        ("winnamed", ("scol", "l_returnflag"), "l_orderkey", -3, 2,
         (("rank",), ("nwsum",)), None)
    )
    assert "WINDOW w1 AS (" in wsql and "w2 AS (" in wsql
    assert "OVER w1" in wsql and "OVER w2" in wsql
    assert "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW" in wsql
    assert "sum((CAST(l_orderkey AS BIGINT) + -3)) OVER w2" in wsql
    qsql = parityfuzz.compile_sql(
        ("agg", ("li",), None, (),
         (("quanti", ("icol", "l_suppkey"), 0.75),), None)
    )
    assert "CAST(quantile_cont(CAST(l_suppkey AS BIGINT), 0.75) AS DOUBLE)" in qsql
    psql = parityfuzz.compile_sql(
        ("proj", ("li",), None,
         (("lpad", ("scol", "l_returnflag"), 5, "xy"),
          ("xlate", ("scol", "l_linestatus"), "aes", "x"),
          ("srepeat", ("scol", "l_returnflag"), 2),))
    )
    assert "lpad(l_returnflag, 5, 'xy')" in psql
    assert "translate(l_linestatus, 'aes', 'x')" in psql
    assert "repeat(l_returnflag, 2)" in psql


def test_lpad_empty_pad_asymmetry(spark, duck):
    """v11 exclusion class: ``lpad(s, n, '')`` with n > length(s) is an
    error-vs-value asymmetry — Spark returns the input string UNCHANGED
    (pads zero characters), DuckDB raises InvalidInputException
    ("Insufficient padding in LPAD").  The grammar therefore only draws
    NON-EMPTY pad strings.  If either behavior changes, this pin fails
    and the exclusion should be revisited."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("A",)], "s string")
    got = df.select(F.lpad("s", 5, "").alias("c0")).collect()[0]["c0"]
    assert got == "A"  # unchanged, NOT padded and NOT an error

    with pytest.raises(duckdb.InvalidInputException):
        duck.execute("SELECT lpad('A', 5, '')").fetchall()


def test_grouping_sets_all_empty_asymmetry(spark, duck):
    """v11 exclusion class (first v11 soak): ``GROUP BY GROUPING SETS
    (())`` — only the grand-total set — plus a GROUPING() flag is an
    error-vs-value asymmetry: Spark accepts it (one row, flag = 1),
    DuckDB's binder rejects GROUPING "without groups".  The grammar
    therefore requires at least one NON-empty subset.  Without the
    GROUPING() flag both engines agree (plain global aggregate), so the
    exclusion is scoped to the flagged form the grammar emits."""
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "*", F.col("l_linenumber").alias("k0")
    )
    rows = (
        li.groupingSets([[]], F.col("k0"))
        .agg(F.count(F.lit(1)).alias("a0"),
             F.grouping(F.col("k0")).cast("long").alias("g0"))
        .collect()
    )
    assert len(rows) == 1 and rows[0]["g0"] == 1 and rows[0]["k0"] is None

    with pytest.raises(duckdb.BinderException):
        duck.execute(
            "SELECT l_linenumber AS k0, count(*) AS a0, "
            "GROUPING(l_linenumber) AS g0 "
            "FROM lineitem GROUP BY GROUPING SETS (())"
        ).fetchall()


def test_spark_pivot_empty_cell_count_divergence(spark, duck):
    """Fuzzer finding #5 (first surfaced by the v11-reseeded in-suite
    run; latent since grammar v10): Spark's DataFrame ``pivot``
    pre-aggregates by (key, pivot-col) and emits NULL for a (key, value)
    cell containing NO ROWS, while the flat CASE-form spelling
    ``count(CASE WHEN pcol = v THEN e END)`` over the key group returns
    0 — count is the only aggregate that distinguishes the two (sum/min/
    max of an empty cell are NULL on both paths).  Keying the pivot BY
    the pivot column itself makes every off-diagonal cell empty, a
    deterministic repro.  The oracle twin NULLs the count exactly when
    the cell has no rows: CASE WHEN count(CASE WHEN pcol=v THEN 1 END)=0
    THEN NULL ELSE count(...) END."""
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    out = {
        r["k0"]: (r["A"], r["N"], r["R"])
        for r in li.select(F.col("l_returnflag").alias("k0"), "l_returnflag",
                           F.col("l_orderkey").alias("m"))
        .groupBy("k0").pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.count("m")).collect()
    }
    # off-diagonal cells: Spark pivot -> NULL (cell absent), never 0
    assert out["A"][1] is None and out["A"][2] is None
    assert out["N"][0] is None and out["R"][0] is None
    assert all(v[i] > 0 for i, v in enumerate((out["A"], out["N"], out["R"])))

    # the naive CASE-form count says 0 for the same cells...
    naive = duck.execute(
        "SELECT l_returnflag AS k0, "
        "count(CASE WHEN l_returnflag = 'N' THEN l_orderkey END) AS n_cell "
        "FROM lineitem GROUP BY l_returnflag ORDER BY k0"
    ).fetchall()
    assert [r[1] for r in naive if r[0] != "N"] == [0, 0]

    # ...and the encoded twin matches Spark's NULL
    twin = duck.execute(
        "SELECT l_returnflag AS k0, "
        "CASE WHEN count(CASE WHEN l_returnflag = 'N' THEN 1 END) = 0 "
        "THEN NULL ELSE count(CASE WHEN l_returnflag = 'N' THEN l_orderkey END) "
        "END AS n_cell FROM lineitem GROUP BY l_returnflag ORDER BY k0"
    ).fetchall()
    assert [r[1] for r in twin if r[0] != "N"] == [None, None]

    # the falsifying plan itself, end-to-end through both compilers
    plan = ("pivot", ("li",), None, ("scol", "l_returnflag"),
            ("l_returnflag", ("A", "N", "R")), ("count", ("icol", "l_orderkey")))
    assert parityfuzz.check_plan(plan, spark, duck, SF_DIR) is None


def test_v12_constructs_expressed_in_grammar():
    """v12 compile pins: EXISTS-in-CASE renders one portable SQL text;
    split element access compiles to the NULL-tolerant 1-based form
    (never a raising index); lead/lag take the order expression with a
    BIGINT-cast default; greatest/least and split_part render
    literally."""
    csql = parityfuzz.compile_sql(("casex", True, (3, 1), None))
    assert "CASE WHEN NOT EXISTS (SELECT 1 FROM orders" in csql
    assert "% 3) = 1" in csql
    psql = parityfuzz.compile_sql(
        ("proj", ("doc",), None,
         (("spart", ("scol", "text"), " ", 3),
          ("selem", ("scol", "lang"), "-", 4),
          ("great", ("icol", "doc_id"), ("icol", "n_chars")))))
    assert "split_part(text, ' ', 3)" in psql
    assert "regexp_split_to_array(lang, '-')[5]" in psql  # 0-based -> [i+1]
    assert "greatest(CAST(doc_id AS BIGINT), CAST(n_chars AS BIGINT))" in psql
    wsql = parityfuzz.compile_sql(
        ("win", ("li",), None, ("scol", "l_returnflag"), ("icol", "l_suppkey"),
         (("wlag", 2, -5),), None))
    assert "lag(CAST(l_suppkey AS BIGINT), 2, CAST(-5 AS BIGINT))" in wsql


def test_spark_getitem_oob_raises_where_duckdb_nulls(spark, duck):
    """v12 exclusion class: Spark ``split(...)[i]`` / ``getItem(i)``
    RAISES ArrayIndexOutOfBoundsException under ANSI mode for an
    out-of-range index, while DuckDB ``arr[i+1]`` returns NULL.  The
    grammar therefore compiles the NULL-tolerant ``F.get()`` form (the
    probe-verified twin of DuckDB's behavior, incl. out-of-range)."""
    from pyspark.sql import functions as F
    from pyspark.errors import PySparkException

    df = spark.createDataFrame([("a-b",)], "s string")
    with pytest.raises(PySparkException):
        df.select(F.split("s", "-").getItem(7).alias("c0")).collect()
    assert df.select(F.get(F.split("s", "-"), 7).alias("c0")).collect()[0]["c0"] is None
    assert duck.execute("SELECT (regexp_split_to_array('a-b', '-'))[8]").fetchone()[0] is None


def test_try_cast_decimal_string_divergence(spark, duck):
    """v13 exclusion class (probe-discovered VALUE divergence, not an
    error asymmetry): DuckDB ``TRY_CAST('12.5' AS BIGINT)`` parses the
    decimal and ROUNDS (-> 13, half-even like its double->int cast)
    while Spark's ``try_cast`` accepts integral formats only (-> NULL).
    The fuzzer grammar's string space cannot produce decimal-format
    numerals (no '.' in any alphabet; timestamp renders carry '-'/':'
    which both parsers reject), so the reachable TRY_CAST strings are
    parity-exact — this pin documents the boundary."""
    assert duck.execute("SELECT TRY_CAST('12.5' AS BIGINT)").fetchone()[0] == 13
    assert duck.execute("SELECT TRY_CAST('11.5' AS BIGINT)").fetchone()[0] == 12  # half-even
    got = spark.sql("SELECT try_cast('12.5' AS BIGINT) AS v").collect()[0]["v"]
    assert got is None
    # the shared integral/whitespace/sign classes ARE parity-exact
    for s, want in ((" 42 ", 42), ("-06", -6), ("abc", None),
                    ("99999999999999999999", None)):
        assert duck.execute(f"SELECT TRY_CAST('{s}' AS BIGINT)").fetchone()[0] == want
        assert spark.sql(f"SELECT try_cast('{s}' AS BIGINT) AS v").collect()[0]["v"] == want


def test_duckdb_fmod_function_vs_operator_divergence(spark, duck):
    """Fuzzer finding #6 (first v14 soak): DuckDB's ``fmod()`` FUNCTION
    is the rounded ``a - trunc(a/b)*b`` (every intermediate rounded to
    double), while its ``%`` OPERATOR — like Spark's ``%``, Java's and
    C's fmod — is the EXACT IEEE remainder.  fmod(20.0, 0.03) =
    0.019999999999999574 but 20.0 % 0.03 = 0.02000000000000074.  The
    grammar therefore compiles double modulo to the % operator on both
    engines; this pin fails if either engine's semantics move."""
    import math

    exact = math.fmod(20.0, 0.03)              # 0.02000000000000074
    rounded = 20.0 - (20.0 // 0.03) * 0.03     # 0.019999999999999574
    assert exact != rounded
    assert duck.execute(
        "SELECT CAST(20.0 AS DOUBLE) % CAST(0.03 AS DOUBLE)").fetchone()[0] == exact
    assert duck.execute(
        "SELECT fmod(CAST(20.0 AS DOUBLE), CAST(0.03 AS DOUBLE))").fetchone()[0] == rounded
    got = spark.sql(
        "SELECT CAST(20.0 AS DOUBLE) % CAST(0.03 AS DOUBLE) AS m").collect()[0]["m"]
    assert got == exact


def test_duckdb_negative_left_shift_asymmetry(spark, duck):
    """v15 exclusion class (first v15 soak): DuckDB ``<<`` raises
    OutOfRange on a NEGATIVE left operand while Spark's shiftleft wraps
    Java semantics (-1 << 0 = -1); ``>>`` accepts negatives identically
    on both engines.  The grammar therefore abs()es left-shift
    operands."""
    got = spark.sql("SELECT shiftleft(CAST(-1 AS BIGINT), 0) AS v").collect()[0]["v"]
    assert got == -1
    with pytest.raises(duckdb.OutOfRangeException):
        duck.execute("SELECT CAST(-1 AS BIGINT) << 0").fetchall()
    # >> negatives agree (arithmetic shift both)
    s = spark.sql("SELECT shiftright(CAST(-16 AS BIGINT), 2) AS v").collect()[0]["v"]
    d = duck.execute("SELECT CAST(-16 AS BIGINT) >> 2").fetchone()[0]
    assert s == d == -4


def test_left_negative_length_divergence(spark, duck):
    """v16 exclusion class: left/right with a NEGATIVE length is a VALUE
    divergence — Spark returns '' while DuckDB applies the Postgres
    all-but-last-N semantics ('hel' for left('hello', -2)).  The grammar
    draws non-negative lengths only."""
    got = spark.sql("SELECT left('hello', -2) AS v").collect()[0]["v"]
    assert got == ""
    assert duck.execute("SELECT left('hello', -2)").fetchone()[0] == "hel"
    assert duck.execute("SELECT right('hello', -2)").fetchone()[0] == "llo"
    # non-negative lengths agree (clamped at string length)
    for n in (0, 3, 99):
        s = spark.sql(f"SELECT left('hello', {n}) AS v").collect()[0]["v"]
        d = duck.execute(f"SELECT left('hello', {n})").fetchone()[0]
        assert s == d


def test_regexp_replace_default_flag_divergence(spark, duck):
    """v18 twin-pinning: DuckDB regexp_replace replaces only the FIRST
    match by default where Spark replaces ALL occurrences — the grammar
    compiles DuckDB's 'g' flag.  The bare same-text form is a VALUE
    divergence whenever the pattern matches more than once."""
    got = spark.sql(
        "SELECT regexp_replace('scan the scan', 'sc[a-z]n', 'X') AS v"
    ).collect()[0]["v"]
    assert got == "X the X"
    bare = duck.execute(
        "SELECT regexp_replace('scan the scan', 'sc[a-z]n', 'X')"
    ).fetchone()[0]
    assert bare == "X the scan"  # first match only — the divergence
    flagged = duck.execute(
        "SELECT regexp_replace('scan the scan', 'sc[a-z]n', 'X', 'g')"
    ).fetchone()[0]
    assert flagged == got


def test_integer_division_zero_divisor_asymmetry(spark, duck):
    """v18 guard rationale — an ERROR-vs-VALUE asymmetry (the getItem
    class): an unguarded zero divisor RAISES under ANSI Spark
    (DIVIDE_BY_ZERO) but quietly returns NULL in DuckDB (// and % both).
    The grammar routes column divisors through nullif(b, 0), which makes
    BOTH engines produce NULL: a no-op on DuckDB, the raise defused on
    Spark."""
    import pytest as _pytest

    with _pytest.raises(Exception, match="DIVIDE_BY_ZERO"):
        spark.sql("SELECT div(17, l_linenumber - l_linenumber) AS v"
                  " FROM VALUES (1) t(l_linenumber)").collect()
    assert duck.execute("SELECT 17 // 0, 17 % 0").fetchone() == (None, None)
    s = spark.sql("SELECT div(17, nullif(0, 0)) AS v").collect()[0]["v"]
    d = duck.execute("SELECT 17 // nullif(0, 0)").fetchone()[0]
    assert s is None and d is None


def test_substring_start_zero_divergence(spark, duck):
    """v19 exclusion class: substring with START=0 is a VALUE
    divergence — Spark treats 0 like 1 ('he'), DuckDB consumes a
    position before the string ('h').  Negative starts count from the
    end IDENTICALLY (incl. beyond-length clamping), so the grammar
    draws from [-3..3] minus {0}."""
    s0 = spark.sql("SELECT substring('hello', 0, 2) AS v").collect()[0]["v"]
    d0 = duck.execute("SELECT substring('hello', 0, 2)").fetchone()[0]
    assert s0 == "he" and d0 == "h"  # the divergence
    for start in (-7, -5, -3, -1, 1, 3, 99):
        s = spark.sql(f"SELECT substring('hello', {start}, 3) AS v").collect()[0]["v"]
        d = duck.execute(f"SELECT substring('hello', {start}, 3)").fetchone()[0]
        assert s == d, start


def test_two_param_ltrim_argument_order_divergence(spark, duck):
    """v19 twin-pinning: Spark's legacy two-parameter ltrim/rtrim take
    (trimStr, str) while DuckDB's take (str, chars) — the SAME text
    silently trims the wrong operand (ltrim('xxhello','x') = '' on
    Spark vs 'hello' on DuckDB).  btrim(str, trim) shares DuckDB's
    order, so only l/r need per-engine flips in the compiler."""
    assert spark.sql("SELECT ltrim('xxhello', 'x') AS v").collect()[0]["v"] == ""
    assert duck.execute("SELECT ltrim('xxhello', 'x')").fetchone()[0] == "hello"
    # the compiler's flipped forms agree
    s = spark.sql("SELECT ltrim('x', 'xxhello') AS v").collect()[0]["v"]
    assert s == "hello"
    sb = spark.sql("SELECT btrim('xyhelloyx', 'xy') AS v").collect()[0]["v"]
    db = duck.execute("SELECT trim('xyhelloyx', 'xy')").fetchone()[0]
    assert sb == db == "hello"


def test_duplicate_rollup_key_grouping_artifact(spark, duck):
    """FINDING #7 (first v20 soak): a twin-compile ARTIFACT, not an
    engine divergence.  ROLLUP over raw duplicated expression TEXT
    binds the duplicate BY EXPRESSION in DuckDB (middle grouping set:
    output column non-NULL, GROUPING() = 0), while pre-projected
    distinct columns — what Spark's DataFrame compile does — keep their
    POSITIONS (k1 NULL, flag 1).  The compiler now pre-projects on both
    sides; this pin documents why, asserting both DuckDB forms."""
    raw = duck.execute(
        "SELECT l_returnflag k0, l_returnflag k1, count(*) a0,"
        " GROUPING(l_returnflag) g1"
        " FROM lineitem GROUP BY ROLLUP(l_returnflag, l_returnflag)"
        " HAVING count(*) > 0"
    ).fetchall()
    # raw text: the duplicate never goes NULL, flags never read 1 on
    # keyed rows — the artifact
    assert all(k1 is not None for k0, k1, a, g in raw if k0 is not None)
    pre = duck.execute(
        "SELECT k0, k1, count(*) a0, GROUPING(k1) g1"
        " FROM (SELECT l_returnflag k0, l_returnflag k1 FROM lineitem) t"
        " GROUP BY ROLLUP(k0, k1) HAVING count(*) > 0"
    ).fetchall()
    # pre-projected: the middle set has k1 NULL with flag 1 — matching
    # Spark's DataFrame rollup over pre-projected columns
    assert any(k0 is not None and k1 is None and g == 1 for k0, k1, a, g in pre)
    from pyspark.sql import functions as F

    df = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "*", F.col("l_returnflag").alias("k0"), F.col("l_returnflag").alias("k1")
    )
    srows = [
        (r["k0"], r["k1"], r["a0"], int(r["g1"]))
        for r in df.rollup("k0", "k1").agg(
            F.count(F.lit(1)).alias("a0"),
            F.grouping(F.col("k1")).cast("long").alias("g1"),
        ).collect()
    ]
    key = lambda t: tuple((v is None, v if v is not None else 0) for v in t)
    assert sorted(srows, key=key) == sorted(pre, key=key)


def test_try_cast_nonintegral_lexical_forms_divergence(spark, duck):
    """FINDING #8 (first v20 soak): DuckDB TRY_CAST(... AS BIGINT)
    parses exponent ('1E5' -> 100000), decimal ('12.0' -> 12, '.5'
    ROUNDS to 1) and 0x-hex ('0x1A' -> 26) forms that Spark's
    integral-only try_cast rejects (NULL).  Reachable since v18's hex
    producers (and in principle via digit substrings of timestamp
    renders concatenated with an 'e' drawn from column text).  The
    compiled twin guards DuckDB with a full-match on trimmed
    [+-]?digits — asserted equal to Spark on every class here."""
    cases = ["12", "+12", "-12", " 12 ", "1E2", "1e2", "12.0", "",
             "   ", ".5", "0x1A", "- 5", "00012"]
    import parityfuzz as pf

    for c in cases:
        lit = c.replace("'", "''")
        s_val = spark.sql(f"select try_cast('{lit}' as bigint) v").collect()[0]["v"]
        guarded = pf._dk_int(("trycast", ("slit", c)))
        d_val = duck.execute(f"select {guarded}").fetchone()[0]
        assert s_val == d_val, (c, s_val, d_val)
    # the UNGUARDED forms diverge — the finding itself
    assert duck.execute("select TRY_CAST('1E5' AS BIGINT)").fetchone()[0] == 100000
    assert duck.execute("select TRY_CAST('.5' AS BIGINT)").fetchone()[0] == 1
    assert spark.sql("select try_cast('1E5' as bigint) v").collect()[0]["v"] is None


def test_quantile_interpolation_formula_divergence(spark, duck):
    """FINDING #9: Spark percentile interpolates lower + f*(upper-lower)
    while DuckDB quantile_cont computes (1-f)*lower + f*upper —
    algebraically equal, IEEE-different.  Starkest case: two EQUAL
    values {148, 148} at p=0.1 — Spark's form is exact (f*(u-l) = 0)
    while DuckDB's 0.9*148 + 0.1*148 lands OUTSIDE the data range at
    148.00000000000003.  The forms also coincide on many operands
    ({21, 50} at 0.1 gives 23.900000000000002 on BOTH), which is why
    v11's soaks stayed green until the v20 key-space reshuffle co-drew
    a diverging group.  Quarter fracs are exact under BOTH formulas
    (every product/sum on the k/4 grid below 2^53 for integer
    operands), so the grammar draws only {0.25, 0.5, 0.75}."""
    s = spark.sql(
        "select percentile(x, 0.1) v from values (148), (148) t(x)"
    ).collect()[0]["v"]
    d = duck.execute(
        "select quantile_cont(x, 0.1) from (values (148), (148)) t(x)"
    ).fetchone()[0]
    assert s == 148.0
    assert d == 148.00000000000003  # exceeds both inputs — the drift
    assert s != d
    # and a coinciding pair, documenting why the class hid so long
    s2 = spark.sql(
        "select percentile(x, 0.1) v from values (21), (50) t(x)"
    ).collect()[0]["v"]
    d2 = duck.execute(
        "select quantile_cont(x, 0.1) from (values (21), (50)) t(x)"
    ).fetchone()[0]
    assert s2 == d2 == 23.900000000000002
    # quarters agree exactly — the encodable subset
    for p in (0.25, 0.5, 0.75):
        sv = spark.sql(
            f"select percentile(x, {p}) v from values (21), (50) t(x)"
        ).collect()[0]["v"]
        dv = duck.execute(
            f"select quantile_cont(x, {p}) from (values (21), (50)) t(x)"
        ).fetchone()[0]
        assert sv == dv, p


def test_multi_arg_count_distinct_null_divergence(spark, duck):
    """v21 twin-pinning: multi-arg COUNT(DISTINCT a, b) drops rows where
    ANY argument is NULL on Spark (ANSI semantics) but DuckDB wraps the
    pair in a never-NULL struct and counts it — 2 vs 4 on a NULL-bearing
    fixture.  The grammar compiles the STRUCT/row form on both engines,
    which agrees for every NULL shape incl. (NULL, NULL)."""
    rows = "(1,2),(1,2),(1,3),(NULL,2),(NULL,2),(NULL,NULL)"
    s_bare = spark.sql(
        f"SELECT count(DISTINCT a, b) AS v FROM (VALUES {rows}) t(a, b)"
    ).collect()[0]["v"]
    d_bare = duck.execute(
        f"SELECT count(DISTINCT (a, b)) FROM (VALUES {rows}) t(a, b)"
    ).fetchone()[0]
    assert s_bare == 2      # NULL-bearing rows dropped
    assert d_bare == 4      # struct-wrapped, counted — the divergence
    s_struct = spark.sql(
        f"SELECT count(DISTINCT struct(a, b)) AS v FROM (VALUES {rows}) t(a, b)"
    ).collect()[0]["v"]
    assert s_struct == d_bare == 4  # the portable twin


def test_duckdb_list_null_guard_asymmetries(spark, duck):
    """v21 aset guard rationale — two probed DuckDB list behaviors the
    CASE guard defuses: list_concat treats a NULL operand as EMPTY
    (Spark array_union propagates NULL), and list_filter over a NULL
    probe list drops every element (Spark array_except propagates
    NULL).  Plus the strjoin/ljoin empty-list rule: array_to_string([])
    is NULL where Spark array_join([]) is ''."""
    assert duck.execute(
        "SELECT array_to_string(list_concat(NULL, ['a','b']), ',')"
    ).fetchone()[0] == "a,b"
    assert spark.sql(
        "SELECT array_union(CAST(NULL AS ARRAY<STRING>), array('a','b')) AS v"
    ).collect()[0]["v"] is None
    assert duck.execute(
        "SELECT list_filter(['a'], x -> NOT list_contains(NULL, x))"
    ).fetchone()[0] == []
    assert spark.sql(
        "SELECT array_except(array('a'), CAST(NULL AS ARRAY<STRING>)) AS v"
    ).collect()[0]["v"] is None
    assert duck.execute("SELECT array_to_string([], ',')").fetchone()[0] is None
    assert spark.sql(
        "SELECT array_join(array_intersect(array('a'), array('b')), ',') AS v"
    ).collect()[0]["v"] == ""


def test_range_frame_null_island_parity(spark, duck):
    """v21 RANGE-frame rationale: NULL order keys form a single peer
    island whose frame is exactly the island on BOTH engines under ASC
    NULLS FIRST — so nullable order expressions stay encodable."""
    rows = "(NULL,100),(NULL,7),(1,10),(2,20),(2,5),(5,1)"
    q = (
        "SELECT k, CAST(SUM(v) OVER (ORDER BY k ASC NULLS FIRST "
        "RANGE BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS s "
        f"FROM (VALUES {rows}) t(k, v)"
    )
    key = lambda t: (t[0] is None, t[0] or 0, t[1])
    s = sorted(((r["k"], r["s"]) for r in spark.sql(q).collect()), key=key)
    d = sorted((tuple(r) for r in duck.execute(q).fetchall()), key=key)
    # both: null island sums 107; the 2-peers see 10+20+5 = 35
    assert s == d
    assert {v for k, v in s if k is None} == {107}


def test_arg_max_null_value_divergence(spark, duck):
    """v22 twin-pinning: DuckDB arg_max/arg_min SKIP rows whose VALUE is
    NULL, while Spark max_by/min_by pick the extreme-key row and surface
    its NULL value.  The grammar's twin NULLs the ordering key when the
    value is NULL (max_by ignores NULL keys), aligning both engines on
    DuckDB's skip semantics."""
    rows = "(1, 10),(2, 20),(3, 5)"
    s_bare = spark.sql(
        f"SELECT max_by(nullif(a, 2), u) AS v FROM (VALUES {rows}) t(a, u)"
    ).collect()[0]["v"]
    d = duck.execute(
        f"SELECT arg_max(nullif(a, 2), u) FROM (VALUES {rows}) t(a, u)"
    ).fetchone()[0]
    assert s_bare is None        # max-u row (u=20) carries NULL — surfaced
    assert d == 1                # DuckDB skips it; next-best u=10 wins
    s_twin = spark.sql(
        f"SELECT max_by(nullif(a, 2), "
        f"CASE WHEN nullif(a, 2) IS NOT NULL THEN u END) AS v "
        f"FROM (VALUES {rows}) t(a, u)"
    ).collect()[0]["v"]
    assert s_twin == d == 1      # the guarded twin
    # arg_min agrees without the guard when no NULL sits at the extreme
    s_min = spark.sql(
        f"SELECT min_by(a + 1, u) AS v FROM (VALUES {rows}) t(a, u)"
    ).collect()[0]["v"]
    d_min = duck.execute(
        f"SELECT arg_min(a + 1, u) FROM (VALUES {rows}) t(a, u)"
    ).fetchone()[0]
    assert s_min == d_min == 4


def test_v23_constructs_expressed_in_grammar():
    """v23 compile pins: topk renders the unique-key tiebreak with the
    pinned direction defaults; aggall renders one GROUP BY ALL text
    with BIGINT-cast sums; anyf renders the affine key map inside
    any_value on both sides."""
    tsql = parityfuzz.compile_sql(
        ("topk", ("li",), None, ("icol", "l_suppkey"), 25, "desc",
         "(l_orderkey * 8 + l_linenumber)"))
    # ADVICE r11: the tiebreak pins NULLS FIRST (Spark's F.asc default)
    # so a future nullable uk can't diverge silently
    assert "ORDER BY c0 DESC NULLS LAST, c1 ASC NULLS FIRST LIMIT 25" in tsql
    assert "(l_orderkey * 8 + l_linenumber) AS c1" in tsql
    asql = parityfuzz.compile_sql(
        ("aggall", (("scol", "l_returnflag"), ("kmod", "l_orderkey", 3)),
         ("cnt", "sum:l_suppkey"), None))
    assert asql.endswith("GROUP BY ALL")
    assert "CAST(count(*) AS BIGINT) AS a0" in asql
    assert "CAST(sum(l_suppkey) AS BIGINT) AS a1" in asql
    gsql = parityfuzz.compile_sql(
        ("agg", ("li",), None, (("kmod", "l_orderkey", 4),),
         (("anyf", ("kmod", "l_orderkey", 4), 3, 7),), None))
    assert "any_value(((CAST(l_orderkey AS BIGINT) % 4) * 3) + 7)" in gsql


def test_finding10_lineitem_uk_not_unique_argmax_affine_guard(spark, duck):
    """FINDING #10 (first v25 soak): the lineitem "unique key"
    (l_orderkey*8 + l_linenumber) is NOT unique — the synthetic fixture
    duplicates ~1.1k (orderkey, linenumber) pairs with DIFFERING other
    columns, so v22's arg_max of an arbitrary expression BY that key was
    nondeterministic (shrunk repro diverged 98 vs 114 under ROLLUP
    state merge — a grammar determinism bug, not an engine bug).  Pin
    the root cause and the v25.1 cure: affine-of-key values agree at
    key ties, so the amaxf plan is parity-exact including the rollup
    super-aggregate row."""
    dupes = duck.execute("""
        SELECT count(*) FROM (
          SELECT l_orderkey, l_linenumber FROM lineitem
          GROUP BY 1, 2 HAVING count(DISTINCT l_partkey) > 1) t
    """).fetchone()[0]
    assert dupes > 0  # the fixture property that broke the v22 assumption
    plan = ("aggroll", "rollup", ("li",), None,
            (("scol", "l_returnflag"),),
            (("amaxf", -3, 7, "(l_orderkey * 8 + l_linenumber)"),))
    diff = parityfuzz.check_plan(plan, spark, duck, SF_DIR)
    assert diff is None, diff


def test_v25_constructs_expressed_in_grammar():
    """v25 compile pins: gsub lists the correlated subquery in GROUP BY
    ordinals (the bare grouped-select-list form errors on BOTH
    engines); exneq renders the correlated BETWEEN; aggwin pins the
    window-over-aggregate null orders and casts the DuckDB running sum
    back to BIGINT."""
    gsql = parityfuzz.compile_sql(("gsub", 5, "maxi", (3, 1), None))
    assert "GROUP BY 1, 3" in gsql
    assert "(CAST(o_orderkey AS BIGINT) % 5) = (CAST(l_orderkey AS BIGINT) % 5)" in gsql
    esql = parityfuzz.compile_sql(("exneq", True, 2, 4, None, None))
    assert "NOT EXISTS" in esql and "BETWEEN CAST(l_orderkey AS BIGINT) - 2" in esql
    asql = parityfuzz.compile_sql(
        ("aggwin", ("li",), None, ("scol", "l_returnflag"),
         ("sumi", "l_suppkey"), "rnsum", "desc"))
    assert "ORDER BY v DESC NULLS LAST, g ASC NULLS FIRST" in asql
    assert "CAST(sum(v) OVER" in asql and "AS BIGINT)" in asql
    rsql = parityfuzz.compile_sql(
        ("aggwin", ("li",), None, ("scol", "l_returnflag"),
         ("cnt",), "row_number", "asc"))
    assert "row_number() OVER (ORDER BY v ASC NULLS FIRST, g ASC NULLS FIRST)" in rsql


def test_having_exists_on_grouping_expression_error_asymmetry(spark, duck):
    """v26 probe (NOT wired into the grammar): HAVING EXISTS correlated
    on a grouping expression errors on BOTH engines, but with different
    error CLASSES — DuckDB raises a clean binder error ("must appear in
    the GROUP BY clause") while Spark 4 fails with an INTERNAL analyzer
    error (MISSING_ATTRIBUTES, SQLSTATE XX000: the outer reference is
    rewritten to the group-key alias yet the EXISTS filter retains the
    pre-aggregation attribute).  Pinned so an engine upgrade that
    starts ACCEPTING the form (making it value-comparable) or changes
    the error class is surfaced."""
    import duckdb as _duckdb
    from pyspark.errors import AnalysisException

    q = """
    SELECT (CAST(l_orderkey AS BIGINT) % 5) AS g,
           CAST(count(*) AS BIGINT) AS c0
    FROM lineitem GROUP BY 1
    HAVING EXISTS (SELECT 1 FROM orders
                   WHERE (CAST(o_orderkey AS BIGINT) % 5)
                       = (CAST(l_orderkey AS BIGINT) % 5))
    """
    with pytest.raises(_duckdb.BinderException, match="GROUP BY"):
        duck.execute(q).fetchall()
    for t in ("lineitem", "orders"):
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").createOrReplaceTempView(t)
    with pytest.raises(AnalysisException, match="MISSING_ATTRIBUTES"):
        spark.sql(q).collect()
