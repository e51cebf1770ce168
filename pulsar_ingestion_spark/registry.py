"""Query registry — the declared analytics surface (SURVEY.md §2.5).

Each entry pairs a Spark callable ``(spark, sf_dir) -> DataFrame`` with an
equivalent DuckDB oracle SQL string (or None for non-SQL-expressible
operators, which the driver checks rows-only).

Parity rules (so the driver's order-insensitive value-hash matches):
  * every computed column is aliased identically on both sides;
  * double SUM/AVG go through DECIMAL(18,4) partial sums then cast back to
    double — exact decimal arithmetic on both engines, so no
    summation-order ULP drift.  CAVEAT (found by tools/parityfuzz.py):
    DuckDB's DECIMAL->DOUBLE cast is off by up to 1 ulp once the UNSCALED
    value exceeds 2^53 (int128*10^-s evaluated in floating point), while
    Spark's is correctly rounded — so a scale-8 product sum (the Q1
    shape) must either be rescaled to DECIMAL(38,4) in decimal before the
    double cast, or keep a trailing round() whose digit is >=1 ulp of the
    magnitude away (all shipped product-sum oracles carry such a round).
    Second fuzzer finding: the Q1 product pattern needs one BOUNDED (rate)
    operand — with two large-magnitude decimals DuckDB's multiply raises
    an overflow where Spark widens to DECIMAL(38,8) and succeeds;
  * timestamps in output are formatted to strings (second precision);
  * LIMIT/top-k queries always order by a unique tie-break key;
  * interpolated quantiles (parityfuzz FINDING #9): Spark percentile
    computes lower + f*(upper-lower), DuckDB quantile_cont computes
    (1-f)*lower + f*upper — algebraically equal, IEEE-different (up to
    1 ulp apart; DuckDB can even land OUTSIDE the data range on equal
    neighbors).  Quarter fracs (0.25/0.5/0.75 over integer-ish
    operands) are exact under both; any other p MUST carry a trailing
    round() whose threshold exceeds the operand magnitude's ulp by
    several orders (all shipped non-quarter quantile oracles round to
    4-6 dp on magnitudes <= ~1e6 — audited round 11 session 4);
  * float similarity scores are computed with the same left-fold order and
    rounded before use in ordering.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query under ``name`` with an optional DuckDB oracle."""
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco
