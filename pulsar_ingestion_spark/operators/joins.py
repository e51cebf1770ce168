"""Generic as-of join — the union-sort single-shuffle plan.

Spark has no native as-of join (SURVEY.md §2.5; the reference's
analytics surface implies one), and the naive spelling — equi-join on
the key plus a <= predicate and a per-left-row max — fans out to
|left| x |right-per-key| intermediate rows, quadratic-ish for active
keys at 100 TB.  The union-sort plan never expands: tag both sides,
sort each key's timeline ONCE (one shuffle + sort of |left| + |right|
rows), and carry the last-seen right timestamp forward with an
IGNORE-NULLS last_value window.

Semantics (pinned by tests/test_asof_fuzz.py against DuckDB's NATIVE
``ASOF JOIN`` — an independent implementation of the same contract):

* backward match: each left row pairs with the GREATEST right ts
  <= left ts (inclusive) or < left ts (exclusive);
* left rows with no prior right row are DROPPED (inner as-of, DuckDB's
  default);
* the carried payload is the matched right TIMESTAMP itself.  When
  several right rows share the matched (key, ts) the timestamp is the
  only attribute every candidate agrees on — carrying an arbitrary
  right column would be nondeterministic under intra-tie row order.
  Callers needing right attributes join back on (key, matched_ts) with
  an explicit tie policy (the registry queries' group-max form);
* NULL join keys never match (ADVICE r11): DuckDB's ASOF JOIN equality
  never matches NULL keys, but window partitionBy groups NULLs into one
  partition — so both sides drop NULL ``on`` keys up front.  NULL
  timestamps are likewise dropped (they sort meaninglessly and DuckDB's
  inequality never matches them).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_backward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    inclusive: bool = True,
) -> DataFrame:
    """Backward as-of join: every ``left`` row annotated with
    ``matched_ts`` = the latest ``right`` timestamp at-or-before
    (``inclusive``) / strictly-before its own; unmatched left rows drop.

    Output: all ``left`` columns + ``matched_ts`` (right_ts's type).
    One shuffle + sort of |left| + |right| rows on ``on`` — never a
    per-key fan-out (see module docstring; parity with DuckDB's native
    ASOF JOIN is fuzz-tested)."""
    # NULL keys/timestamps never match under ASOF equality+inequality,
    # but partitionBy would co-group NULL keys — drop them first
    left = left.filter(F.col(on).isNotNull() & F.col(left_ts).isNotNull())
    right = right.filter(F.col(on).isNotNull() & F.col(right_ts).isNotNull())
    # tag order decides what an equal-timestamp left row sees: right
    # rows sort BEFORE left at ties when inclusive, AFTER when exclusive
    right_tag = 0 if inclusive else 2
    lcols = left.columns
    reserved = {"matched_ts"} | {c for c in lcols if c.startswith("__")}
    if "matched_ts" in lcols or any(c.startswith("__") for c in lcols):
        raise ValueError(
            f"asof_backward: left columns collide with reserved names "
            f"{sorted(reserved)} — rename before joining"
        )
    tagged_left = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__rts"),
        *[F.col(c).alias(f"__l_{c}") for c in lcols],
    )
    tagged_right = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(right_tag).alias("__tag"),
        F.col(right_ts).alias("__rts"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}") for c in lcols],
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    timeline = tagged_left.unionByName(tagged_right).withColumn(
        "__matched", F.last("__rts", ignorenulls=True).over(w)
    )
    return timeline.filter(
        (F.col("__tag") == 1) & F.col("__matched").isNotNull()
    ).select(
        *[F.col(f"__l_{c}").alias(c) for c in lcols],
        F.col("__matched").alias("matched_ts"),
    )


def banded_range_join(
    left: DataFrame,
    right: DataFrame,
    left_val: str,
    right_val: str,
    max_gap: int,
    keys: list[str] | None = None,
    symmetric: bool = True,
) -> DataFrame:
    """Big×big range-proximity join without a cartesian/BNLJ: pairs
    where ``right_val - left_val`` lies in ``[-max_gap, max_gap]``
    (``symmetric``) or ``[0, max_gap]`` (one-sided), optionally also
    equal on ``keys`` — the generic operator behind the registry's
    ``join_range_banded`` (big-fact temporal proximity; the reference's
    analytics surface implies range joins, SURVEY.md §2.5).

    Plan: discretize ``left_val`` into ``max_gap``-wide bands, explode
    each left row into its own band plus the neighbor(s) a qualifying
    right row could land in ({b-1, b, b+1} symmetric; {b, b+1}
    one-sided), equi-join on (keys..., band) with the right side keyed
    by its OWN band, then apply the exact gap residual.  Each true pair
    meets exactly once (in the right row's band), so no dedup pass.
    Shuffle volume is O(3·|left| + |right|) on a hash key — both sides
    stay distributed at 100 TB, vs the n×m of the theta spelling
    (parity with DuckDB's native IEJoin range plan is fuzz-tested,
    tests/test_range_fuzz.py).

    ``left_val`` / ``right_val`` must be integer-typed (callers convert
    timestamps via ``unix_micros``); NULL values and NULL keys never
    match (dropped up front, matching SQL range/equality semantics).
    Output: all left columns + all right columns (names must not
    collide) + ``gap`` = right_val - left_val.
    """
    keys = keys or []
    if max_gap <= 0:
        raise ValueError(f"banded_range_join: max_gap must be > 0, got {max_gap}")
    collide = (set(left.columns) & set(right.columns)) - set(keys)
    if collide:
        raise ValueError(
            f"banded_range_join: column collision {sorted(collide)} — "
            f"alias before joining"
        )
    # '__band' is internal; 'gap' is the output column — an input that
    # already carries either would be silently overwritten by withColumn
    # (ADVICE r12), so both are reserved
    for reserved in ("__band", "gap"):
        if reserved in left.columns or reserved in right.columns:
            raise ValueError(
                f"banded_range_join: column name '{reserved}' is reserved "
                f"(output/internal) — rename before joining"
            )
    lnn = left.filter(F.col(left_val).isNotNull())
    for k in keys:
        lnn = lnn.filter(F.col(k).isNotNull())
        right = right.filter(F.col(k).isNotNull())
    right = right.filter(F.col(right_val).isNotNull())
    band0 = F.floor(F.col(left_val) / max_gap)
    neighbors = (
        F.array(band0 - 1, band0, band0 + 1) if symmetric
        else F.array(band0, band0 + 1)
    )
    a = lnn.withColumn("__band", F.explode(neighbors))
    b = right.withColumn("__band", F.floor(F.col(right_val) / max_gap))
    gap = F.col(right_val) - F.col(left_val)
    residual = (
        (F.abs(gap) <= max_gap) if symmetric
        else ((gap >= 0) & (gap <= max_gap))
    )
    return (
        a.join(b, keys + ["__band"])
        .filter(residual)
        .drop("__band")
        .withColumn("gap", gap)
    )


def asof_forward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    inclusive: bool = True,
) -> DataFrame:
    """Forward as-of join: every ``left`` row annotated with
    ``matched_ts`` = the EARLIEST ``right`` timestamp at-or-after
    (``inclusive``) / strictly-after its own; unmatched left rows drop —
    the mirror of :func:`asof_backward` (pandas merge_asof
    direction='forward'; DuckDB ``ASOF JOIN ... ON l.ts <= r.ts``).

    Same union-sort single-shuffle plan: the timeline window looks
    FORWARD (first non-null right timestamp in the current-row-to-end
    frame), and the tag order flips — right rows at an equal timestamp
    sort AFTER left when inclusive (in frame), BEFORE when exclusive
    (out of frame).  NULL keys/timestamps never match (ADVICE r11
    rule)."""
    left = left.filter(F.col(on).isNotNull() & F.col(left_ts).isNotNull())
    right = right.filter(F.col(on).isNotNull() & F.col(right_ts).isNotNull())
    right_tag = 2 if inclusive else 0
    lcols = left.columns
    reserved = {"matched_ts"} | {c for c in lcols if c.startswith("__")}
    if "matched_ts" in lcols or any(c.startswith("__") for c in lcols):
        raise ValueError(
            f"asof_forward: left columns collide with reserved names "
            f"{sorted(reserved)} — rename before joining"
        )
    tagged_left = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__rts"),
        *[F.col(c).alias(f"__l_{c}") for c in lcols],
    )
    tagged_right = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(right_tag).alias("__tag"),
        F.col(right_ts).alias("__rts"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}") for c in lcols],
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__tag")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    timeline = tagged_left.unionByName(tagged_right).withColumn(
        "__matched", F.first("__rts", ignorenulls=True).over(w)
    )
    return timeline.filter(
        (F.col("__tag") == 1) & F.col("__matched").isNotNull()
    ).select(
        *[F.col(f"__l_{c}").alias(c) for c in lcols],
        F.col("__matched").alias("matched_ts"),
    )
