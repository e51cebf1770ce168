"""Distributed global ranking — the scale-safe replacement for
unpartitioned windows.

An unpartitioned ``Window.orderBy`` (``ntile``/``row_number``/``rank``
with no partition key) funnels the whole relation through ONE task —
Spark even warns ``WindowExec: No Partition Defined``.  Fine for a
16-row centroid table, a scale-killer for a per-user aggregate at 10^9
users (VERDICT r2 item 3).

:func:`global_row_number` computes the exact global row number the
distributed way:

  1. ``repartitionByRange`` on the sort key — each partition holds a
     contiguous key range, sorted ranges are ordered by partition id;
  2. a PARTITIONED window ranks rows inside each partition in parallel;
  3. per-partition row counts (a #partitions-row aggregate — model-sized,
     the same class as the CC-loop convergence collects) become cumulative
     offsets added back via a literal map lookup.

:func:`ntile_from_row_number` then converts the exact row number into
exact ``ntile`` semantics (first ``n % t`` tiles get the extra row), so
results are bit-identical to the single-task window and to an ANSI
``ntile`` oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Driver-side row budget for the model-sized offset aggregates below
# (VERDICT r9): the few-key discipline was previously only documented —
# nothing stopped a future caller from passing a high-cardinality key
# and silently OOMing the driver.  Both helpers now fetch at most
# budget+1 aggregate rows (executor-side limit, never a full collect)
# and raise loudly past the budget.  100k rows × a few scalar columns
# is single-digit MB on the driver; with 32 shuffle partitions that
# admits ~3k distinct keys — far above every registered caller (≤ 25).
DRIVER_ROW_BUDGET = 100_000


def _bounded_driver_rows(df: DataFrame, budget: int, what: str) -> list:
    rows = df.take(budget + 1)
    if len(rows) > budget:
        raise ValueError(
            f"{what} would materialize more than {budget} aggregate rows "
            "on the driver — this helper is for BOUNDED key cardinality "
            "(the few-key discipline). Re-plan with a distributed join "
            "or raise max_driver_rows explicitly if the driver can hold it."
        )
    return rows


def global_row_number(
    df: DataFrame,
    order_cols: list[Column],
    rn_col: str = "_rn",
    num_partitions: int | None = None,
    max_driver_rows: int = DRIVER_ROW_BUDGET,
) -> tuple[DataFrame, int]:
    """Exact 1-based global row number over ``order_cols`` without an
    unpartitioned window.  Returns ``(df_with_rn, total_rows)``.

    The order must be total (include a unique tie-break column) so the
    result is deterministic regardless of range-sampling boundaries.
    The input should usually be persisted by the caller: the partition
    count job and the downstream consumer both read the repartitioned
    relation.

    NOTE: the repartitioned relation is ``persist()``ed here (it is read
    by both the count job and the returned plan).  Harnesses running many
    queries in one session should ``spark.catalog.clearCache()`` between
    queries (selfcheck/bench do) — the cached blocks are otherwise only
    reclaimed by LRU eviction.
    """
    spark = df.sparkSession
    nparts = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    ranged = df.repartitionByRange(nparts, *order_cols).withColumn(
        "_gpid", F.spark_partition_id()
    )
    ranged = ranged.persist()
    counts = {r["_gpid"]: r["cnt"] for r in _bounded_driver_rows(
        ranged.groupBy("_gpid").agg(F.count(F.lit(1)).alias("cnt")),
        max_driver_rows, "global_row_number partition counts")}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    if not counts:
        return ranged.withColumn(rn_col, F.lit(0).cast("long")).drop("_gpid"), 0
    offset_map = F.create_map(
        *[x for pid in offsets for x in (F.lit(pid), F.lit(offsets[pid]))]
    )
    w = Window.partitionBy("_gpid").orderBy(*order_cols)
    out = ranged.withColumn(
        rn_col,
        (F.row_number().over(w).cast("long") + offset_map[F.col("_gpid")]),
    ).drop("_gpid")
    return out, acc


def global_exclusive_running_max(
    df: DataFrame,
    order_col: str,
    val_col: str,
    out_col: str,
    num_partitions: int | None = None,
    max_driver_rows: int = DRIVER_ROW_BUDGET,
) -> DataFrame:
    """Exact global EXCLUSIVE prefix max over ``order_col`` (max of
    ``val_col`` across all strictly-preceding rows; NULL on the first
    row) without an unpartitioned window — the max analogue of
    :func:`global_row_number` (round 12, skyline broadcast guard).

    Range-partition on ``order_col``, run the exclusive running max
    inside each range in parallel, collect one max per partition
    (#partitions driver rows), fold the exclusive prefix on the driver
    and map the offsets back.  ``order_col`` must be unique per row
    (callers pass pre-aggregated relations).  Same persist/clearCache
    note as :func:`global_row_number`."""
    spark = df.sparkSession
    nparts = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    ranged = df.repartitionByRange(nparts, F.col(order_col)).withColumn(
        "_gpid", F.spark_partition_id()
    ).persist()
    pmax = {r["_gpid"]: r["m"] for r in _bounded_driver_rows(
        ranged.groupBy("_gpid").agg(F.max(val_col).alias("m")),
        max_driver_rows, "global_exclusive_running_max partition maxes")}
    offsets, acc = {}, None
    for pid in sorted(pmax):
        offsets[pid] = acc
        m = pmax[pid]
        if m is not None:
            acc = m if acc is None else max(acc, m)
    w = (
        Window.partitionBy("_gpid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = ranged.withColumn("_lmax", F.max(val_col).over(w))
    if not pmax:
        return local.withColumn(
            out_col, F.lit(None).cast(df.schema[val_col].dataType)
        ).drop("_gpid", "_lmax")
    # CASE chain keyed on _gpid (create_map can't hold NULL values);
    # greatest() skips NULLs, matching "no preceding row" semantics
    off: Column = F.lit(None).cast(df.schema[val_col].dataType)
    for pid in sorted(offsets, reverse=True):
        if offsets[pid] is not None:
            off = F.when(F.col("_gpid") == pid, F.lit(offsets[pid])).otherwise(off)
    return local.withColumn(
        out_col, F.greatest(F.col("_lmax"), off)
    ).drop("_gpid", "_lmax")


def ntile_from_row_number(rn: Column, total_rows: int, tiles: int) -> Column:
    """Exact ANSI ``ntile(tiles)`` from a 1-based global row number:
    the first ``total_rows % tiles`` tiles hold ``total_rows // tiles + 1``
    rows, the rest one fewer.  Pure arithmetic — no window."""
    q, rem = divmod(total_rows, tiles)
    big = q + 1
    cutoff = rem * big
    first = F.floor((rn - F.lit(1)) / F.lit(big)) + 1
    if q == 0:
        # fewer rows than tiles: every row is its own tile
        return first.cast("long")
    rest = F.lit(rem) + F.floor((rn - F.lit(cutoff) - F.lit(1)) / F.lit(q)) + 1
    return F.when(rn <= cutoff, first).otherwise(rest).cast("long")


def keyed_running_sums(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[Column],
    sum_cols: list[str],
    num_partitions: int | None = None,
    max_driver_rows: int = DRIVER_ROW_BUDGET,
) -> tuple[DataFrame, DataFrame]:
    """Exact per-key running sums over ``order_cols`` without per-key
    single-partition windows — the keyed generalization of
    :func:`global_row_number` (round 7, drift_ks re-plan).

    A ``Window.partitionBy(key)`` running sum caps parallelism at the
    number of keys (25 event types ⇒ 25 tasks no matter how many
    executors).  Here instead:

      1. ``repartitionByRange`` on (key, order) — contiguous sorted
         ranges, any partition count;
      2. a PARTITIONED window computes running sums inside each range in
         parallel;
      3. per-(partition, key) totals — a (#partitions × #keys)-row
         aggregate, model-sized for bounded key cardinality — become
         per-key offsets added back via a broadcast join.

    Rows must be unique on (key, order) so the order is total (callers
    pass pre-aggregated relations).  NULL key values form an ordinary
    group (the offset join is null-safe), matching Window.partitionBy.  Returns ``(df_out, totals)`` where
    ``df_out`` carries ``cum_<c>`` for each sum column and ``totals`` is
    the per-key grand-total relation (``total_<c>``) — broadcast-sized,
    callers join it rather than re-aggregating.  The repartitioned
    relation is persisted (read by the totals job and the output plan);
    harnesses clear the cache between queries (registry policy).
    """
    from collections import defaultdict

    spark = df.sparkSession
    nparts = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    keys = [F.col(k) for k in key_cols]
    ranged = df.repartitionByRange(nparts, *keys, *order_cols).withColumn(
        "_gpid", F.spark_partition_id()
    ).persist()
    part_totals = _bounded_driver_rows(
        ranged.groupBy("_gpid", *key_cols)
        .agg(*[F.sum(c).alias(c) for c in sum_cols]),
        max_driver_rows,
        "keyed_running_sums per-(partition,key) totals",
    )
    by_key: dict[tuple, list] = defaultdict(list)
    for r in part_totals:
        by_key[tuple(r[k] for k in key_cols)].append(
            (r["_gpid"], [r[c] for c in sum_cols])
        )
    off_rows, tot_rows = [], []
    for key, lst in by_key.items():
        acc = [0] * len(sum_cols)
        for pid, vals in sorted(lst):
            off_rows.append((pid, *key, *acc))
            acc = [a + (v or 0) for a, v in zip(acc, vals)]
        tot_rows.append((*key, *acc))
    # Explicit schemas (ADVICE r7): the empty path must emit the SAME
    # long/double-typed totals as the inferred non-empty path, and an
    # all-NULL key column must not break type inference.
    from pyspark.sql.types import (
        DoubleType,
        FloatType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    def _sum_type(c: str):
        dt = df.schema[c].dataType
        return DoubleType() if isinstance(dt, (DoubleType, FloatType)) else LongType()

    key_fields = [StructField(k, df.schema[k].dataType) for k in key_cols]
    off_schema = StructType(
        [StructField("_gpid", IntegerType()), *key_fields]
        + [StructField(f"_off_{c}", _sum_type(c)) for c in sum_cols]
    )
    tot_schema = StructType(
        key_fields + [StructField(f"total_{c}", _sum_type(c)) for c in sum_cols]
    )
    if not off_rows:  # empty input: zero cums, empty totals
        out = ranged
        for c in sum_cols:
            out = out.withColumn(f"cum_{c}", F.lit(0).cast("long"))
        return out.drop("_gpid"), spark.createDataFrame([], tot_schema)

    def _cast(rows, schema):
        return [
            tuple(
                float(v) if v is not None and isinstance(f.dataType, DoubleType)
                else v
                for v, f in zip(r, schema.fields)
            )
            for r in rows
        ]

    offsets = spark.createDataFrame(_cast(off_rows, off_schema), off_schema)
    totals = spark.createDataFrame(_cast(tot_rows, tot_schema), tot_schema)
    w = (
        Window.partitionBy("_gpid", *key_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # null-safe key equality (ADVICE r7): Window.partitionBy treats NULL
    # as an ordinary group, so the offset join must too — a plain equi-
    # join would silently drop NULL-keyed rows
    off = offsets.withColumnRenamed("_gpid", "_o_gpid")
    for k in key_cols:
        off = off.withColumnRenamed(k, f"_o_{k}")
    cond = F.col("_gpid") == F.col("_o_gpid")
    for k in key_cols:
        cond = cond & F.col(k).eqNullSafe(F.col(f"_o_{k}"))
    out = ranged.join(F.broadcast(off), cond)
    for c in sum_cols:
        out = out.withColumn(f"cum_{c}", F.sum(c).over(w) + F.col(f"_off_{c}"))
    out = out.drop(
        "_gpid", "_o_gpid",
        *[f"_o_{k}" for k in key_cols],
        *[f"_off_{c}" for c in sum_cols],
    )
    return out, totals
