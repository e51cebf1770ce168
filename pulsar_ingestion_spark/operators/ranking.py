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


def global_row_number(
    df: DataFrame,
    order_cols: list[Column],
    rn_col: str = "_rn",
    num_partitions: int | None = None,
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
    counts = {r["_gpid"]: r["cnt"] for r in
              ranged.groupBy("_gpid").agg(F.count(F.lit(1)).alias("cnt")).collect()}
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
