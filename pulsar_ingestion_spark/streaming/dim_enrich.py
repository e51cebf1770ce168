"""Streaming dimension enrichment — latest-wins dimension state joined
onto each fact micro-batch (the stream-side twin of the warehouse
SCD/merge family: a slowly-changing dimension arrives as a changelog;
facts must see the newest version at processing time).

Merge algebra (streaming/sketches.py design discipline): the dimension
state merges by LATEST-WINS per key on an explicit monotone version
column — IDEMPOTENT for replayed rows (re-applying the same version
changes nothing) and ORDER-TOLERANT for late/interleaved versions
(a lower version never overwrites a higher one), so no batch-id
bookkeeping is needed.  This is exactly the
``warehouse_changelog_compact`` latest-wins collapse, held
incrementally.

Driver state is one row per dimension key (few-key discipline,
guarded); each fact batch is enriched via a BROADCAST hash join
against the model-sized snapshot — at cluster scale the fact side
never shuffles, the standard stream-static enrichment plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class DimEnrichMaintainer:
    """Holds the latest-wins dimension snapshot and enriches fact
    DataFrames against it.

    ``apply_dim_batch`` consumes dimension-changelog micro-batches
    (key, version, payload...); ``enrich`` broadcast-joins the current
    snapshot onto a fact DataFrame, tagging rows with the matched
    dimension version (NULL = no dimension row yet)."""

    def __init__(self, key_col: str, version_col: str,
                 payload_cols: list[str], max_keys: int = 100_000):
        self.key_col = key_col
        self.version_col = version_col
        self.payload_cols = list(payload_cols)
        self.max_keys = max_keys
        self._state: dict = {}  # key -> (version, payload tuple)

    def apply_dim_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        # latest-wins per key WITHIN the batch first (distributed), then
        # merged into the snapshot — idempotent + order-tolerant, no
        # batch-id guard needed (see module doc)
        from pyspark.sql import Window

        w = Window.partitionBy(self.key_col).orderBy(
            F.desc(self.version_col), *[F.desc(c) for c in self.payload_cols]
        )
        rows = (
            batch_df.filter(
                F.col(self.key_col).isNotNull()
                & F.col(self.version_col).isNotNull()
            )
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(self.key_col, self.version_col, *self.payload_cols)
            .collect()
        )
        for r in rows:
            key = r[self.key_col]
            ver = r[self.version_col]
            cur = self._state.get(key)
            if cur is None or ver > cur[0]:
                self._state[key] = (
                    ver, tuple(r[c] for c in self.payload_cols)
                )
        if len(self._state) > self.max_keys:
            raise ValueError(
                f"DimEnrichMaintainer: {len(self._state)} dimension keys "
                f"exceeds max_keys={self.max_keys} — the broadcast snapshot "
                "requires a model-sized dimension; at larger cardinality "
                "use the stream-stream join / state-store path"
            )

    def snapshot_df(self, spark) -> DataFrame:
        from pyspark.sql.types import StructField, StructType

        rows = [
            (k, v[0], *v[1]) for k, v in sorted(self._state.items())
        ]
        if not rows:
            # typed empty snapshot: enrich must still resolve columns
            return None
        return spark.createDataFrame(
            rows, [self.key_col, self.version_col, *self.payload_cols]
        )

    def enrich(self, facts: DataFrame) -> DataFrame:
        """Broadcast-join the snapshot onto ``facts``; adds the payload
        columns and ``dim_version`` (NULL where no dimension row)."""
        spark = facts.sparkSession
        snap = self.snapshot_df(spark)
        if snap is None:
            out = facts
            for c in self.payload_cols:
                out = out.withColumn(c, F.lit(None).cast("string"))
            return out.withColumn("dim_version", F.lit(None).cast("long"))
        snap = snap.withColumnRenamed(self.version_col, "dim_version")
        return facts.join(F.broadcast(snap), self.key_col, "left")
