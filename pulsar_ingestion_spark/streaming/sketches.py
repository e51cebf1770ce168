"""Streaming maintenance of the engine's mergeable sketches — the
100 TB monitoring story for distinct counts and heavy hitters.

The batch side (queries_sketch.py) builds engine-portable sketches —
HLL registers and count-min counters derived from deterministic md5
hashes.  Mergeability is the whole point of those encodings: per-batch
sketches combine into the running sketch WITHOUT touching earlier data,
so a stream can maintain "distinct users ever" / "events per type ever"
with O(sketch) driver state — registers (64 ints) or depth×width
counters — while each micro-batch contributes one map-side-combined
aggregation of its own rows.

Replay semantics differ by merge algebra, and that difference is the
design point of this module (tests pin both):

* **HLL merges by register-wise MAX — idempotent.**  An at-least-once
  replay of a batch re-maxes the same registers and changes nothing; no
  batch-id bookkeeping is needed.  (Same algebra that makes per-day
  sketch rollups safe to recompute at 100 TB.)
* **CMS merges by cell-wise ADD — NOT idempotent.**  A replayed batch
  would double-count, so the maintainer keeps a batch-id high-watermark
  (same discipline as the exactly-once sinks): foreachBatch ids are
  monotone per checkpoint, so ``batch_id <= seen`` is skipped.

Hash derivations are kept bit-identical to the batch queries
(md5-prefix → bigint — `sketch_hll_portable`, `sketch_countmin`), so a
stream-maintained sketch is comparable against the batch sketch of the
same rows; the equivalence tests assert exact equality of estimates
across arbitrary micro-batch cuts.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pulsar_ingestion_spark.queries_sketch import (
    _CMS_DEPTH,
    _CMS_WIDTH,
    _HLL_ALPHA,
    _HLL_M,
    _HLL_WBITS,
    _RHO_CASE,
)


class HllStreamMaintainer:
    """foreachBatch target maintaining a portable HLL over ``col``.

    Per batch: one distributed ``groupBy(bucket).max(rho)`` collapses the
    batch to ≤ m rows, which max-merge into the driver-held registers.
    ``estimate()`` replicates `sketch_hll_portable`'s integer-exact math
    (scaled harmonic sum, comparison-ladder rho, linear-counting
    small-range correction) so the stream estimate EQUALS the batch
    query's on the same rows — any micro-batch cut, any replay.
    """

    def __init__(self, col: str):
        self.col = col
        self.registers: dict[int, int] = {}  # bucket -> max rho

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        # replay-safe WITHOUT dedup: register max-merge is idempotent
        rows = (
            batch_df.filter(F.col(self.col).isNotNull())
            .select(
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit("hll:"), F.col(self.col).cast("string"))),
                        1, 8,
                    ),
                    16, 10,
                ).cast("bigint").alias("hv")
            )
            .select(
                (F.col("hv") % _HLL_M).alias("bucket"),
                F.expr(f"hv div {_HLL_M}").alias("w"),
            )
            .groupBy("bucket")
            .agg(F.expr(f"max({_RHO_CASE})").alias("register"))
            .collect()
        )
        for r in rows:
            b = int(r["bucket"])
            if r["register"] > self.registers.get(b, 0):
                self.registers[b] = int(r["register"])

    def estimate(self) -> float:
        """Same math as the batch query, driver-side: scaled-integer
        harmonic sum, then the linear-counting small-range branch."""
        used = len(self.registers)
        full_scale = 1 << (_HLL_WBITS + 1)
        sum_full = sum(
            full_scale >> reg for reg in self.registers.values()
        ) + (_HLL_M - used) * full_scale
        raw = _HLL_ALPHA * _HLL_M * _HLL_M * float(full_scale) / float(sum_full)
        zeros = _HLL_M - used
        if raw <= 2.5 * _HLL_M and zeros > 0:
            raw = float(_HLL_M) * math.log(float(_HLL_M) / float(zeros))
        return round(raw, 4)


class CmsStreamMaintainer:
    """foreachBatch target maintaining a count-min sketch over ``col``.

    Per batch: one distributed ``groupBy(depth, bucket).count()``
    collapses the batch to ≤ depth×width rows, which ADD into the
    driver-held counters.  Addition is not replay-idempotent, so a
    batch-id high-watermark skips replayed ids (foreachBatch ids are
    monotone per checkpoint — the exactly-once sinks' discipline).

    ``estimate(key)`` is the standard min-over-depths point query with
    the batch queries' exact bucket derivation (md5 prefix), so after
    any sequence of batches the estimates equal `sketch_countmin`'s on
    the union of the batches.
    """

    def __init__(self, col: str, depth: int = _CMS_DEPTH, width: int = _CMS_WIDTH):
        self.col = col
        self.depth = depth
        self.width = width
        self.counters: dict[tuple[int, int], int] = {}
        self.last_batch = -1

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if int(batch_id) <= self.last_batch:
            return  # at-least-once replay — already added
        depths = F.array([F.lit(i) for i in range(self.depth)])
        rows = (
            batch_df.filter(F.col(self.col).isNotNull())
            .select(F.explode(depths).alias("depth"), F.col(self.col).alias("k"))
            .select("depth", self._bucket_col().alias("bucket"))
            .groupBy("depth", "bucket")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        )
        for r in rows:
            cell = (int(r["depth"]), int(r["bucket"]))
            self.counters[cell] = self.counters.get(cell, 0) + int(r["cnt"])
        self.last_batch = int(batch_id)

    def _bucket_col(self):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("cms"), F.col("depth").cast("string"),
                                   F.lit(":"), F.col("k").cast("string"))), 1, 8
                ), 16, 10,
            ).cast("bigint") % self.width
        )

    def estimate(self, key) -> int:
        """Point query: min over depths of the key's counter cells."""
        est = None
        for d in range(self.depth):
            digest = hashlib.md5(f"cms{d}:{key}".encode()).hexdigest()
            bucket = int(digest[:8], 16) % self.width
            c = self.counters.get((d, bucket), 0)
            est = c if est is None else min(est, c)
        return int(est or 0)
