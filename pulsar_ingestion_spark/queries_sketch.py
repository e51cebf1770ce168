"""Mergeable sketch construction as DataFrame plans: count-min sketch
and Bloom filter.

Unlike `approx_count_distinct` (HLL — engine-internal bytes, rows-only
checkable), these sketches are built from DETERMINISTIC md5-derived
hashes, so a DuckDB oracle reconstructs the identical counter/bit
arrays and the driver hash-checks them exactly.

Why they matter at 100 TB: both are one-shuffle aggregations whose
state is O(sketch size), not O(keys) — the partial aggregate collapses
every map task to ≤ width×depth (CMS) or ≤ words (Bloom) rows before
the exchange, and sketches from different days/partitions MERGE by
cell-wise add / word-wise OR, which is exactly what the final agg does.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pulsar_ingestion_spark.registry import query
from pulsar_ingestion_spark.session import load_tables

_CMS_DEPTH = 4
_CMS_WIDTH = 256


def _cms_bucket_spark(depth: int, key):
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"cms{depth}:"), key)), 1, 8), 16, 10
        ).cast("bigint")
        % _CMS_WIDTH
    )


def _cms_bucket_sql(depth: str, key: str) -> str:
    return (
        f"CAST(('0x' || substring(md5(concat('cms', {depth}, ':', {key})), 1, 8)) AS BIGINT)"
        f" % {_CMS_WIDTH}"
    )


_CMS_ORACLE = f"""
WITH rows_h AS (
  SELECT d.depth, {_cms_bucket_sql('d.depth', 'e.event_type')} AS bucket
  FROM events e, (SELECT unnest(range(0, {_CMS_DEPTH})) AS depth) d
), counters AS (
  SELECT depth, bucket, count(*) AS cnt FROM rows_h GROUP BY depth, bucket
), keys AS (
  SELECT DISTINCT event_type FROM events
), key_buckets AS (
  SELECT k.event_type, d.depth, {_cms_bucket_sql('d.depth', 'k.event_type')} AS bucket
  FROM keys k, (SELECT unnest(range(0, {_CMS_DEPTH})) AS depth) d
), est AS (
  SELECT kb.event_type, min(c.cnt) AS cms_est
  FROM key_buckets kb JOIN counters c
    ON kb.depth = c.depth AND kb.bucket = c.bucket
  GROUP BY kb.event_type
), exact AS (
  SELECT event_type, count(*) AS exact_cnt FROM events GROUP BY event_type
)
SELECT e.event_type, e.cms_est, x.exact_cnt
FROM est e JOIN exact x ON e.event_type = x.event_type
"""


@query("sketch_countmin", oracle=_CMS_ORACLE)
def q_sketch_countmin(spark, sf_dir):
    """Count-min sketch (depth 4 × width 256) over event_type, plus the
    point-query estimates for every distinct key next to the exact
    counts (CMS guarantees est ≥ exact; equality when no collisions).
    Plan: explode rows ×depth → (depth, bucket) partial counts collapse
    map-side to ≤1024 combiner rows per task; key estimates join the
    counter table (sketch-sized, broadcast)."""
    (ev,) = (load_tables(spark, sf_dir)[n] for n in ("events",))
    depths = F.array([F.lit(i) for i in range(_CMS_DEPTH)])
    rows_h = ev.select(
        F.explode(depths).alias("depth"), F.col("event_type")
    ).select(
        "depth",
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("cms"), F.col("depth").cast("string"),
                               F.lit(":"), F.col("event_type"))), 1, 8
            ), 16, 10,
        ).cast("bigint").__mod__(_CMS_WIDTH).alias("bucket"),
    )
    counters = rows_h.groupBy("depth", "bucket").agg(F.count("*").alias("cnt"))
    keys = ev.select("event_type").distinct()
    kb = keys.select(
        "event_type", F.explode(depths).alias("depth")
    ).select(
        "event_type",
        "depth",
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("cms"), F.col("depth").cast("string"),
                               F.lit(":"), F.col("event_type"))), 1, 8
            ), 16, 10,
        ).cast("bigint").__mod__(_CMS_WIDTH).alias("bucket"),
    )
    est = (
        kb.join(F.broadcast(counters), ["depth", "bucket"])
        .groupBy("event_type")
        .agg(F.min("cnt").alias("cms_est"))
    )
    exact = ev.groupBy("event_type").agg(F.count("*").alias("exact_cnt"))
    return est.join(exact, "event_type").select("event_type", "cms_est", "exact_cnt")


_BLOOM_BITS = 2048
_BLOOM_K = 3


def _bloom_pos_sql(i: str, key: str) -> str:
    return (
        f"CAST(('0x' || substring(md5(concat('bf', {i}, ':', {key})), 1, 8)) AS BIGINT)"
        f" % {_BLOOM_BITS}"
    )


_BLOOM_ORACLE = f"""
WITH pos AS (
  SELECT DISTINCT {_bloom_pos_sql('h.i', 'CAST(e.user_id AS VARCHAR)')} AS pos
  FROM events e, (SELECT unnest(range(0, {_BLOOM_K})) AS i) h
)
SELECT pos // 32 AS word_idx,
       bit_or(1::BIGINT << CAST(pos % 32 AS INTEGER)) AS word_bits,
       count(*) AS bits_set
FROM pos GROUP BY pos // 32
"""


@query("sketch_bloom_build", oracle=_BLOOM_ORACLE)
def q_sketch_bloom_build(spark, sf_dir):
    """Bloom filter build (2048 bits, k=3) over the distinct user set,
    materialized as 32-bit half-words — the structure broadcast to prune
    a fact scan before an expensive join (Spark's own runtime bloom
    pushdown does the same thing; this one is portable and mergeable by
    word-wise OR).  32-bit words keep every shift amount ≤ 31, so the
    packed value is identical in any signed-64-bit engine (a shift of 63
    would overflow DuckDB's BIGINT and flip sign in Spark's).  One
    shuffle; per-task state ≤ 64 words."""
    (ev,) = (load_tables(spark, sf_dir)[n] for n in ("events",))
    hashes = F.array([F.lit(i) for i in range(_BLOOM_K)])
    pos = (
        ev.select(F.col("user_id").cast("string").alias("k"))
        .select("k", F.explode(hashes).alias("i"))
        .select(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("bf"), F.col("i").cast("string"),
                                   F.lit(":"), F.col("k"))), 1, 8
                ), 16, 10,
            ).cast("bigint").__mod__(_BLOOM_BITS).alias("pos")
        )
        .distinct()
    )
    return (
        pos.groupBy(F.expr("pos div 32").alias("word_idx"))
        .agg(
            F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT)))")
            .alias("word_bits"),
            F.count("*").alias("bits_set"),
        )
    )
