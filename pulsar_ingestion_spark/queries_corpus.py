"""Corpus-assembly queries — the steps between "curated documents" and
"training batches": deterministic splits, sequence packing, and domain
mixing.  These extend the LLM-pipeline surface (queries_llm.py) with the
operations a 100 TB pretraining-data pipeline runs LAST, when the corpus
is frozen and must be turned into reproducible shards.

Design rules shared by all three:
  * determinism over convenience — every assignment (split, pack, epoch)
    is a pure function of the row's content/key, never of partition
    layout, so re-running on a different cluster yields byte-identical
    shards (df.sample()/rand() do not);
  * engine-portable hashing (md5 hex -> int) so the DuckDB oracle checks
    the exact assignment, not just row counts.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from pulsar_ingestion_spark.functions.text import token_count
from pulsar_ingestion_spark.registry import query
from pulsar_ingestion_spark.session import fan_out, load_tables

_TOKENS_SQL = r"len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))"


@query(
    "corpus_split_train",
    oracle="""
    SELECT doc_id, lang,
           CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100
             AS bucket,
           CASE WHEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 80
                THEN 'train'
                WHEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 90
                THEN 'validation'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def q_corpus_split_train(spark, sf_dir):
    # Train/validation/test assignment by content-key hash (80/10/10).
    # Hash-of-key, not rand(): adding or removing OTHER documents never
    # moves a document across splits (critical for eval hygiene across
    # corpus versions), and any engine can recompute membership.
    # Plan: narrow projection, no shuffle — at 100 TB this is a pure
    # map over the scan.
    docs = fan_out(load_tables(spark, sf_dir)["documents"], spark)
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast("bigint")
        % 100
    )
    return docs.select(
        "doc_id",
        "lang",
        bucket.alias("bucket"),
        F.when(bucket < 80, "train")
        .when(bucket < 90, "validation")
        .otherwise("test")
        .alias("split"),
    )


@query(
    "corpus_pack_sequences",
    oracle=f"""
    SELECT doc_id, lang, doc_id % 8 AS shard, tokens,
           CAST(FLOOR((SUM(tokens) OVER (PARTITION BY lang, doc_id % 8 ORDER BY doc_id
                                         ROWS UNBOUNDED PRECEDING) - tokens) / 2048.0)
                AS BIGINT) AS pack_id
    FROM (SELECT doc_id, lang, {_TOKENS_SQL} AS tokens FROM documents)
    """,
)
def q_corpus_pack_sequences(spark, sf_dir):
    # Sequence packing: assign each document to a fixed-token-budget pack
    # (2048 tokens) by contiguous fill — pack_id = floor(running-token-
    # offset / budget) within a deterministic (lang, shard) stream ordered
    # by doc_id.  Documents in one pack are concatenated downstream into
    # one training sequence.
    #
    # Scale shape: a single global ordered window would serialize 100 TB
    # through one partition; sharding the stream by (lang, doc_id % 8)
    # bounds every window partition to corpus/(langs*8) while keeping the
    # assignment a pure function of (doc_id, lang) — reproducible across
    # clusters and checkable by the oracle.  At 1000 executors, raise the
    # shard count to O(cores); packs never span shards so shards are
    # embarrassingly parallel.
    docs = fan_out(load_tables(spark, sf_dir)["documents"], spark)
    budget = 2048
    toks = docs.select(
        "doc_id", "lang", token_count(F.col("text")).alias("tokens"),
        F.pmod(F.col("doc_id"), F.lit(8)).alias("shard"),
    )
    w = Window.partitionBy("lang", "shard").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    start = F.sum("tokens").over(w) - F.col("tokens")
    return toks.select(
        "doc_id", "lang", "shard", "tokens",
        F.floor(start / F.lit(float(budget))).cast("bigint").alias("pack_id"),
    )


@query(
    "corpus_mix_domains",
    oracle="""
    WITH c AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang),
         r AS (SELECT lang, cnt,
                      CAST(CEIL(MAX(cnt) OVER () * 1.0 / cnt) AS BIGINT) AS rep
               FROM c)
    SELECT d.doc_id, d.lang, t.epoch, r.rep AS repeats
    FROM documents d JOIN r ON d.lang = r.lang, unnest(range(r.rep)) AS t(epoch)
    """,
)
def q_corpus_mix_domains(spark, sf_dir):
    # Domain mixing by upsampling: repeat each under-represented language
    # ceil(max_count/count) times (epoch 0..rep-1) so every domain
    # contributes comparably to the mixed corpus — the "data mixture
    # weights" step of pretraining-corpus assembly.
    #
    # Plan: the per-domain repeat table is O(#domains) rows -> broadcast
    # join against the corpus, then explode(sequence(0, rep-1)) — a
    # narrow row-generator, no shuffle of the wide side.  At 100 TB the
    # explode multiplies rows at the scan, so the sink (not a shuffle)
    # absorbs the fan-out; skewed domains never concentrate on one task
    # because the join is map-side.
    docs = fan_out(load_tables(spark, sf_dir)["documents"], spark)
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt"))
    wmax = Window.partitionBy()
    rep = counts.select(
        "lang",
        F.ceil(F.max("cnt").over(wmax) / F.col("cnt")).cast("bigint").alias("rep"),
    )
    out = docs.join(F.broadcast(rep), "lang")
    return out.select(
        "doc_id",
        "lang",
        F.explode(F.sequence(F.lit(0).cast("bigint"), F.col("rep") - 1)).alias("epoch"),
        F.col("rep").alias("repeats"),
    )
