"""Information-retrieval queries over the document corpus: inverted
index construction, TF-IDF keyword extraction, and sequential path
mining over the event stream.

These are the retrieval-side counterparts of the dedup/quality family in
queries_llm.py — a pretraining pipeline needs them for corpus search,
topical analysis, and curriculum/mixture decisions.

Scale shapes:
  * posting lists are CAPPED before aggregation (partitioned window
    top-k), so no per-token collect ever exceeds k rows — a stopword's
    10^9-document posting list never materializes;
  * TF-IDF joins the (token, df) side broadcast — vocabulary is orders
    of magnitude smaller than the corpus;
  * path mining is lag/lead windows partitioned by user — the same
    exchange the sessionize/funnel family already pays.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from pulsar_ingestion_spark.registry import query
from pulsar_ingestion_spark.session import fan_out, load_tables

_POSTINGS_CAP = 50

_INVERTED_ORACLE = f"""
WITH pres AS (
  SELECT DISTINCT t.token, d.doc_id
  FROM documents d, unnest(string_split(d.text, ' ')) AS t(token)
), ranked AS (
  SELECT token, doc_id,
         row_number() OVER (PARTITION BY token ORDER BY doc_id) AS rn,
         count(*) OVER (PARTITION BY token) AS df
  FROM pres
)
SELECT token, df,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings_head
FROM ranked
WHERE rn <= {_POSTINGS_CAP}
GROUP BY token, df
"""


@query("text_inverted_index", oracle=_INVERTED_ORACLE)
def q_text_inverted_index(spark, sf_dir):
    """Capped inverted index: per token, document frequency + the first
    {cap} doc ids as a comma-joined posting head.  The cap is applied
    with a PARTITIONED window BEFORE collect_list, so the aggregation
    state per token is bounded by the cap — safe even for stopwords at
    100 TB (df still counts every document)."""
    docs = fan_out(load_tables(spark, sf_dir)["documents"], spark)
    pres = (
        docs.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("token"))
        .distinct()
    )
    w = Window.partitionBy("token").orderBy("doc_id")
    ranked = pres.select(
        "token",
        "doc_id",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("token")).alias("df"),
    )
    return (
        ranked.filter(F.col("rn") <= _POSTINGS_CAP)
        .groupBy("token", "df")
        .agg(
            F.array_join(F.array_sort(F.collect_list("doc_id")), ",").alias("postings_head")
        )
    )


_TFIDF_ORACLE = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
), tf AS (
  SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token
), df AS (
  SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY token
), n AS (
  SELECT count(*) AS n_docs FROM documents
), scored AS (
  SELECT tf.doc_id, tf.token,
         round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
  FROM tf JOIN df ON tf.token = df.token CROSS JOIN n
), ranked AS (
  SELECT doc_id, token, tfidf,
         row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token ASC) AS rnk
  FROM scored
)
SELECT doc_id, token, tfidf, rnk FROM ranked WHERE rnk <= 3
"""


@query("text_tfidf_topk", oracle=_TFIDF_ORACLE)
def q_text_tfidf_topk(spark, sf_dir):
    """Top-3 TF-IDF keywords per document.  The (token, df) relation is
    vocabulary-sized → broadcast to the tf side (no corpus shuffle for
    the join); the corpus total is a scalar agg cross-join; the final
    top-k window is partitioned by doc_id."""
    docs = fan_out(load_tables(spark, sf_dir)["documents"], spark)
    tok = docs.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df = tok.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    n = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            F.round(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("token").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "token", "tfidf", "rnk")
    )


_PATH_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type, 1) OVER w AS e2,
         lead(event_type, 2) OVER w AS e3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), paths AS (
  SELECT event_type || '>' || e2 || '>' || e3 AS path, count(*) AS cnt
  FROM seq WHERE e2 IS NOT NULL AND e3 IS NOT NULL
  GROUP BY path
)
SELECT path, cnt FROM paths ORDER BY cnt DESC, path ASC LIMIT 20
"""


@query("events_path_topk", oracle=_PATH_ORACLE)
def q_events_path_topk(spark, sf_dir):
    """Most common 3-step event-type paths — lightweight sequential
    pattern mining (the funnel family's exploratory sibling).  Per-user
    lead windows (partitioned exchange), path counts with map-side
    partial agg, TakeOrderedAndProject top-20 with a total tie-break."""
    (ev,) = (load_tables(spark, sf_dir)[n] for n in ("events",))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e2").isNotNull() & F.col("e3").isNotNull())
    paths = seq.select(
        F.concat_ws(">", "event_type", "e2", "e3").alias("path")
    ).groupBy("path").agg(F.count("*").alias("cnt"))
    return paths.orderBy(F.col("cnt").desc(), F.col("path").asc()).limit(20)
