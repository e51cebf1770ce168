"""Tests for queries_ir.py — inverted index, TF-IDF, path mining.
Oracle correctness is covered by tools/selfcheck.py; these pin plan
shapes and cap semantics."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_inverted_index_postings_are_capped_and_sorted(spark):
    from pulsar_ingestion_spark.queries_ir import _POSTINGS_CAP, q_text_inverted_index

    rows = q_text_inverted_index(spark, SF).collect()
    assert len(rows) > 0
    for r in rows:
        ids = [int(x) for x in r["postings_head"].split(",")]
        assert len(ids) <= _POSTINGS_CAP
        assert ids == sorted(ids)
        # df counts ALL docs even when the posting head is capped
        assert r["df"] >= len(ids)
    assert any(r["df"] > _POSTINGS_CAP for r in rows)  # cap actually exercised


def test_inverted_index_windows_are_partitioned(spark):
    from pulsar_ingestion_spark.queries_ir import q_text_inverted_index

    plan = _plan(q_text_inverted_index(spark, SF))
    for args in re.findall(r"\(\d+\) Window\n.*?Arguments: (.*)", plan):
        assert "windowspecdefinition(" in args and not args.startswith(
            "[windowspecdefinition(,"
        ), args


def test_tfidf_broadcasts_vocab_side(spark):
    from pulsar_ingestion_spark.queries_ir import q_text_tfidf_topk

    plan = _plan(q_text_tfidf_topk(spark, SF))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan
    # top-3 per doc really holds
    out = q_text_tfidf_topk(spark, SF)
    mx = out.groupBy("doc_id").agg(F.count("*").alias("k")).agg(F.max("k")).collect()[0][0]
    assert mx <= 3


def test_path_topk_uses_take_ordered(spark):
    from pulsar_ingestion_spark.queries_ir import q_events_path_topk

    plan = _plan(q_events_path_topk(spark, SF))
    assert "TakeOrderedAndProject" in plan, plan
    rows = q_events_path_topk(spark, SF).collect()
    assert len(rows) == 20
    cnts = [r["cnt"] for r in rows]
    assert cnts == sorted(cnts, reverse=True)
    assert all(len(r["path"].split(">")) == 3 for r in rows)
