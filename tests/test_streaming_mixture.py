"""Streaming mixture tracker (streaming/mixture.py): the stream-
maintained temperature plan must equal the batch
corpus_temperature_mix query at every micro-batch cut (6 dp); ADD merge
batch-id guarded; source-cardinality guard fires."""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _stream_docs(spark, tmp_path, maintainer, n_files, tag=""):
    src = str(tmp_path / f"src{tag}{n_files}")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "source", "text"
    )
    docs.repartition(n_files).write.parquet(src)
    q = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(maintainer)
        .option("checkpointLocation", str(tmp_path / f"ckpt{tag}{n_files}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def _batch_plan(spark):
    import __spark_entry__ as e

    out = e.queries()["corpus_temperature_mix"](spark, SF_DIR).collect()
    return {
        r["source"]: (r["tokens"], r["natural_share"], r["temp_share"],
                      r["effective_epochs"])
        for r in out
    }


def test_stream_plan_equals_batch_any_cut(spark, tmp_path):
    from pulsar_ingestion_spark.streaming.mixture import MixturePlanMaintainer

    batch = _batch_plan(spark)
    for n_files in (1, 3):
        m = MixturePlanMaintainer()
        _stream_docs(spark, tmp_path, m, n_files)
        got = {row[0]: row[1:] for row in m.plan()}
        assert set(got) == set(batch)
        for src, (tok, nat, temp, ep) in batch.items():
            gt, gn, gtemp, gep = got[src]
            assert gt == tok, src
            assert abs(gn - nat) <= 1e-6, src
            assert abs(gtemp - temp) <= 1e-6, src
            assert abs(gep - ep) <= 1e-5, src


def test_stream_plan_replay_guard(spark):
    from pulsar_ingestion_spark.streaming.mixture import MixturePlanMaintainer

    m = MixturePlanMaintainer()
    df = spark.createDataFrame(
        [("a", "one two three"), ("b", "four five")], "source string, text string"
    )
    m(df, 0)
    assert m.total_tokens() == 5
    m(df, 0)  # replay — no-op
    assert m.total_tokens() == 5
    m(df, 1)
    assert m.total_tokens() == 10


def test_stream_plan_source_guard(spark):
    from pulsar_ingestion_spark.streaming.mixture import MixturePlanMaintainer

    m = MixturePlanMaintainer(max_sources=2)
    df = spark.createDataFrame(
        [(f"s{i}", "x y") for i in range(5)], "source string, text string"
    )
    with pytest.raises(ValueError, match="max_sources"):
        m(df, 0)
