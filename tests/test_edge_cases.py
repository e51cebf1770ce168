"""Edge-case robustness: unicode, empty inputs, extreme values — the
operators must degrade per policy (drop/null), never raise."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from pulsar_ingestion_spark.operators.dedup import dedup_exact, ngram_jaccard_pairs
from pulsar_ingestion_spark.operators.filterer import extract_tenant, filter_routable
from pulsar_ingestion_spark.operators.translators import translate_geotab


def _df(spark, *payloads):
    return spark.createDataFrame([(p,) for p in payloads], "value string")


def test_unicode_payload_roundtrip(spark):
    payload = json.dumps({
        "Device_ID": "dévice-π", "Vehicle_ID": "vähicle-愛-🚗",
        "Record_DateTime": "2024-01-01T00:00:00.000Z",
        "Latitude": 1.0, "Longitude": 2.0,
        "customGeotabField1": "日本語テキスト",
    }, ensure_ascii=False)
    out = translate_geotab(_df(spark, payload)).collect()
    assert len(out) == 1
    cmf = out[0]["cmf"]
    assert cmf["vehicleId"] == "vähicle-愛-🚗"
    assert json.loads(cmf["sourceSpecificData"])["customGeotabField1"] == "日本語テキスト"


def test_empty_input_through_operators(spark):
    empty = spark.createDataFrame([], "value string")
    good, dead = translate_geotab(empty, dead_letter=True)
    assert good.count() == 0 and dead.count() == 0
    assert filter_routable(extract_tenant(empty)).count() == 0

    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    assert dedup_exact(empty_docs).count() == 0
    assert ngram_jaccard_pairs(empty_docs).count() == 0


def test_extreme_values(spark):
    payload = json.dumps({
        "Device_ID": "d", "Vehicle_ID": "v",
        "Record_DateTime": "2099-12-31T23:59:59.000Z",  # far future
        "Latitude": -90.0, "Longitude": 180.0,          # pole/date line
        "Odometer_mi": 1e15,                             # absurd but representable
        "EngineSpeed_rpm": 0.0,
    })
    cmf = translate_geotab(_df(spark, payload)).collect()[0]["cmf"]
    assert cmf["dateTime"] == "2099-12-31T23:59:59Z"
    assert cmf["telemetry"]["location"]["lat"] == -90.0
    assert cmf["telemetry"]["odometerCanMi"] == 1e15


def test_whitespace_only_and_empty_string_payloads(spark):
    good, dead = translate_geotab(_df(spark, "", "   ", "\n"), dead_letter=True)
    assert good.count() == 0
    assert dead.count() == 3  # not silently vanished — observable drops


def test_tenant_with_special_chars_routes(spark):
    doc = json.dumps({"meta": {"tenantId": "tenant-Ümlaut_7"}})
    rows = filter_routable(extract_tenant(_df(spark, doc))).collect()
    assert len(rows) == 1 and rows[0]["tenantId"] == "tenant-Ümlaut_7"
