"""Golden-vector tests for the CMF translators.

Vectors re-encoded from the reference's authoritative unit tests
(GeotabTranslatorTest.kt:31-149, CalAmpTranslatorTest.kt:30-78,
FordTranslatorTest.kt:30-85) — exact input→output pairs, FIXTURES.md §7.
"""

from __future__ import annotations

import json

from pulsar_ingestion_spark.operators.translators import (
    cmf_to_json,
    translate_calamp,
    translate_ford,
    translate_geotab,
    union_cmf,
)

GEOTAB_VALID = json.dumps({
    "Device_ID": "geo-device-123",
    "Vehicle_ID": "vehicle-abc",
    "Record_DateTime": "2023-10-26T10:00:00.000Z",
    "Latitude": 34.0522,
    "Longitude": -118.2437,
    "Odometer_mi": 12345.6,
    "EngineSpeed_rpm": 2500.0,
    "Fuel_Level_pct": 75.5,
    "Ignition_Status": "ON",
    "customGeotabField1": "customValue1",
    "customGeotabField2": 100,
})


def _df(spark, *payloads):
    return spark.createDataFrame([(p,) for p in payloads], "value string")


def test_geotab_valid_golden(spark):
    out = translate_geotab(_df(spark, GEOTAB_VALID), tenant="test-tenant").collect()
    assert len(out) == 1
    cmf = out[0]["cmf"]
    assert cmf["vehicleId"] == "vehicle-abc"
    assert cmf["deviceId"] == "geo-device-123"
    assert cmf["sourceType"] == "Geotab"
    assert cmf["epochSource"] == 1698314400000
    assert cmf["dateTime"] == "2023-10-26T10:00:00Z"  # ISO formatter parity
    assert cmf["tenantId"] == "test-tenant"
    assert cmf["partitionKey"] == "vehicle-abc"
    t = cmf["telemetry"]
    assert t["location"]["lat"] == 34.0522
    assert t["location"]["lon"] == -118.2437
    assert t["location"]["timestamp"] == "2023-10-26T10:00:00Z"
    assert t["odometerCanMi"] == 12345.6
    assert t["engineRpm"] == 2500.0
    assert t["fuelLevelPct"] == 75.5
    assert t["ignitionStatus"] == "ON"
    ssd = json.loads(cmf["sourceSpecificData"])
    assert ssd == {"customGeotabField1": "customValue1", "customGeotabField2": 100}
    assert cmf["meta"]["additionalProperties"] == {"translator": "GeotabTranslator_v1.0"}
    assert cmf["events"] is None


def test_geotab_missing_optionals(spark):
    payload = json.dumps({
        "Device_ID": "geo-device-789",
        "Vehicle_ID": "vehicle-xyz",
        "Record_DateTime": "2023-10-27T12:00:00.000Z",
        "Latitude": 35.0,
        "Longitude": -119.0,
    })
    out = translate_geotab(_df(spark, payload), tenant="test-tenant").collect()
    assert len(out) == 1
    t = out[0]["cmf"]["telemetry"]
    assert t["odometerCanMi"] is None
    assert t["engineRpm"] is None
    assert t["fuelLevelPct"] is None
    assert t["ignitionStatus"] == "UNKNOWN"  # default when not provided
    assert json.loads(out[0]["cmf"]["sourceSpecificData"]) == {}


def test_geotab_malformed_dropped_and_dead_lettered(spark):
    good, dead = translate_geotab(
        _df(spark, '{"Device_ID": "test"}', GEOTAB_VALID, "not json at all"),
        dead_letter=True,
    )
    assert good.count() == 1
    dead_rows = {r["value"] for r in dead.collect()}
    assert dead_rows == {'{"Device_ID": "test"}', "not json at all"}


def test_geotab_unknown_ignition_status(spark):
    payload = json.dumps({
        "Device_ID": "geo-device-123",
        "Vehicle_ID": "vehicle-abc",
        "Record_DateTime": "2023-10-26T10:00:00.000Z",
        "Latitude": 34.0522,
        "Longitude": -118.2437,
        "Ignition_Status": "AJAR",
    })
    out = translate_geotab(_df(spark, payload)).collect()
    assert out[0]["cmf"]["telemetry"]["ignitionStatus"] == "UNKNOWN"


def test_geotab_null_input_skipped(spark):
    df = spark.createDataFrame([(None,), (GEOTAB_VALID,)], "value string")
    good, dead = translate_geotab(df, dead_letter=True)
    assert good.count() == 1
    assert dead.count() == 0  # null input is skipped, not dead-lettered


def test_calamp_valid_golden(spark):
    msg_ts = 1698827400  # 2023-11-01T08:30:00Z epoch seconds
    payload = json.dumps({
        "unit_id": "calamp-unit-001",
        "vid": "calamp-vehicle-777",
        "msg_ts": msg_ts,
        "gps_lat": 36.1699,
        "gps_lon": -115.1398,
        "speed_mph": 65.5,
        "fuel_percent": 45.0,
        "voltage": 12.5,
        "calAmpSpecificValue": "payload-data",
    })
    out = translate_calamp(_df(spark, payload), tenant="calamp-tenant").collect()
    cmf = out[0]["cmf"]
    assert cmf["vehicleId"] == "calamp-vehicle-777"
    assert cmf["deviceId"] == "calamp-unit-001"
    assert cmf["sourceType"] == "CalAmp"
    assert cmf["epochSource"] == msg_ts * 1000  # epoch-s ×1000 (CalAmpTranslator.kt:100)
    assert cmf["dateTime"] == "2023-11-01T08:30:00Z"
    assert cmf["tenantId"] == "calamp-tenant"
    assert cmf["partitionKey"] == "calamp-vehicle-777"
    t = cmf["telemetry"]
    assert t["location"]["lat"] == 36.1699
    assert t["location"]["lon"] == -115.1398
    assert t["speedGpsMph"] == 65.5
    assert t["fuelLevelPct"] == 45.0
    assert t["batteryVoltage"] == 12.5
    assert json.loads(cmf["sourceSpecificData"]) == {"calAmpSpecificValue": "payload-data"}


def test_ford_valid_golden(spark):
    capture_ms = 1701432000000   # 2023-12-01T12:00:00Z
    loc_ms = 1701431998000       # 2023-12-01T11:59:58Z
    payload = json.dumps({
        "vin": "ford-vin-111",
        "esn": "ford-esn-222",
        "captureTime": capture_ms,
        "coords": {"latValue": 40.7128, "lonValue": -74.0060, "ts": loc_ms},
        "vehicleSpeed": 70.2,
        "fuelRemainingGallons": 10.5,
        "rpm": 3000,
        "fordExtraData": {"doorStatus": "all_closed", "tirePressureStatus": "normal"},
    })
    out = translate_ford(_df(spark, payload), tenant="ford-tenant").collect()
    cmf = out[0]["cmf"]
    assert cmf["vehicleId"] == "ford-vin-111"
    assert cmf["deviceId"] == "ford-esn-222"
    assert cmf["sourceType"] == "Ford"
    assert cmf["epochSource"] == capture_ms
    assert cmf["dateTime"] == "2023-12-01T12:00:00Z"
    t = cmf["telemetry"]
    assert t["location"]["lat"] == 40.7128
    assert t["location"]["lon"] == -74.0060
    assert t["location"]["timestamp"] == "2023-12-01T11:59:58Z"
    assert t["speedGpsMph"] == 70.2
    assert t["fuelLevelGallon"] == 10.5
    assert t["engineRpm"] == 3000.0  # Int → Double widening (FordTranslator.kt:127)
    ssd = json.loads(cmf["sourceSpecificData"])
    assert ssd == {"doorStatus": "all_closed", "tirePressureStatus": "normal"}


def test_calamp_missing_optionals_and_malformed(spark):
    # CalAmpTranslatorTest.kt:80-115 — optionals null, empty residue;
    # missing requireds → dropped.
    ok = json.dumps({
        "unit_id": "calamp-unit-002", "vid": "calamp-vehicle-888",
        "msg_ts": 1698919200, "gps_lat": 37.0, "gps_lon": -116.0,
    })
    good, dead = translate_calamp(_df(spark, ok, '{"unit_id": "test"}'), dead_letter=True)
    rows = good.collect()
    assert len(rows) == 1 and dead.count() == 1
    t = rows[0]["cmf"]["telemetry"]
    assert t["speedGpsMph"] is None and t["fuelLevelPct"] is None and t["batteryVoltage"] is None
    assert json.loads(rows[0]["cmf"]["sourceSpecificData"]) == {}


def test_ford_missing_optionals_and_malformed(spark):
    # FordTranslatorTest.kt:86-127 — optionals null, empty residue;
    # missing esn/captureTime/coords → dropped.
    ok = json.dumps({
        "vin": "ford-vin-333", "esn": "ford-esn-444",
        "captureTime": 1701527400000,
        "coords": {"latValue": 41.0, "lonValue": -75.0, "ts": 1701527395000},
    })
    good, dead = translate_ford(_df(spark, ok, '{"vin": "test"}'), dead_letter=True)
    rows = good.collect()
    assert len(rows) == 1 and dead.count() == 1
    t = rows[0]["cmf"]["telemetry"]
    assert t["speedGpsMph"] is None and t["fuelLevelGallon"] is None and t["engineRpm"] is None
    assert json.loads(rows[0]["cmf"]["sourceSpecificData"]) == {}


def test_union_cmf_schema_stable(spark):
    g = translate_geotab(_df(spark, GEOTAB_VALID))
    c = translate_calamp(_df(spark, json.dumps({
        "unit_id": "u", "vid": "v", "msg_ts": 1698827400,
        "gps_lat": 1.0, "gps_lon": 2.0,
    })))
    f = translate_ford(_df(spark, json.dumps({
        "vin": "v2", "esn": "e", "captureTime": 1701432000000,
        "coords": {"latValue": 1.0, "lonValue": 2.0, "ts": 1701432000000},
    })))
    u = union_cmf(g, c, f)
    assert u.count() == 3
    # same field names/types across branches (nullability may differ on literals)
    assert g.schema.simpleString() == c.schema.simpleString() == f.schema.simpleString()
    wire = cmf_to_json(u, out_col="wire")
    assert all(r["wire"].startswith("{") for r in wire.collect())


def test_variant_residue_json_fallback_matches(spark):
    """The VARIANT residue path and its pre-Spark-4 JSON-string fallback
    must produce identical typed extractions (VERDICT r4 #6: the gate
    must not change values, only the encoding)."""
    from pulsar_ingestion_spark.operators.translators import (
        residue_get,
        variant_supported,
        with_variant_residue,
    )

    assert variant_supported(spark)  # this env is Spark 4
    out = translate_geotab(_df(spark, GEOTAB_VALID), tenant="t")

    def extract(force_json):
        v = with_variant_residue(out, force_json=force_json)
        enc = v.schema["ssd_variant"].dataType
        return (
            v.select(
                residue_get(v, "ssd_variant", "$.customGeotabField1", "string").alias("c1"),
                residue_get(v, "ssd_variant", "$.customGeotabField2", "bigint").alias("c2"),
            ).collect(),
            type(enc).__name__,
        )

    variant_rows, variant_enc = extract(force_json=False)
    json_rows, json_enc = extract(force_json=True)
    assert variant_enc == "VariantType" and json_enc == "StringType"
    assert [r.asDict() for r in variant_rows] == [r.asDict() for r in json_rows]
    assert variant_rows[0]["c1"] == "customValue1"
    assert variant_rows[0]["c2"] == 100
