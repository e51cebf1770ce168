"""Raw source-input schemas (schema-on-read for ``from_json``).

These correspond to the reference's Jackson data classes — the input
contracts of the three CMF translators (GeotabTranslator.kt:34-47,
CalAmpTranslator.kt:31-42, FordTranslator.kt:30-52) and the five legacy
CommonEvent translators (TranslatorsIntegrationTest.kt:259-370,
FIXTURES.md §6).

``from_json`` with these schemas is the Spark analog of Jackson
``readValue``: a malformed document yields a NULL struct, which the
translator turns into a dropped record + dead-letter row (the reference's
catch-log-drop policy, GeotabTranslator.kt:154-157).  Required-field
enforcement is done explicitly post-parse (Spark's from_json has no
fail-on-missing), see operators/translators.py.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

_S, _D, _L = StringType(), DoubleType(), LongType()

# GeotabTranslator.kt:34-47 (@JsonProperty names are authoritative).
GEOTAB_RAW_SCHEMA = StructType([
    StructField("Device_ID", _S, True),          # required → deviceId
    StructField("Vehicle_ID", _S, True),         # required → vehicleId, partitionKey
    StructField("Record_DateTime", _S, True),    # required ISO-8601 → dateTime/epochSource
    StructField("Latitude", _D, True),           # required → telemetry.location.lat
    StructField("Longitude", _D, True),          # required → telemetry.location.lon
    StructField("Odometer_mi", _D, True),        # → telemetry.odometerCanMi
    StructField("EngineSpeed_rpm", _D, True),    # → telemetry.engineRpm
    StructField("Fuel_Level_pct", _D, True),     # → telemetry.fuelLevelPct
    StructField("Ignition_Status", _S, True),    # ON/OFF/other → UNKNOWN
    StructField("customGeotabField1", _S, True),  # → sourceSpecificData
    StructField("customGeotabField2", _L, True),  # → sourceSpecificData
])
GEOTAB_REQUIRED = ["Device_ID", "Vehicle_ID", "Record_DateTime", "Latitude", "Longitude"]

# CalAmpTranslator.kt:31-42.  msg_ts is epoch SECONDS (×1000 on ingest,
# CalAmpTranslator.kt:100).
CALAMP_RAW_SCHEMA = StructType([
    StructField("unit_id", _S, True),            # required → deviceId
    StructField("vid", _S, True),                # required → vehicleId, partitionKey
    StructField("msg_ts", _L, True),             # required epoch-s → epochSource(ms)
    StructField("gps_lat", _D, True),            # required
    StructField("gps_lon", _D, True),            # required
    StructField("speed_mph", _D, True),          # → telemetry.speedGpsMph
    StructField("fuel_percent", _D, True),       # → telemetry.fuelLevelPct
    StructField("voltage", _D, True),            # → telemetry.batteryVoltage
    StructField("calAmpSpecificValue", _S, True),  # → sourceSpecificData
])
CALAMP_REQUIRED = ["unit_id", "vid", "msg_ts", "gps_lat", "gps_lon"]

# FordTranslator.kt:30-52.  captureTime/coords.ts are epoch MILLIS; rpm is
# Int widened to Double (FordTranslator.kt:127).
FORD_RAW_SCHEMA = StructType([
    StructField("vin", _S, True),                # required → vehicleId, partitionKey
    StructField("esn", _S, True),                # required → deviceId
    StructField("captureTime", _L, True),        # required epoch-ms
    StructField("coords", StructType([
        StructField("latValue", _D, True),
        StructField("lonValue", _D, True),
        StructField("ts", _L, True),
    ]), True),
    StructField("vehicleSpeed", _D, True),       # → telemetry.speedGpsMph
    StructField("fuelRemainingGallons", _D, True),  # → telemetry.fuelLevelGallon
    StructField("rpm", _L, True),                # int → double → telemetry.engineRpm
    StructField("fordExtraData", MapType(_S, _S), True),  # → sourceSpecificData
])
FORD_REQUIRED = ["vin", "esn", "captureTime", "coords"]

# Legacy CommonEvent inputs (FIXTURES.md §6; TranslatorsIntegrationTest.kt:259-370).
LEGACY_RAW_SCHEMAS = {
    "user_profile": StructType([
        StructField("uid", _L, True),
        StructField("name", _S, True),
        StructField("created", _L, True),        # epoch-s
    ]),
    "order_record": StructType([
        StructField("orderId", _S, True),
        StructField("items", ArrayType(_S), True),
        StructField("placedAt", _S, True),       # ISO pass-through
    ]),
    "inventory_update": StructType([
        StructField("sku", _S, True),
        StructField("qty", _L, True),
        StructField("updateTime", _L, True),     # epoch-s
    ]),
    "payment_notice": StructType([
        StructField("txnId", _S, True),
        StructField("amount", _D, True),
        StructField("currency", _S, True),
        StructField("time", _S, True),           # ISO pass-through
    ]),
    "shipment_status": StructType([
        StructField("shipId", _S, True),
        StructField("status", _S, True),
        StructField("deliveredAt", _L, True),    # epoch-s
    ]),
}

# (source, eventType, timestamp-source-field, codec) per legacy translator —
# the contract table from TranslatorsIntegrationTest.kt:259-370.
LEGACY_CONTRACTS = {
    "user_profile": ("user-service", "USER_PROFILE_EVENT", "created", "epoch_s"),
    "order_record": ("order-service", "ORDER_EVENT", "placedAt", "iso"),
    "inventory_update": ("inventory-service", "INVENTORY_EVENT", "updateTime", "epoch_s"),
    "payment_notice": ("payment-gateway", "PAYMENT_EVENT", "time", "iso"),
    "shipment_status": ("shipping-service", "SHIPMENT_EVENT", "deliveredAt", "epoch_s"),
}
