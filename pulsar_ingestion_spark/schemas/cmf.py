"""Canonical Common Message Format (CMF) envelope as a Spark StructType.

Reference: the Kotlin data classes in
``libs/src/main/kotlin/com/example/pulsar/common/CommonMessageFormat.kt``
(envelope :467-479, telemetry :282-419, events :425-440, meta :446-448).
The Kotlin class hierarchy IS the reference's schema registry; here it is
one declared StructType so Catalyst can prune the ~90 leaf columns on scan.

Design decisions (SURVEY.md §1.6):
  * timestamps carried as ISO-8601 string ``dateTime`` + epoch-millis long
    ``epochSource`` exactly as the translators write them
    (GeotabTranslator.kt:108-109; doc comment at CommonMessageFormat.kt:456
    says seconds but all implementations + unit tests write millis);
  * enums are StringType with closed value sets, UNKNOWN as the null-ish
    default (GeotabTranslator.kt:120-124);
  * ``sourceSpecificData`` is a lossless JSON string — the only
    schema-dynamic field (mirrors "no data loss", architecture.md:87);
  * ``meta`` carries the de-facto routing field ``tenantId``
    (Filterer.kt:29) plus ``additionalProperties`` map.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

# CommonMessageFormat.kt:7-9 — the 20-value SourceType enum.
SOURCE_TYPES = [
    "Geotab", "CalAmp", "Gm", "Toyota", "Ford", "DaimlerPro", "FleetComplete",
    "Volkswagen", "Tesla", "Bmw", "Azuga", "Mb", "PlatformScience", "Samsara",
    "Stellantis", "Rivian", "Isaac", "Motive", "Hyundai", "OmnitracsOT1",
]

# Closed enum value sets (CommonMessageFormat.kt:14-172). UNKNOWN is the
# default for unrecognized/absent input.
ENUM_VALUES = {
    "ignitionStatus": ["ON", "OFF", "UNKNOWN"],
    "devicePowerSource": ["BATTERY", "EXTERNAL", "UNKNOWN"],
    "milStatus": ["ON", "OFF", "UNKNOWN"],
    "collisionState": ["DETECTED", "NOT_DETECTED", "UNKNOWN"],
    "gearPosition": ["PARK", "REVERSE", "NEUTRAL", "DRIVE", "LOW", "UNKNOWN"],
    "sunRoofStatus": ["OPEN", "CLOSED", "AJAR", "UNKNOWN"],
    "evPlugStatus": ["PLUGGED", "UNPLUGGED", "UNKNOWN"],
    "evChargingState": ["CHARGING", "NOT_CHARGING", "COMPLETE", "FAULT", "UNKNOWN"],
    "evChargeType": ["AC_LEVEL_1", "AC_LEVEL_2", "DC_FAST_CHARGE", "UNKNOWN"],
    "seatbeltStatus": ["FASTENED", "NOT_FASTENED", "UNKNOWN"],
    "frontPassengerSeatBeltStatus": ["FASTENED", "NOT_FASTENED", "UNKNOWN"],
    "cellRssiStatus": ["EXCELLENT", "GOOD", "FAIR", "POOR", "UNKNOWN"],
    "light": ["ON", "OFF", "UNKNOWN"],
    "dieselExhaustFluidStatus": ["NORMAL", "LOW", "CRITICALLY_LOW", "UNKNOWN"],
    "dieselExhaustFilterStatus": ["NORMAL", "REGENERATING", "NEEDS_SERVICE", "UNKNOWN"],
}

# CommonLocation (CommonMessageFormat.kt:180-184)
LOCATION_SCHEMA = StructType([
    StructField("timestamp", StringType(), True),
    StructField("lon", DoubleType(), True),
    StructField("lat", DoubleType(), True),
])

_D = DoubleType()
_S = StringType()

# The ~45 plain-double telemetry signals (CommonMessageFormat.kt:288-418).
TELEMETRY_DOUBLE_FIELDS = [
    "speedCanMph", "speedGpsMph", "odometerCanMi", "odometerGpsMi",
    "fuelLevelPct", "fuelLevelGallon", "engineRunTimeCanHrs", "batteryVoltage",
    "engineCoolantTempC", "dieselExhaustFluidLevel", "heading",
    "engineOilPressure", "ambientTemp", "oilLifePct", "engineRpm",
    "engineIdleTimeCanHrs", "acceleration", "accelerationLat",
    "evEnergyRemaining", "evBatteryRange", "evBatteryRangeConservative",
    "evBatteryLevel", "evChargingEnergyAdded", "evChargingRate",
    "evTimeToFullCharge", "evChargingVoltage", "evChargingCurrent",
    "evLifetimeEnergyAdded", "engineCoolantLevel", "engineTransOilTemp",
    "fuelAlcoholContent", "fuelFilterLife", "evEnergyUsedFromDeviceInstall",
    "crankingVoltage", "lifetimeFuelEconomy", "lifetimeEVEfficiency",
    "evChargingPower", "fuelAmount", "engineAirFilterLife",
    "fuelLevelAdjusted", "fuelAmountAdjusted",
]

# The ~16 enum-typed telemetry signals (string with closed value sets).
TELEMETRY_ENUM_FIELDS = [
    "ignitionStatus", "devicePowerSource", "milStatus", "collisionState",
    "gearPosition", "sunRoofStatus", "evPlugStatus", "evChargingState",
    "evChargeType", "seatbeltStatus", "frontPassengerSeatBeltStatus",
    "cellRssiStatus", "checkEngineLight", "absWarningLight",
    "airbagWarningLight", "tractionControlLight", "tirePressureWarningLight",
    "oilPressureWarningLight", "dieselExhaustFluidStatus",
    "dieselExhaustFilterStatus",
]

COMMON_TELEMETRY_SCHEMA = StructType(
    [StructField("location", LOCATION_SCHEMA, True)]
    + [StructField(f, _D, True) for f in TELEMETRY_DOUBLE_FIELDS]
    + [StructField(f, _S, True) for f in TELEMETRY_ENUM_FIELDS]
    + [
        # CommonMessageFormat.kt:190-210
        StructField("tirePressure", StructType([
            StructField("pressures", MapType(_S, _D), True)]), True),
        StructField("windowStatus", StructType([
            StructField("statuses", MapType(_S, _S), True)]), True),
        StructField("brakePadLife", StructType([
            StructField("frontPct", _D, True),
            StructField("rearPct", _D, True)]), True),
    ]
)

# CommonEvents — arrays of typed event records (CommonMessageFormat.kt:425-440).
_HAHBHC = StructType([
    StructField("type", _S, True),
    StructField("magnitude", _D, True),
    StructField("timestamp", _S, True),
    StructField("durationMs", LongType(), True),
])

COMMON_EVENTS_SCHEMA = StructType([
    StructField("dtcEvents", ArrayType(StructType([
        StructField("code", _S, True),
        StructField("description", _S, True),
        StructField("timestamp", _S, True),
        StructField("isActive", BooleanType(), True),
    ])), True),
    StructField("serviceWarningsEvents", ArrayType(StructType([
        StructField("warningType", _S, True),
        StructField("message", _S, True),
        StructField("timestamp", _S, True),
        StructField("severity", _S, True),
    ])), True),
    StructField("hardBraking", ArrayType(_HAHBHC), True),
    StructField("hardAcceleration", ArrayType(_HAHBHC), True),
    StructField("harshCornering", ArrayType(_HAHBHC), True),
    StructField("predeliveryEvents", ArrayType(StructType([
        StructField("eventName", _S, True),
        StructField("timestamp", _S, True),
        StructField("details", MapType(_S, _S), True),
    ])), True),
    StructField("deviceEvents", ArrayType(StructType([
        StructField("eventType", _S, True),
        StructField("timestamp", _S, True),
        StructField("details", MapType(_S, _S), True),
    ])), True),
])

# CommonMeta (CommonMessageFormat.kt:446-448) + de-facto routing field
# meta.tenantId (Filterer.kt:29, FiltererTest.kt:72-77).
META_SCHEMA = StructType([
    StructField("tenantId", _S, True),
    StructField("additionalProperties", MapType(_S, _S), True),
])

# The envelope (CommonMessageFormat.kt:467-479).
CMF_SCHEMA = StructType([
    StructField("dateTime", _S, False),
    StructField("epochSource", LongType(), False),
    StructField("vehicleId", _S, False),
    StructField("deviceId", _S, False),
    StructField("tenantId", _S, True),
    StructField("sourceType", _S, False),
    StructField("partitionKey", _S, False),
    StructField("telemetry", COMMON_TELEMETRY_SCHEMA, True),
    StructField("events", COMMON_EVENTS_SCHEMA, True),
    StructField("sourceSpecificData", _S, True),
    StructField("meta", META_SCHEMA, True),
])

# Legacy CommonEvent (recovered spec — TranslatorsIntegrationTest.kt:223-231,
# filterer/README.md:16-25). `data` is the original input JSON, verbatim.
COMMON_EVENT_SCHEMA = StructType([
    StructField("eventId", _S, False),
    StructField("source", _S, False),
    StructField("eventType", _S, False),
    StructField("timestamp", _S, False),
    StructField("data", _S, False),
])
