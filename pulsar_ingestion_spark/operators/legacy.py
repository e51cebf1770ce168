"""Legacy CommonEvent translators — one parameterized transform for all five.

The reference's removed-but-specified business translators
(UserProfile/OrderRecord/InventoryUpdate/PaymentNotice/ShipmentStatus;
contracts recovered from TranslatorsIntegrationTest.kt:259-370 and
filterer/README.md:16-25) all share one shape:

    {input JSON} → CommonEvent{eventId: uuid, source: <const>,
                               eventType: <const>, timestamp: <converted>,
                               data: original input verbatim}

with two timestamp codecs: epoch-seconds → ISO, or ISO pass-through.
That collapses to a single DataFrame transform parameterized by
(schema, source, eventType, ts field, codec) — SURVEY.md §2.4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pulsar_ingestion_spark.functions.timeutil import epoch_seconds_to_iso8601
from pulsar_ingestion_spark.schemas.raw import LEGACY_CONTRACTS, LEGACY_RAW_SCHEMAS


def translate_legacy(
    df: DataFrame,
    kind: str,
    payload_col: str = "value",
    deterministic_id: bool = False,
) -> DataFrame:
    """Raw business JSON → CommonEvent columns.

    ``kind`` ∈ {user_profile, order_record, inventory_update,
    payment_notice, shipment_status}.  Output columns: eventId, source,
    eventType, timestamp, data (original payload verbatim — the
    pass-through invariant from the integration-test assertions).

    ``deterministic_id=True`` derives eventId from a hash of the payload
    instead of ``uuid()`` so tests/oracles can reproduce it; production
    default matches the reference's generated-UUID contract
    (eventId non-blank, TranslatorsIntegrationTest.kt:224).
    """
    if kind not in LEGACY_CONTRACTS:
        raise ValueError(f"unknown legacy translator kind: {kind}")
    source, event_type, ts_field, codec = LEGACY_CONTRACTS[kind]
    schema = LEGACY_RAW_SCHEMAS[kind]

    raw = F.col(payload_col)
    # Generate barrier → single parse per row (see translators.py note).
    df = df.withColumn("_p", F.explode(F.array(F.from_json(raw, schema))))
    parsed = F.col("_p")
    ts_in = parsed.getField(ts_field)
    if codec == "epoch_s":
        ts = epoch_seconds_to_iso8601(ts_in.cast("long"))
    else:  # ISO pass-through
        ts = ts_in.cast("string")
    event_id = (
        F.sha2(raw, 256) if deterministic_id else F.expr("uuid()")
    )
    required = [f.name for f in schema.fields]
    valid = raw.isNotNull() & parsed.isNotNull()
    for f in required:
        valid = valid & parsed.getField(f).isNotNull()
    return df.filter(valid).select(
        *[c for c in df.columns if c != "_p"],
        event_id.alias("eventId"),
        F.lit(source).alias("source"),
        F.lit(event_type).alias("eventType"),
        ts.alias("timestamp"),
        raw.alias("data"),
    )


def route_by_event_type(
    df: DataFrame,
    base_path: str,
    event_type_col: str = "eventType",
    payload_col: str = "data",
    mode: str = "append",
) -> None:
    """EventTypeSplitter sink: partitioned write by the sanitized routing
    key — each dir is the `fn-split-<event-type>` topic analog
    (filterer/README.md:16-37).  Same one-shuffle-free partitioned-write
    shape as the tenant router."""
    keyed = event_type_routing_key(df, event_type_col)
    keyed.select("routing_key", F.col(payload_col)).write.mode(mode).partitionBy(
        "routing_key"
    ).parquet(base_path)


def event_type_routing_key(df: DataFrame, event_type_col: str = "eventType") -> DataFrame:
    """EventTypeSplitter routing key: lowercase, non-[a-z0-9-] runs → '-'
    (filterer/README.md:31-35).  Destination topic is
    ``fn-split-<key>``; here the key is a column the sink partitions by."""
    key = F.regexp_replace(F.lower(F.col(event_type_col)), "[^a-z0-9-]+", "-")
    return df.withColumn("routing_key", key)
