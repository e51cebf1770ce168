"""Source registry — the connector layer (SURVEY.md §2.1) as a factory.

The reference wires 7 connector types through config-only YAML
(`pulsar-components/connectors/*/connector.yaml`): Kinesis, Kafka,
EventHub (Kafka-compatible), RabbitMQ, HTTP, gRPC, Pulsar.  In Spark each
becomes a ``readStream`` format + options; the payload contract is the
same everywhere: a string column ``value`` holding one JSON document
(what a Pulsar topic of JSON strings is).

Local/CI runs have no brokers, so the default kinds are file-backed
(``jsonl`` dir of JSON-lines files, streamed) and ``rate`` (synthetic) —
the production kinds (kafka/eventhub/kinesis) are config passthrough to
Spark's first-party connectors and resolve at deploy time.  RabbitMQ/HTTP
/gRPC have no first-party Spark source (reference's gRPC connector is
itself a stub with missing source); they map to the jsonl bridge-drop
pattern.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SOURCE_KINDS = (
    "jsonl", "rate", "kafka", "eventhub", "kinesis", "rabbitmq", "http", "grpc",
    "parquet", "orc", "csv", "json",
)


def open_source(
    spark: SparkSession,
    kind: str,
    streaming: bool = True,
    **options: Any,
) -> DataFrame:
    """Open a source as a DataFrame with a single string ``value`` column
    (plus source metadata columns where the connector provides them).

    kinds:
      jsonl    — options: path (dir of *.jsonl / *.json text files)
      parquet  — options: path, value_col (batch or stream over parquet)
      orc      — options: path, value_col (batch or stream over ORC)
      rate     — options: rows_per_second; value is a synthetic JSON doc
      kafka / eventhub — options passed through to Spark's kafka source
                 (eventhub = Kafka-compatible endpoint, connector.yaml:
                 azure-eventhub `connectorType: kafka`)
      kinesis  — passthrough to a kinesis connector if deployed
      rabbitmq/http/grpc — no first-party Spark source: expect a bridge
                 that drops JSON lines into `path` (same as jsonl)
    """
    kind = kind.lower()
    if kind in ("jsonl", "rabbitmq", "http", "grpc"):
        path = options["path"]
        reader = spark.readStream if streaming else spark.read
        # micro-batch granularity knob (streaming only): bounds each
        # epoch's file intake, so checkpoint recovery is exercised over
        # MANY commits instead of one availableNow mega-batch.
        mfpt = options.get("maxFilesPerTrigger")
        if streaming and mfpt:
            reader = reader.option("maxFilesPerTrigger", int(mfpt))
        # text() preserves the original byte-identical line — the Filterer
        # passthrough invariant needs the raw string, never a re-serialize.
        return reader.text(path).withColumnRenamed("value", "value")
    if kind in ("parquet", "orc"):
        # Columnar file sources (both built into Spark — no extra jars).
        path = options["path"]
        value_col = options.get("value_col", "value")
        batch_reader = getattr(spark.read, kind)
        if streaming:
            # streaming file sources need an explicit schema
            schema = batch_reader(path).schema
            df = getattr(spark.readStream.schema(schema), kind)(path)
        else:
            df = batch_reader(path)
        if value_col != "value":
            df = df.withColumn("value", F.col(value_col))
        return df
    if kind in ("csv", "json"):
        # Structured file sources: typed columns (schema required for
        # streaming); optional value_col names the payload column.
        path = options.pop("path")
        schema = options.pop("schema", None)
        value_col = options.pop("value_col", None)
        reader = spark.readStream if streaming else spark.read
        if schema is not None:
            reader = reader.schema(schema)
        elif streaming:
            raise ValueError(f"{kind} streaming source requires schema=")
        for k, v in options.items():
            reader = reader.option(k, v)
        df = reader.csv(path) if kind == "csv" else reader.json(path)
        if value_col:
            df = df.withColumn("value", F.col(value_col))
        return df
    if kind == "rate":
        if not streaming:
            raise ValueError("rate source is streaming-only")
        rps = options.get("rows_per_second", 100)
        df = spark.readStream.format("rate").option("rowsPerSecond", rps).load()
        # synthesize a Geotab-ish JSON payload so the translator path runs
        return df.select(
            F.to_json(
                F.struct(
                    F.concat(F.lit("dev-"), F.col("value").cast("string")).alias("Device_ID"),
                    F.concat(F.lit("veh-"), (F.col("value") % 100).cast("string")).alias("Vehicle_ID"),
                    F.date_format("timestamp", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("Record_DateTime"),
                    (F.col("value") % 90).cast("double").alias("Latitude"),
                    (F.col("value") % 180).cast("double").alias("Longitude"),
                )
            ).alias("value")
        )
    if kind in ("kafka", "eventhub"):
        reader = spark.readStream if streaming else spark.read
        r = reader.format("kafka")
        for k, v in options.items():
            r = r.option(k, v)
        # kafka value is binary → the string JSON contract
        return r.load().withColumn("value", F.col("value").cast("string"))
    if kind == "kinesis":
        reader = spark.readStream if streaming else spark.read
        r = reader.format(options.pop("format", "aws-kinesis"))
        for k, v in options.items():
            r = r.option(k, v)
        return r.load().withColumn("value", F.col("data").cast("string"))
    raise ValueError(f"unknown source kind: {kind} (known: {SOURCE_KINDS})")
