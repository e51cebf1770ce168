from pulsar_ingestion_spark.sources.registry import open_source, SOURCE_KINDS  # noqa: F401
