from pulsar_ingestion_spark.plans.pipeline import PipelineSpec, run_pipeline  # noqa: F401
