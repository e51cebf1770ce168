from pulsar_ingestion_spark.plans.pipeline import PipelineRun, PipelineSpec, run_pipeline  # noqa: F401
