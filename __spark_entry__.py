"""Driver contract for the spark-graft builder (PySpark target).

``entry``: flagship query (per-source hourly fleet activity over the three
translated CMF branches — SURVEY.md §7.1).
``queries`` / ``oracle_sql``: the declared analytics surface from
SURVEY.md §2.5, implemented in ``pulsar_ingestion_spark/queries_*.py``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Importing the query modules populates the registry.
import pulsar_ingestion_spark.queries_core  # noqa: F401
import pulsar_ingestion_spark.queries_translate  # noqa: F401
import pulsar_ingestion_spark.queries_llm  # noqa: F401
import pulsar_ingestion_spark.queries_extra  # noqa: F401
from pulsar_ingestion_spark.registry import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: synthesize the three raw telemetry feeds from sf0.001
    events, run all three CMF translators, union into the canonical stream,
    and compute per-source hourly activity (count + distinct vehicles)."""
    import pyspark.sql.functions as F

    from pulsar_ingestion_spark.queries_translate import (
        cmf_translate_calamp,
        cmf_translate_ford,
        cmf_translate_geotab,
    )

    sf_dir = "/root/testdata/sf0.001"
    # union on a timestamp column directly — one conversion per branch
    g = cmf_translate_geotab(spark, sf_dir).select(
        "source_type", "vehicle_id", F.to_timestamp(F.col("date_time")).alias("event_time")
    )
    c = cmf_translate_calamp(spark, sf_dir).select(
        "source_type", "vehicle_id", F.to_timestamp(F.col("date_time")).alias("event_time")
    )
    f = cmf_translate_ford(spark, sf_dir).select(
        F.lit("Ford").alias("source_type"),
        "vehicle_id",
        F.timestamp_millis(F.col("epoch_source")).alias("event_time"),
    )
    cmf = g.unionByName(c).unionByName(f)
    return (
        cmf.withColumn("hour", F.date_trunc("hour", F.col("event_time")))
        .groupBy("source_type", "hour")
        .agg(
            F.count("*").alias("msg_cnt"),
            F.approx_count_distinct("vehicle_id").alias("approx_vehicles"),
        )
        .orderBy("source_type", "hour")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.5."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted for non-SQL-expressible
    operators → driver records a rows-only check)."""
    return dict(ORACLES)
