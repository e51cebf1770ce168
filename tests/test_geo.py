"""Geo analytics: built-in haversine vs the Arrow/numpy pandas_udf path
must agree (both round per-segment at 6dp before the exact decimal sum)."""

from __future__ import annotations

from pulsar_ingestion_spark.queries_extra import telemetry_trip_distance, udf_pandas_haversine


def test_builtin_and_pandas_udf_agree(spark, sf_dir):
    builtin = {
        r["vehicle"]: r["total_km"] for r in telemetry_trip_distance(spark, sf_dir).collect()
    }
    arrow = {
        r["vehicle"]: r["total_km"] for r in udf_pandas_haversine(spark, sf_dir).collect()
    }
    assert builtin.keys() == arrow.keys()
    for k in builtin:
        assert abs(builtin[k] - arrow[k]) < 1e-6, (k, builtin[k], arrow[k])
