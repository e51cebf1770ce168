"""Geospatial analytics over the telemetry ping stream — grid density
and nearest-POI assignment.

Coordinates derive from events.value with the same deterministic
convention the telemetry family uses (`queries_extra.py`
telemetry_trip_distance: lat = value/10, lon = -value/7), so the
oracle recomputes identical doubles.  Trig parity: libm differs by
~1 ulp across engines, so every distance is rounded to 6 dp before
ordering/COMPARISON (the precedent telemetry_trip_summary set).

Scale shapes:
  * grid density is one partial-agg shuffle on an integer cell key —
    the standard first stage of any heatmap/tile pipeline;
  * nearest-POI replicates the POI table (8 rows; thousands in a real
    deployment — still KB) against the ping stream: a broadcast
    nested-loop whose cost is linear in pings, followed by a per-ping
    argmin expressed as min(struct) — NO shuffle of the ping stream.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pulsar_ingestion_spark.functions.geo import haversine_km
from pulsar_ingestion_spark.registry import query
from pulsar_ingestion_spark.session import load_tables

_GRID_ORACLE = """
WITH pings AS (
  SELECT value / 10 AS lat, -value / 7 AS lon, value FROM events
)
SELECT CAST(floor(lat) AS BIGINT) AS cell_lat,
       CAST(floor(lon) AS BIGINT) AS cell_lon,
       count(*) AS n_pings,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_value
FROM pings
GROUP BY cell_lat, cell_lon
"""


@query("geo_grid_density", oracle=_GRID_ORACLE)
def q_geo_grid_density(spark, sf_dir):
    """1°×1° grid density of the ping stream (heatmap/tile stage 1).
    floor() on identical IEEE doubles is engine-stable, the cell key is
    two small ints, and the agg is one partial-agg shuffle — at 100 TB
    each map task collapses to ≤ |occupied cells| rows."""
    ev = load_tables(spark, sf_dir)["events"]
    pings = ev.select(
        (F.col("value") / 10).alias("lat"),
        (-F.col("value") / 7).alias("lon"),
        "value",
    )
    return pings.groupBy(
        F.floor("lat").cast("bigint").alias("cell_lat"),
        F.floor("lon").cast("bigint").alias("cell_lon"),
    ).agg(
        F.count("*").alias("n_pings"),
        # UNROUNDED on purpose: both engines divide bit-identical doubles
        # (exact decimal sum, exact count) → identical IEEE quotient.
        # round-after-divide is what breaks parity here: 2-decimal sums over
        # counts like 80 land EXACTLY on .00005 boundaries, where Spark's
        # BigDecimal HALF_UP and DuckDB's scaled-multiply round disagree.
        (F.sum(F.col("value").cast("decimal(18,4)")).cast("double") / F.count("*"))
        .alias("avg_value"),
    )


# Deterministic station grid: 8 POIs spanning the ping envelope
# (value ∈ [0, ~330] → lat ∈ [0, 33], lon ∈ [-47, 0]).
_POIS = [(i, 2.0 + 4.0 * i, -3.0 - 6.0 * i) for i in range(8)]

_POI_SQL_ROWS = ", ".join(f"({i}, CAST({la} AS DOUBLE), CAST({lo} AS DOUBLE))" for i, la, lo in _POIS)

_NEAREST_ORACLE = f"""
WITH pois(poi_id, plat, plon) AS (VALUES {_POI_SQL_ROWS}),
pings AS (
  SELECT event_id, value / 10 AS lat, -value / 7 AS lon FROM events
), scored AS (
  SELECT p.event_id, q.poi_id,
         round(2 * 6371.0 * asin(sqrt(
           pow(sin(radians(q.plat - p.lat) / 2), 2)
           + cos(radians(p.lat)) * cos(radians(q.plat))
             * pow(sin(radians(q.plon - p.lon) / 2), 2))), 6) AS dist_km
  FROM pings p CROSS JOIN pois q
), best AS (
  SELECT event_id, poi_id, dist_km,
         row_number() OVER (PARTITION BY event_id ORDER BY dist_km, poi_id) AS rn
  FROM scored
)
SELECT event_id, poi_id AS nearest_poi, dist_km FROM best WHERE rn = 1
"""


@query("geo_nearest_poi", oracle=_NEAREST_ORACLE)
def q_geo_nearest_poi(spark, sf_dir):
    """Nearest point-of-interest per ping: broadcast the (tiny) POI
    table against the stream, compute rounded haversine to each, and
    take the per-ping argmin as min(struct(dist, poi)) — a single
    narrow pass over the pings with zero shuffle (the window-based
    form would shuffle every ping on event_id; min(struct) folds the
    argmin into the broadcast-join stage map-side)."""
    spark_pois = F.array(
        *[
            F.struct(
                F.lit(i).alias("poi_id"),
                F.lit(la).cast("double").alias("plat"),
                F.lit(lo).cast("double").alias("plon"),
            )
            for i, la, lo in _POIS
        ]
    )
    ev = load_tables(spark, sf_dir)["events"]
    pings = ev.select(
        "event_id",
        (F.col("value") / 10).alias("lat"),
        (-F.col("value") / 7).alias("lon"),
    )
    scored = pings.select(
        "event_id",
        F.explode(spark_pois).alias("poi"),
        "lat",
        "lon",
    ).select(
        "event_id",
        F.col("poi.poi_id").alias("poi_id"),
        F.round(
            haversine_km(F.col("lat"), F.col("lon"), F.col("poi.plat"), F.col("poi.plon")), 6
        ).alias("dist_km"),
    )
    best = scored.groupBy("event_id").agg(
        F.min(F.struct("dist_km", "poi_id")).alias("b")
    )
    return best.select(
        "event_id",
        F.col("b.poi_id").alias("nearest_poi"),
        F.col("b.dist_km").alias("dist_km"),
    )
