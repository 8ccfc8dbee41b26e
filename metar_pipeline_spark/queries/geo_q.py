"""Geospatial queries — nearest-station lookup and grid density.

The reference's stations are geolocated (collector/main.py normalizes
the METAR `coordinates` array; SURVEY.md §1.1), so nearest-station and
coverage-density are in-domain questions. The testdata has no lat/lon
column; station coordinates derive DETERMINISTICALLY from customer
keys via the repo's multiplicative-hash-to-[0,1) pattern (identical
integer+double arithmetic on both engines), which makes the geometry
oracle-checkable while exercising the real operators
(operators/geo.py).

Scale notes are on the operator module: grid blocking turns the
|probes|×|stations| nearest-neighbor into a 9-cell equi-join; the
brute-force twin stays as the correctness baseline (and recall
reference in tests).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from metar_pipeline_spark.io import load_table
from metar_pipeline_spark.operators.geo import (
    grid_cell,
    grid_nearest,
    haversine_km,
)
from metar_pipeline_spark.queries import register

CELL_DEG = 30.0  # 12 x 6 grid


def _hash01(key, mult):
    return ((key * F.lit(mult)) % F.lit(4294967296)) / F.lit(4294967296.0)


def _stations(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    return c.select(
        k.alias("station_id"),
        (_hash01(k, 2654435761) * F.lit(120.0) - F.lit(60.0)).alias("lat"),
        (_hash01(k, 2246822519) * F.lit(360.0) - F.lit(180.0)).alias("lon"),
    )


def _probes(spark, sf_dir):
    s = load_table(spark, sf_dir, "supplier").filter(F.col("s_suppkey") < 5)
    k = F.col("s_suppkey")
    return s.select(
        k.alias("probe_id"),
        (_hash01(k, 2654435761) * F.lit(120.0) - F.lit(60.0)).alias("lat"),
        (_hash01(k, 2246822519) * F.lit(360.0) - F.lit(180.0)).alias("lon"),
    )


_LAT = "(({k} * {m}) % 4294967296) / 4294967296.0 * 120.0 - 60.0"
_LON = "(({k} * {m}) % 4294967296) / 4294967296.0 * 360.0 - 180.0"
_ST = (
    "SELECT c_custkey AS station_id, "
    + _LAT.format(k="c_custkey", m=2654435761)
    + " AS lat, "
    + _LON.format(k="c_custkey", m=2246822519)
    + " AS lon FROM customer"
)
_PR = (
    "SELECT s_suppkey AS probe_id, "
    + _LAT.format(k="s_suppkey", m=2654435761)
    + " AS lat, "
    + _LON.format(k="s_suppkey", m=2246822519)
    + " AS lon FROM supplier WHERE s_suppkey < 5"
)
_HAV = (
    "2 * 6371.0088 * asin(sqrt("
    "sin(radians({lat2} - {lat1}) / 2) * sin(radians({lat2} - {lat1}) / 2)"
    " + cos(radians({lat1})) * cos(radians({lat2}))"
    " * sin(radians({lon2} - {lon1}) / 2)"
    " * sin(radians({lon2} - {lon1}) / 2)))"
)


@register(
    "geo_nearest_station_bruteforce",
    f"""
    WITH st AS ({_ST}), pr AS ({_PR}),
    d AS (
      SELECT pr.probe_id, st.station_id,
             round({_HAV.format(lat1="pr.lat", lon1="pr.lon",
                                lat2="st.lat", lon2="st.lon")}, 6)
               AS dist_km
      FROM pr CROSS JOIN st
    )
    SELECT probe_id, station_id, dist_km FROM d
    QUALIFY ROW_NUMBER() OVER (
      PARTITION BY probe_id ORDER BY dist_km, station_id) = 1
    """,
    doc=(
        "Exact nearest station per probe point (haversine over the "
        "full broadcast station set; the correctness baseline for the "
        "grid-blocked form) — coordinates derive deterministically "
        "from keys via the multiplicative-hash pattern so the "
        "spherical geometry is oracle-checkable"
    ),
)
def geo_nearest_station_bruteforce(spark, sf_dir):
    st = _stations(spark, sf_dir)
    pr = _probes(spark, sf_dir)
    d = F.round(
        haversine_km(
            F.col("plat"), F.col("plon"), F.col("lat"), F.col("lon")
        ),
        6,
    )
    return (
        pr.select(
            F.col("probe_id"),
            F.col("lat").alias("plat"),
            F.col("lon").alias("plon"),
        )
        .join(F.broadcast(st))
        .select("probe_id", "station_id", d.alias("dist_km"))
        .groupBy("probe_id")
        .agg(
            F.min_by(
                F.struct("station_id", "dist_km"),
                F.struct(F.col("dist_km"), F.col("station_id")),
            ).alias("_b")
        )
        .select(
            "probe_id",
            F.col("_b.station_id").alias("station_id"),
            F.col("_b.dist_km").alias("dist_km"),
        )
    )


@register(
    "geo_grid_station_density",
    f"""
    WITH st AS ({_ST})
    SELECT CAST(floor((lat + 90.0) / 30.0) AS BIGINT) * 12
           + CAST(floor((lon + 180.0) / 30.0) AS BIGINT) AS cell,
           COUNT(*) AS n_stations
    FROM st GROUP BY 1
    """,
    doc=(
        "Station coverage density per 30-degree grid cell — the "
        "integer cell id is the spatial partitioning key: at 100 TB "
        "the station table is written partitionBy(cell) and every "
        "lookup below partition-prunes on it (one hash agg riding the "
        "scan)"
    ),
)
def geo_grid_station_density(spark, sf_dir):
    st = _stations(spark, sf_dir)
    return st.groupBy(
        grid_cell(F.col("lat"), F.col("lon"), CELL_DEG).alias("cell")
    ).agg(F.count(F.lit(1)).alias("n_stations"))


@register(
    "geo_grid_nearest_station",
    f"""
    WITH st AS (
      SELECT station_id, lat, lon,
             CAST(floor((lat + 90.0) / 30.0) AS BIGINT) * 12
             + CAST(floor((lon + 180.0) / 30.0) AS BIGINT) AS cell
      FROM ({_ST})
    ),
    pr AS (
      SELECT probe_id, lat, lon,
             CAST(floor((lat + 90.0) / 30.0) AS BIGINT) AS gy,
             CAST(floor((lon + 180.0) / 30.0) AS BIGINT) AS gx
      FROM ({_PR})
    ),
    prc AS (
      SELECT probe_id, lat, lon,
             unnest(list_transform(generate_series(0, 8),
               i -> (gy + (i // 3) - 1) * 12 + (gx + (i % 3) - 1)))
               AS cell
      FROM pr
    ),
    d AS (
      SELECT prc.probe_id, st.station_id,
             round({_HAV.format(lat1="prc.lat", lon1="prc.lon",
                                lat2="st.lat", lon2="st.lon")}, 6)
               AS dist_km
      FROM prc JOIN st USING (cell)
    )
    SELECT probe_id, station_id, dist_km FROM d
    QUALIFY ROW_NUMBER() OVER (
      PARTITION BY probe_id ORDER BY dist_km, station_id) = 1
    """,
    doc=(
        "Grid-blocked nearest station: each probe explodes to its "
        "3x3 cell neighborhood (bounded 9x generator on the SMALL "
        "side) and equi-joins the station grid before the exact "
        "haversine refine — the 2D analog of the bucketed range join "
        "that keeps spatial lookups hash-based instead of a cross "
        "product; radius bounded by one cell, brute-force twin is the "
        "baseline (recall pinned in tests)"
    ),
)
def geo_grid_nearest_station(spark, sf_dir):
    st = _stations(spark, sf_dir)
    pr = _probes(spark, sf_dir)
    return grid_nearest(st, pr, CELL_DEG, "station_id", "probe_id")
