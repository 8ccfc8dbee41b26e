"""Geospatial primitives: haversine distance, grid bucketing, and
grid-blocked nearest-neighbor joins.

The reference's rows ARE geolocated (METAR stations carry lat/lon —
reference: collector/main.py normalizes `coordinates`; SURVEY.md §1.1)
and the canonical geo questions over such a table are "which station
is nearest to X" and "how dense is coverage per region". A naive
nearest-neighbor is |probes| × |stations| — the geo analog of the
interval cross join — so the scale form blocks by a lat/lon grid
cell first:

- each station maps to ONE integer grid cell (pure column math on the
  scan; at 100 TB the station table is written partitionBy(cell) and
  lookups partition-prune);
- each probe explodes to its cell + the 8 neighbors (a bounded 9×
  narrow generator on the SMALL side), equi-joins the station grid,
  and refines with exact haversine — a hash join plus per-row math,
  never a cross product;
- the 3×3 neighborhood bounds the search radius to one cell size:
  correct whenever the cell edge exceeds the max nearest-neighbor
  distance (density-dependent), and ALWAYS an upper-bounded candidate
  set. The brute-force twin stays the correctness baseline.

Determinism: trig runs in IEEE doubles on both engines (last-ulp libm
differences are absorbed by 6-decimal rounding); cell ids are pure
integer arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0088


def haversine_km(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in km (haversine; inputs in degrees)."""
    p1, p2 = F.radians(lat1), F.radians(lat2)
    dp = F.radians(lat2 - lat1)
    dl = F.radians(lon2 - lon1)
    a = (
        F.sin(dp / 2) * F.sin(dp / 2)
        + F.cos(p1) * F.cos(p2) * F.sin(dl / 2) * F.sin(dl / 2)
    )
    return F.lit(2 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def grid_cell(lat: Column, lon: Column, cell_deg: float) -> Column:
    """One BIGINT cell id per (lat, lon): row-major index over a
    (360/cell_deg)-wide grid. Integer arithmetic only — identical on
    any engine."""
    cols = int(round(360.0 / cell_deg))
    gy = F.floor((lat + F.lit(90.0)) / F.lit(cell_deg)).cast("long")
    gx = F.floor((lon + F.lit(180.0)) / F.lit(cell_deg)).cast("long")
    return gy * F.lit(cols) + gx


def neighbor_cells(lat: Column, lon: Column, cell_deg: float) -> Column:
    """Array of the 3×3 neighborhood's cell ids around (lat, lon) —
    the probe-side blocking set. Longitude neighbors do not wrap at
    the antimeridian (fine away from ±180; wrap-aware variant adds a
    modulo on gx)."""
    cols = int(round(360.0 / cell_deg))
    gy = F.floor((lat + F.lit(90.0)) / F.lit(cell_deg)).cast("long")
    gx = F.floor((lon + F.lit(180.0)) / F.lit(cell_deg)).cast("long")
    offsets = F.expr(
        "array(-1,-1,-1,0,0,0,1,1,1)"
    )  # dy per position; dx cycles -1,0,1
    return F.transform(
        F.sequence(F.lit(0), F.lit(8)),
        lambda i: (gy + F.element_at(offsets, i + 1))
        * F.lit(cols)
        + (gx + (i % 3) - 1),
    )


def grid_nearest(
    stations: DataFrame,
    probes: DataFrame,
    cell_deg: float,
    station_id: str = "station_id",
    probe_id: str = "probe_id",
) -> DataFrame:
    """Nearest station per probe within the probe's 3×3 grid
    neighborhood: (probe_id, station_id, dist_km). Probes explode to 9
    candidate cells (narrow, small side), equi-join the station grid,
    refine with exact haversine, min_by per probe. Probes whose
    neighborhood holds no station drop out (radius-bounded search)."""
    st = stations.select(
        F.col(station_id).alias("sid"),
        F.col("lat").alias("slat"),
        F.col("lon").alias("slon"),
        grid_cell(F.col("lat"), F.col("lon"), cell_deg).alias("cell"),
    )
    pr = probes.select(
        F.col(probe_id).alias("pid"),
        F.col("lat").alias("plat"),
        F.col("lon").alias("plon"),
        F.explode(
            neighbor_cells(F.col("lat"), F.col("lon"), cell_deg)
        ).alias("cell"),
    )
    d = F.round(
        haversine_km(
            F.col("plat"), F.col("plon"), F.col("slat"), F.col("slon")
        ),
        6,
    )
    return (
        pr.join(st, "cell")
        .select("pid", "sid", d.alias("dist_km"))
        .groupBy("pid")
        .agg(
            F.min_by(
                F.struct("sid", "dist_km"),
                F.struct(F.col("dist_km"), F.col("sid")),
            ).alias("_b")
        )
        .select(
            F.col("pid").alias(probe_id),
            F.col("_b.sid").alias(station_id),
            F.col("_b.dist_km").alias("dist_km"),
        )
    )
