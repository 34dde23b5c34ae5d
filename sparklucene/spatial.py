"""Spatial search — geodist, bbox filter, heatmap facets.

Mirrors the reference's spatial user surface (public knowledge:
u8:solr/core/.../search/function/distance/HaversineConstFunction.java
(`geodist()`), u8:solr/core/.../handler/component/SpatialHeatmapFacets.java,
and the `{!bbox}` filter of SpatialFilterQParser) re-expressed as Catalyst
expressions over plain lat/lon DOUBLE columns — no geometry objects, no
UDFs, whole-stage-codegen throughout.

Float-determinism contract (what the DuckDB oracle relies on):
  * +, -, *, /, sqrt, floor are IEEE-754-exact — bit-identical across the
    JVM and any libm, so bbox predicates and heatmap bin ids match
    bit-for-bit.
  * sin/cos/asin carry ~1 ulp of libm freedom, so great-circle DISTANCES
    are only reproducible to ~1e-13 relative; every distance the engine
    reports is therefore rounded to 3 decimals (meter precision) and
    ordering ties break on doc id. Degrees→radians uses an explicit
    multiply by the same pre-computed double constant on both sides
    (java.lang.Math.toRadians divides by 180 FIRST — a different rounding).

Scale notes: all three operators are narrow projections/filters/aggs over
the scan — predicate pushdown and partial aggregation apply untouched; the
heatmap output is (rows x cols) cells regardless of input size.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: IUGG mean earth radius, km — the constant Solr's geodist() uses
#: (DistanceUtils.EARTH_MEAN_RADIUS_KM).
EARTH_MEAN_RADIUS_KM = 6371.0087714

#: degrees -> radians multiplier, pre-computed so both engine and oracle
#: multiply by the identical double (see module docstring).
DEG_TO_RAD = math.pi / 180.0


def _rad(deg: Column | float) -> Column:
    c = deg if isinstance(deg, Column) else F.lit(float(deg))
    return c * F.lit(DEG_TO_RAD)


def geodist_km(lat1: Column | float, lon1: Column | float,
               lat2: Column | float, lon2: Column | float) -> Column:
    """Great-circle (haversine) distance in km — Solr ``geodist()``.

        2 * R * asin(sqrt(sin^2(dphi/2) + cos(phi1) cos(phi2) sin^2(dlmb/2)))
    """
    lat1c = lat1 if isinstance(lat1, Column) else F.lit(float(lat1))
    lat2c = lat2 if isinstance(lat2, Column) else F.lit(float(lat2))
    lon1c = lon1 if isinstance(lon1, Column) else F.lit(float(lon1))
    lon2c = lon2 if isinstance(lon2, Column) else F.lit(float(lon2))
    sdphi = F.sin(_rad(lat2c - lat1c) / F.lit(2.0))
    sdlmb = F.sin(_rad(lon2c - lon1c) / F.lit(2.0))
    a = (sdphi * sdphi
         + F.cos(_rad(lat1c)) * F.cos(_rad(lat2c)) * sdlmb * sdlmb)
    return (F.lit(2.0) * F.lit(EARTH_MEAN_RADIUS_KM)
            * F.asin(F.sqrt(a)))


def geodist_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """The bit-parallel DuckDB expression for :func:`geodist_km` (same
    operation tree; sin/cos/asin agree to ~1 ulp — callers must round)."""
    r = f"{DEG_TO_RAD!r}"

    def rad(x: str) -> str:
        return f"(({x}) * {r})"

    sdphi = f"sin({rad(f'{lat2} - {lat1}')} / 2.0)"
    sdlmb = f"sin({rad(f'{lon2} - {lon1}')} / 2.0)"
    a = (f"({sdphi} * {sdphi} + cos({rad(lat1)}) * cos({rad(lat2)})"
         f" * {sdlmb} * {sdlmb})")
    return f"(2.0 * {EARTH_MEAN_RADIUS_KM!r} * asin(sqrt({a})))"


def bbox_filter(df: DataFrame, lat_col: str, lon_col: str,
                lat_min: float, lat_max: float,
                lon_min: float, lon_max: float) -> DataFrame:
    """Rectangle filter — Solr ``{!bbox}`` / LatLonPoint.newBoxQuery.
    Pure comparisons: bit-exact, pushdown-eligible."""
    return df.filter(
        (F.col(lat_col) >= lat_min) & (F.col(lat_col) <= lat_max)
        & (F.col(lon_col) >= lon_min) & (F.col(lon_col) <= lon_max))


def heatmap_facet(df: DataFrame, lat_col: str, lon_col: str,
                  lat_min: float, lat_max: float,
                  lon_min: float, lon_max: float,
                  rows: int = 10, cols: int = 10) -> DataFrame:
    """2-D grid counts — SpatialHeatmapFacets. Cell ids are
    ``floor((v - min) / cell)`` with the max edge clamped into the last
    cell (the reference's gridLevel cell assignment); points outside the
    box are excluded. floor/div are IEEE-exact, so cells match the
    oracle bit-for-bit. Output: (row, col, n) with row 0 at lat_min."""
    cell_lat = (lat_max - lat_min) / rows
    cell_lon = (lon_max - lon_min) / cols
    boxed = bbox_filter(df, lat_col, lon_col,
                        lat_min, lat_max, lon_min, lon_max)
    row = F.least(F.floor((F.col(lat_col) - F.lit(lat_min))
                          / F.lit(cell_lat)), F.lit(rows - 1))
    col = F.least(F.floor((F.col(lon_col) - F.lit(lon_min))
                          / F.lit(cell_lon)), F.lit(cols - 1))
    return (boxed.groupBy(row.cast("long").alias("row"),
                          col.cast("long").alias("col"))
            .agg(F.count("*").alias("n")))
