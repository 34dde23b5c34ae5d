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


#: geohash alphabet (public spec: Niemeyer's geohash, the encoding
#: Solr's GeoHashField / geohash() function uses — u8:solr/core/.../
#: schema/GeoHashField.java via spatial4j GeohashUtils).
GEOHASH_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _geohash_plan(precision: int) -> tuple[int, int, int]:
    if not (1 <= precision <= 12):
        raise ValueError("geohash precision must be in [1, 12]")
    nbits = 5 * precision
    lonbits = (nbits + 1) // 2  # lon gets the first (even) bit slots
    latbits = nbits // 2
    return nbits, lonbits, latbits


def geohash_col(lat: Column | str, lon: Column | str,
                precision: int = 5) -> Column:
    """Geohash encode — Solr ``geohash(lat, lon)`` / GeoHashField.

    Pure Catalyst integer arithmetic, no UDF: quantize each axis to its
    bit budget (``floor(frac * 2^bits)`` — the multiply is by a power
    of two, so with the division done FIRST every step is IEEE-exact
    and the oracle matches bit-for-bit), interleave the bits MSB-first
    starting with longitude (the geohash spec), then emit base-32
    characters. The whole thing is one codegen'd expression per char —
    at 100 TB it runs inside the scan like any projection."""
    nbits, lonbits, latbits = _geohash_plan(precision)
    y = F.col(lat) if isinstance(lat, str) else lat
    x = F.col(lon) if isinstance(lon, str) else lon
    xq = F.least(F.floor((x + F.lit(180.0)) / F.lit(360.0)
                         * F.lit(float(1 << lonbits))),
                 F.lit((1 << lonbits) - 1)).cast("long")
    yq = F.least(F.floor((y + F.lit(90.0)) / F.lit(180.0)
                         * F.lit(float(1 << latbits))),
                 F.lit((1 << latbits) - 1)).cast("long")
    code = F.lit(0).cast("long")
    for idx in range(nbits):
        if idx % 2 == 0:
            src, b = xq, lonbits - 1 - idx // 2
        else:
            src, b = yq, latbits - 1 - (idx - 1) // 2
        bit = F.shiftright(src, b).bitwiseAND(F.lit(1))
        code = code + bit * F.lit(1 << (nbits - 1 - idx))
    alphabet = F.array(*[F.lit(c) for c in GEOHASH_BASE32])
    chars = [F.element_at(alphabet,
                          (F.shiftright(code, 5 * (precision - 1 - k))
                           .bitwiseAND(F.lit(31)) + F.lit(1)).cast("int"))
             for k in range(precision)]
    return F.concat(*chars)


def geohash_sql(lat: str, lon: str, precision: int = 5) -> str:
    """The bit-parallel DuckDB expression for :func:`geohash_col` (same
    op tree: divide-first quantization, MSB-first lon/lat interleave,
    base-32 substring lookup)."""
    nbits, lonbits, latbits = _geohash_plan(precision)
    xq = (f"CAST(least(floor((({lon}) + 180.0) / 360.0 * "
          f"{float(1 << lonbits)!r}), {(1 << lonbits) - 1}) AS BIGINT)")
    yq = (f"CAST(least(floor((({lat}) + 90.0) / 180.0 * "
          f"{float(1 << latbits)!r}), {(1 << latbits) - 1}) AS BIGINT)")
    terms = []
    for idx in range(nbits):
        if idx % 2 == 0:
            src, b = xq, lonbits - 1 - idx // 2
        else:
            src, b = yq, latbits - 1 - (idx - 1) // 2
        terms.append(f"((({src}) >> {b}) & 1) * {1 << (nbits - 1 - idx)}")
    code = "(" + " + ".join(terms) + ")"
    chars = [f"substr('{GEOHASH_BASE32}', "
             f"CAST((({code} >> {5 * (precision - 1 - k)}) & 31) + 1 "
             f"AS INT), 1)" for k in range(precision)]
    return "(" + " || ".join(chars) + ")"


def _polygon_edges(polygon) -> list[tuple[float, float, float, float]]:
    """Closed-ring edges (yi, xi, yj, xj), horizontal edges dropped —
    they can never be crossed by the +x ray test and dropping them at
    build time keeps the expression division-free and branch-free."""
    pts = [(float(a), float(b)) for a, b in polygon]
    if len(pts) < 3:
        raise ValueError("polygon needs at least 3 vertices")
    edges = []
    for i, (yi, xi) in enumerate(pts):
        yj, xj = pts[(i + 1) % len(pts)]
        if yj != yi:
            edges.append((yi, xi, yj, xj))
    if not edges:
        raise ValueError("degenerate polygon: all edges horizontal")
    return edges


def point_in_polygon(df: DataFrame, lat_col: str, lon_col: str,
                     polygon) -> DataFrame:
    """Point-in-polygon filter — the query-shape slice of the
    reference's polygon support (public knowledge: ``u8:lucene/
    spatial-extras/.../RecursivePrefixTreeStrategy.java`` serves
    Intersects(polygon); Lucene core's ``LatLonPoint.newPolygonQuery``
    uses the same even-odd rule this implements). ``polygon`` is a
    sequence of (lat, lon) vertices (auto-closed ring).

    Even-odd ray casting as ONE codegen'd predicate: for each
    non-horizontal edge, a latitude-band test plus a cross-multiplied
    side-of-edge test (the division-free form — the edge slope's sign
    is known at build time, so the inequality direction is baked in);
    inside = odd crossing count. All comparisons/multiplies follow the
    identical op tree in the DuckDB oracle, so membership is
    engine-exact (module float-determinism contract: +,-,* are
    IEEE-rounded the same everywhere).

    Scale shape: a literal-only predicate over the scan — pushdown
    eligible, no join, no UDF. This is the QUERY side only; the
    reference's recursive-prefix-tree shape INDEXING (grid-cell terms
    for indexed polygons) is documented out of scope in COVERAGE.md —
    for point data, partition pruning on a bbox prefilter plays the
    tree's role here."""
    y, x = F.col(lat_col), F.col(lon_col)
    crossings: Column | None = None
    for yi, xi, yj, xj in _polygon_edges(polygon):
        lo, hi = (yi, yj) if yj > yi else (yj, yi)
        band = (y >= F.lit(lo)) & (y < F.lit(hi))
        lhs = (x - F.lit(xi)) * F.lit(yj - yi)
        rhs = F.lit(xj - xi) * (y - F.lit(yi))
        side = (lhs < rhs) if yj > yi else (lhs > rhs)
        c = (band & side).cast("int")
        crossings = c if crossings is None else crossings + c
    return df.filter(crossings % 2 == 1)


def point_in_polygon_sql(lat: str, lon: str, polygon) -> str:
    """The bit-parallel DuckDB predicate for :func:`point_in_polygon`."""
    terms = []
    for yi, xi, yj, xj in _polygon_edges(polygon):
        lo, hi = (yi, yj) if yj > yi else (yj, yi)
        op = "<" if yj > yi else ">"
        terms.append(
            f"CAST((({lat}) >= {lo!r} AND ({lat}) < {hi!r} AND "
            f"((({lon}) - {xi!r}) * {yj - yi!r}) {op} "
            f"({xj - xi!r} * (({lat}) - {yi!r}))) AS INT)")
    return "((" + " + ".join(terms) + ") % 2 = 1)"


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
