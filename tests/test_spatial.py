"""Spatial operators (sparklucene.spatial) — geodist/bbox/heatmap."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from sparklucene.spatial import (EARTH_MEAN_RADIUS_KM, bbox_filter,
                                 geodist_km, geodist_sql, heatmap_facet)


def _pts(spark, rows):
    return spark.createDataFrame(rows, "id long, lat double, lon double")


def test_geodist_known_distance(spark):
    # Paris -> London great-circle ~343.5 km (haversine, mean radius)
    df = _pts(spark, [(0, 48.8566, 2.3522)])
    d = df.select(geodist_km(F.col("lat"), F.col("lon"),
                             51.5074, -0.1278).alias("d")).collect()[0]["d"]
    assert abs(d - 343.5) < 1.0
    # zero distance to itself; symmetry
    z = df.select(geodist_km(F.col("lat"), F.col("lon"),
                             48.8566, 2.3522).alias("d")).collect()[0]["d"]
    assert z == 0.0
    rev = df.select(geodist_km(F.lit(51.5074), F.lit(-0.1278),
                               F.col("lat"), F.col("lon")).alias("d")
                    ).collect()[0]["d"]
    assert abs(rev - d) < 1e-9


def test_geodist_sql_matches_engine(spark):
    """DuckDB mirror of the expression tree agrees to < 1 mm."""
    import duckdb
    rows = [(i, (i * 7919 % 18000) / 100.0 - 90.0,
             (i * 104729 % 36000) / 100.0 - 180.0) for i in range(50)]
    df = _pts(spark, rows)
    eng = (df.select("id", geodist_km(F.col("lat"), F.col("lon"),
                                      10.5, 20.25).alias("d"))
           .orderBy("id").toPandas())
    con = duckdb.connect()
    con.execute("CREATE TABLE p (id BIGINT, lat DOUBLE, lon DOUBLE)")
    con.executemany("INSERT INTO p VALUES (?, ?, ?)", rows)
    ora = con.execute(
        f"SELECT id, {geodist_sql('lat', 'lon', '10.5', '20.25')} AS d "
        "FROM p ORDER BY id").df()
    assert (abs(eng["d"] - ora["d"]) < 1e-6).all()


def test_bbox_and_heatmap(spark):
    rows = [(0, -90.0, -180.0), (1, 0.0, 0.0), (2, 89.9, 179.9),
            (3, 90.0, 180.0), (4, 45.0, -45.0), (5, 91.0, 0.0)]
    df = _pts(spark, rows)
    inside = {r["id"] for r in
              bbox_filter(df, "lat", "lon", -90, 90, -180, 180).collect()}
    assert inside == {0, 1, 2, 3, 4}  # 5 is out of range
    hm = {(r["row"], r["col"]): r["n"] for r in
          heatmap_facet(df, "lat", "lon", -90, 90, -180, 180,
                        rows=10, cols=10).collect()}
    assert hm[(0, 0)] == 1          # min corner in first cell
    assert hm[(9, 9)] == 2          # max edge CLAMPED into last cell (2,3)
    assert hm[(5, 5)] == 1          # (0,0) -> cell (5,5)
    assert hm[(7, 3)] == 1          # (45,-45)
    assert sum(hm.values()) == 5


def test_heatmap_cell_count_bounded(spark):
    rows = [(i, (i % 181) - 90.0, (i % 361) - 180.0) for i in range(500)]
    hm = heatmap_facet(_pts(spark, rows), "lat", "lon",
                       -90, 90, -180, 180, rows=4, cols=4)
    out = hm.collect()
    assert len(out) <= 16
    assert sum(r["n"] for r in out) == 500


def test_geohash_published_vectors(spark):
    """Engine geohash must match the PUBLISHED geohash encoding (the
    independent check — the DuckDB oracle shares the engine's op tree,
    so only external vectors catch a shared interleave mistake)."""
    from sparklucene.spatial import geohash_col

    vectors = [(57.64911, 10.40744, 11, "u4pruydqqvj"),   # wikipedia
               (42.6, -5.6, 5, "ezs42"),                  # original demo
               (-25.382708, -49.265506, 8, "6gkzwgjz"),
               (0.0, 0.0, 6, "s00000"),
               (90.0, 180.0, 4, "zzzz"),                  # clamped corner
               (-90.0, -180.0, 4, "0000")]
    rows = [(i, la, lo, p) for i, (la, lo, p, _) in enumerate(vectors)]
    df = spark.createDataFrame(rows, "id long, lat double, lon double, p int")
    for i, (la, lo, p, want) in enumerate(vectors):
        got = (df.filter(F.col("id") == i)
               .select(geohash_col("lat", "lon", precision=p).alias("gh"))
               .collect()[0]["gh"])
        assert got == want, (la, lo, p, got, want)


def test_geohash_sql_matches_engine(spark):
    import duckdb

    from sparklucene.spatial import geohash_col, geohash_sql

    rows = [(i, ((i * 7919) % 18000) / 100.0 - 90.0,
             ((i * 104729) % 36000) / 100.0 - 180.0) for i in range(300)]
    df = _pts(spark, rows)
    eng = (df.select("id", geohash_col("lat", "lon", 5).alias("gh"))
           .orderBy("id").toPandas())
    con = duckdb.connect()
    con.register("p", eng.assign(
        lat=[r[1] for r in rows], lon=[r[2] for r in rows]))
    ora = con.execute(f"SELECT id, {geohash_sql('lat', 'lon', 5)} AS gh "
                      "FROM p ORDER BY id").df()
    assert (eng["gh"] == ora["gh"]).all()


def _py_point_in_polygon(y, x, poly):
    """Classic even-odd ray caster (independent reference)."""
    inside = False
    n = len(poly)
    for i in range(n):
        yi, xi = poly[i]
        yj, xj = poly[(i + 1) % n]
        if (yi > y) != (yj > y) and \
                x < (xj - xi) * (y - yi) / (yj - yi) + xi:
            inside = not inside
    return inside


def test_point_in_polygon_vs_reference(spark):
    from sparklucene.spatial import point_in_polygon

    poly = ((10.0, -30.0), (45.0, 10.0), (20.0, 60.0), (-15.0, 40.0),
            (5.0, 5.0))
    rows = [(i, ((i * 7919) % 18000) / 100.0 - 90.0,
             ((i * 104729) % 36000) / 100.0 - 180.0) for i in range(600)]
    want = {i for i, la, lo in rows if _py_point_in_polygon(la, lo, poly)}
    assert want and len(want) < 600  # polygon must bite both ways
    got = {r["id"] for r in
           point_in_polygon(_pts(spark, rows), "lat", "lon", poly).collect()}
    assert got == want


def test_point_in_polygon_rectangle_with_horizontal_edges(spark):
    """Rectangles have two horizontal edges — dropped at build time,
    membership still exact (matches bbox on the open/closed pattern of
    the even-odd rule)."""
    from sparklucene.spatial import point_in_polygon

    rect = ((0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0))
    rows = [(0, 5.0, 5.0), (1, -1.0, 5.0), (2, 11.0, 5.0), (3, 5.0, 11.0),
            (4, 5.0, -1.0), (5, 0.0, 5.0), (6, 9.99, 9.99)]
    got = {r["id"] for r in
           point_in_polygon(_pts(spark, rows), "lat", "lon", rect).collect()}
    want = {i for i, la, lo in rows if _py_point_in_polygon(la, lo, rect)}
    assert got == want
    assert {0, 6} <= got and {1, 2, 3, 4} & got == set()


def test_polygon_degenerate_raises():
    from sparklucene.spatial import _polygon_edges

    import pytest as _pt
    with _pt.raises(ValueError):
        _polygon_edges(((0.0, 0.0), (1.0, 1.0)))
    with _pt.raises(ValueError):
        _polygon_edges(((0.0, 0.0), (0.0, 5.0), (0.0, 9.0)))
