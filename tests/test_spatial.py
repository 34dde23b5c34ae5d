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
