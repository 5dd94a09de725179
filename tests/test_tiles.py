"""Web-Mercator XYZ tiles / quadkeys (functions/tiles.py).

Checks: portable (boundary-table) tile row == closed-form Mercator on
real corpus points AND a deliberately adversarial latitude grid; quadkey
encode/decode roundtrip; bbox containment agrees with assignment; DuckDB
twins are bit-identical; prefix containment (the geohash-like property
the scheme is chosen for).
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from geohash_dotnet_spark.functions import tiles as T
from geohash_dotnet_spark.sources.pages import pages


@pytest.fixture(scope="module")
def pts(spark, sf_small):
    return pages(spark, sf_small, replicate=2) \
        .select("doc_id", "rep", "lat", "lon")


def test_portable_equals_closed_form_on_corpus(pts):
    for z in (4, 6, 8):
        mism = pts.filter(
            T.tile_y_portable(F.col("lat"), z)
            != T.tile_y(F.col("lat"), z)).count()
        assert mism == 0, f"z={z}"


def test_portable_equals_closed_form_on_edge_grid(spark):
    rows = [(i, -89.9 + i * 0.179) for i in range(1005)]
    rows += [(2000, 0.0), (2001, 90.0), (2002, -90.0),
             (2003, T.MAX_MERCATOR_LAT), (2004, -T.MAX_MERCATOR_LAT)]
    df = spark.createDataFrame(rows, "id long, lat double")
    mism = df.filter(T.tile_y_portable(F.col("lat"), 7)
                     != T.tile_y(F.col("lat"), 7)).count()
    assert mism == 0


def test_quadkey_roundtrip(pts):
    t = T.with_tiles(pts, z=8)
    x, y, z = T.quadkey_to_xy(F.col("quadkey"))
    bad = t.filter((x != F.col("x")) | (y != F.col("y"))
                   | (z != F.lit(8))).count()
    assert bad == 0


def test_bbox_contains_assigned_point(pts):
    z = 6
    t = T.with_tiles(pts, z=z).withColumn(
        "bb", T.tile_bounds(F.col("x"), F.col("y"), z))
    # tie rule: a boundary latitude belongs to the tile whose NORTH edge
    # it is -> tile y owns (south, north]; the top row additionally owns
    # lat > 85.05 and the bottom row lat < -85.05 (Mercator clamp)
    n_tiles = 1 << z
    viol = t.filter(~(
        (F.col("lon") >= F.col("bb.w")) & (F.col("lon") < F.col("bb.e"))
        & ((F.col("lat") <= F.col("bb.n")) | (F.col("y") == 0))
        & ((F.col("lat") > F.col("bb.s")) | (F.col("y") == n_tiles - 1))
    )).count()
    assert viol == 0


def test_prefix_containment(pts):
    # parent tile at z-1 = quadkey prefix of the z tile
    z = 8
    t = T.with_tiles(pts, z=z).select(
        F.col("quadkey").alias("qk8"),
        T.quadkey(T.tile_x(F.col("lon"), z - 1),
                  T.tile_y_portable(F.col("lat"), z - 1),
                  z - 1).alias("qk7"))
    bad = t.filter(F.substring("qk8", 1, z - 1) != F.col("qk7")).count()
    assert bad == 0


def test_duckdb_twins_bit_identical(pts):
    z = 6
    pdf = T.with_tiles(pts, z=z).select(
        "doc_id", "rep", "lat", "lon", "x", "y", "quadkey") \
        .orderBy("doc_id", "rep").toPandas()
    con = duckdb.connect()
    con.register("p", pdf[["doc_id", "rep", "lat", "lon"]])
    q = (f"SELECT {T.tile_x_sql('lon', z)} AS x, "
         f"{T.tile_y_portable_sql('lat', z)} AS y, "
         f"{T.quadkey_sql(T.tile_x_sql('lon', z), T.tile_y_portable_sql('lat', z), z)}"
         f" AS quadkey FROM p ORDER BY doc_id, rep")
    d = con.sql(q).df()
    assert (d.x.values == pdf.x.values).all()
    assert (d.y.values == pdf.y.values).all()
    assert (d.quadkey.values == pdf.quadkey.values).all()


def test_tile_bounds_table_properties():
    b = T.tile_lat_bounds(6)
    assert len(b) == 65
    assert b[0] == pytest.approx(T.MAX_MERCATOR_LAT)
    assert b[-1] == pytest.approx(-T.MAX_MERCATOR_LAT)
    assert b[32] == 0.0  # equator is an exact boundary at even zooms
    assert all(a > bb for a, bb in zip(b, b[1:]))  # strictly descending
