"""Spark functions layer: JVM-native encode == NumPy kernel == DuckDB twin,
UDF wrappers == kernels, plan-shape checks (pushdown, codegen, no UDF in
native paths)."""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from geohash_dotnet_spark.functions import (
    gh_bbox,
    gh_children,
    gh_decode,
    gh_is_valid,
    gh_neighbors,
    gh_parent,
    haversine_m,
    with_geohash,
)
from geohash_dotnet_spark.functions.oracle import pages_tagged_sql
from geohash_dotnet_spark.kernels import geohash as GK
from geohash_dotnet_spark.kernels import haversine_m as k_haversine
from geohash_dotnet_spark.sources.pages import pages

GOLDENS = [(0.0, 0.0), (40.7128, -74.0060), (89.99999999, 0.0),
           (0.0, 179.99999999), (40.390943, -75.9375), (-33.8688, 151.2093),
           (90.0, 180.0), (-90.0, -180.0)]


@pytest.fixture(scope="module")
def points_df(spark):
    rng = np.random.default_rng(11)
    lat = np.concatenate([[g[0] for g in GOLDENS], rng.uniform(-91, 91, 5000)])
    lon = np.concatenate([[g[1] for g in GOLDENS], rng.uniform(-540, 540, 5000)])
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(lat, lon)], "lat double, lon double")
    return df, lat, lon


@pytest.mark.parametrize("p", [1, 5, 7, 12])
def test_native_encode_equals_kernel(spark, points_df, p):
    df, lat, lon = points_df
    got = np.array([r.gh for r in with_geohash(df, "lat", "lon", p).collect()])
    want = GK.encode(lat, lon, p)
    assert (got == want).all()


def test_native_encode_is_udf_free(spark, points_df):
    df, _, _ = points_df
    plan = with_geohash(df, "lat", "lon", 5)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pages_column_pruning_excludes_html(spark, sf_small):
    pg = pages(spark, sf_small, with_html=True)
    slim = with_geohash(pg, "lat", "lon", 5).select("url", "gh")
    plan = slim._jdf.queryExecution().optimizedPlan().toString()
    assert "html" not in plan  # never materialized in the spatial path


def test_duckdb_twin_identical(spark, sf_med):
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * "
            f"FROM read_parquet('{sf_med}/documents.parquet')")
    for p in (5, 12):
        s = (with_geohash(pages(spark, sf_med, replicate=2), "lat", "lon", p)
             .select("url", "lat", "lon", "gh").toPandas()
             .sort_values("url").reset_index(drop=True))
        d = con.sql(f"SELECT url, lat, lon, gh FROM ({pages_tagged_sql(p, 2)}) "
                    f"ORDER BY url").df()
        assert (s.gh.values == d.gh.values).all()
        assert (s.lat.values == d.lat.values).all()   # bit-identical
        assert (s.lon.values == d.lon.values).all()


def test_udf_decode_bbox_neighbors(spark):
    gh = ["dr5reg", "s00000", "zzzzzz", "0", "u4png7x"]
    df = spark.createDataFrame([(g,) for g in gh], "gh string")
    out = df.select(
        "gh", gh_decode(F.col("gh")).alias("c"),
        gh_bbox(F.col("gh")).alias("b"),
        gh_neighbors(F.col("gh")).alias("nb"),
        F.when(F.length("gh") > 1, gh_parent(F.col("gh"))).alias("parent"),
        gh_is_valid(F.col("gh")).alias("ok"),
    ).collect()
    k_lat, k_lon = GK.decode(gh)
    for i, r in enumerate(out):
        assert r["c"]["lat"] == k_lat[i] and r["c"]["lon"] == k_lon[i]
        assert r["ok"] is True
        want_nb = [GK.neighbor([gh[i]], d)[0] for d in GK.DIRECTIONS]
        assert r["nb"] == want_nb
        if len(gh[i]) > 1:
            assert r["parent"] == gh[i][:-1]


def test_gh_children_native(spark):
    df = spark.createDataFrame([("s000",)], "gh string")
    got = df.select(gh_children(F.col("gh")).alias("ch")).collect()[0]["ch"]
    assert got == GK.children("s000")


def test_haversine_native_matches_kernel(spark):
    rng = np.random.default_rng(5)
    rows = [(float(a), float(b), float(c), float(d))
            for a, b, c, d in zip(rng.uniform(-90, 90, 500), rng.uniform(-180, 180, 500),
                                  rng.uniform(-90, 90, 500), rng.uniform(-180, 180, 500))]
    df = spark.createDataFrame(rows, "lat1 double, lon1 double, lat2 double, lon2 double")
    got = np.array([r.d for r in df.select(
        haversine_m(F.col("lat1"), F.col("lon1"),
                    F.col("lat2"), F.col("lon2")).alias("d")).collect()])
    want = k_haversine(*(np.array(c) for c in zip(*rows)))
    assert np.allclose(got, want, rtol=1e-12, atol=1e-6)
