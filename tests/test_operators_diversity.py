"""Tile entropy + distance bands (operators/diversity.py)."""

import math

import pytest
from pyspark.sql import functions as F

from geohash_dotnet_spark.operators.diversity import (distance_bands,
                                                      tile_entropy)
from geohash_dotnet_spark.sources.pages import pages

SF = "/root/testdata/sf0.001"


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "url string, lat double, lon double, lang string")


def test_entropy_closed_forms(spark):
    # one tile, single language -> H = 0; another with a 50/50 mix -> 1 bit;
    # a third with a 3/1 mix -> H(0.75) = 0.811278 bits
    rows = ([(f"u{i}", 10.0, 10.0, "en") for i in range(4)]
            + [(f"v{i}", 10.0, 60.0, "en" if i % 2 else "de")
               for i in range(4)]
            + [(f"w{i}", -40.0, -120.0, "en" if i else "es")
               for i in range(4)])
    out = {r["tile"]: r for r in
           tile_entropy(_docs(spark, rows), precision=2).collect()}
    assert len(out) == 3
    by_pop = sorted(out.values(), key=lambda r: (r["n_keys"], r["entropy"]))
    h_one, h_mix3, h_even = by_pop
    assert h_one["entropy"] == 0.0 and h_one["n_keys"] == 1
    exp = -(0.75 * math.log2(0.75) + 0.25 * math.log2(0.25))
    assert abs(h_mix3["entropy"] - exp) < 1e-6
    assert h_even["entropy"] == 1.0
    assert all(r["n_pages"] == 4 for r in out.values())


def test_entropy_on_pages(spark):
    pg = pages(spark, SF)
    out = tile_entropy(pg, precision=1).collect()
    assert sum(r["n_pages"] for r in out) == pg.count()
    for r in out:
        # 0 <= H <= log2(n_keys), both bounds inclusive
        assert -1e-9 <= r["entropy"] <= math.log2(max(r["n_keys"], 2)) + 1e-9


def test_distance_bands_edges(spark):
    # points at known distances from (0, 0) along the equator:
    # 1 deg lon ~ 111.19 km -> bands of 200 km put them in bands 0,0,1,overflow
    rows = [("a", 0.0, 0.0, "en"), ("b", 0.0, 1.0, "en"),
            ("c", 0.0, 3.0, "en"), ("d", 0.0, 179.0, "en")]
    out = {r["band"]: r["n_pages"] for r in
           distance_bands(_docs(spark, rows), 0.0, 0.0, band_m=200_000,
                          n_bands=5).collect()}
    assert out == {0: 2, 1: 1, 5: 1}


def test_distance_bands_partition(spark):
    pg = pages(spark, SF)
    out = distance_bands(pg, 40.0, -100.0, band_m=1_000_000,
                         n_bands=15).collect()
    assert sum(r["n_pages"] for r in out) == pg.count()
    assert all(0 <= r["band"] <= 15 for r in out)
    assert all(r["n_urls"] == r["n_pages"] for r in out)  # urls are unique


def test_validation(spark):
    with pytest.raises(ValueError):
        distance_bands(None, 0.0, 0.0, band_m=0)
    with pytest.raises(ValueError):
        distance_bands(None, 0.0, 0.0, n_bands=0)
