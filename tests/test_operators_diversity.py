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


def _terms_df(spark):
    rows = [
        # tile u3 (~Berlin): currywurst x3, the x3
        (1, 52.5, 13.4, "currywurst the currywurst the currywurst the"),
        # tile r3 (~Sydney): meatpie x2, the x4, once-off typo
        (2, -33.9, 151.2, "meatpie the the meatpie the the zzyzx"),
    ]
    return spark.createDataFrame(
        rows, "doc_id int, lat double, lon double, text string")


def test_tile_terms_lift_math_and_rank(spark):
    """Exact lift values on a hand-computed corpus: N=13, the=7,
    currywurst=3, meatpie=2, zzyzx=1 (dropped by min_count)."""
    from geohash_dotnet_spark.operators.dedup import release_dedup_cache
    from geohash_dotnet_spark.operators.diversity import tile_terms

    got = sorted(tuple(r) for r in
                 tile_terms(_terms_df(spark), precision=2, k=2,
                            min_count=2).collect())
    release_dedup_cache()
    # lift = (c_tw/n_t) / (c_w/N), fp6-rounded
    assert got == [
        ("r3", "meatpie", 2, 7, 2, 1.857143, 1),   # (2/7)/(2/13)
        ("r3", "the", 4, 7, 7, 1.061224, 2),       # (4/7)/(7/13)
        ("u3", "currywurst", 3, 6, 3, 2.166667, 1),
        ("u3", "the", 3, 6, 7, 0.928571, 2),
    ]


def test_tile_terms_min_count_drops_noise(spark):
    """A once-off term has unbounded lift; min_count gates it out
    BEFORE ranking so it cannot claim a top-k slot."""
    from geohash_dotnet_spark.operators.dedup import release_dedup_cache
    from geohash_dotnet_spark.operators.diversity import tile_terms

    got = {r["term"] for r in
           tile_terms(_terms_df(spark), precision=2, k=5,
                      min_count=2).collect()}
    assert "zzyzx" not in got
    loose = {r["term"] for r in
             tile_terms(_terms_df(spark), precision=2, k=5,
                        min_count=1).collect()}
    release_dedup_cache()
    assert "zzyzx" in loose


def test_tile_terms_matches_duckdb_twin(spark):
    """Value-exact vs the SQL twin (the driver-gate contract) on the
    real documents table."""
    import duckdb

    from geohash_dotnet_spark.functions.oracle import pages_tagged_sql
    from geohash_dotnet_spark.operators.dedup import release_dedup_cache
    from geohash_dotnet_spark.operators.diversity import (tile_terms,
                                                          tile_terms_sql)
    from geohash_dotnet_spark.sources.pages import pages

    got = sorted(tuple(r) for r in
                 tile_terms(pages(spark, "/root/testdata/sf0.001"),
                            precision=1, k=3, min_count=3).collect())
    release_dedup_cache()
    con = duckdb.connect()
    con.sql("CREATE VIEW documents AS SELECT * FROM "
            "read_parquet('/root/testdata/sf0.001/documents.parquet')")
    want = sorted(tuple(r) for r in
                  con.sql(tile_terms_sql(pages_tagged_sql(1),
                                         k=3, min_count=3)).fetchall())
    assert got and got == want


def test_tile_terms_no_python_in_plan_and_cache_released(spark):
    """The token explode and windows are pure JVM (no Python eval
    nodes), and release_dedup_cache frees the persisted aggregate."""
    from geohash_dotnet_spark.operators.dedup import release_dedup_cache
    from geohash_dotnet_spark.operators.diversity import tile_terms

    out = tile_terms(_terms_df(spark), precision=2, k=2, min_count=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    out.collect()
    assert release_dedup_cache() >= 1


def test_tile_terms_validation(spark):
    from geohash_dotnet_spark.operators.diversity import tile_terms

    with pytest.raises(ValueError):
        tile_terms(None, precision=0)
    with pytest.raises(ValueError):
        tile_terms(None, k=0)
    with pytest.raises(ValueError):
        tile_terms(None, min_count=0)


# ---------------------------------------------------------------------------
# tile_skew
# ---------------------------------------------------------------------------

def test_tile_skew_hand_computed(spark):
    """1 page in tile A, 3 in tile B: sorted n = [1, 3], rn = [1, 2],
    wsum = 7 -> G = (2*7 - 3*4) / (2*4) = 0.25; top = B with share 0.75."""
    from geohash_dotnet_spark.operators.diversity import tile_skew

    rows = ([("a0", 10.0, 10.0, "en")]
            + [(f"b{i}", 10.0, 60.0, "en") for i in range(3)])
    out = tile_skew(_docs(spark, rows), precision=2).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_tiles"] == 2 and r["n_pages"] == 4
    assert r["top_n"] == 3 and r["top_share"] == 0.75
    assert r["gini"] == 0.25


def test_tile_skew_uniform_is_zero(spark):
    from geohash_dotnet_spark.operators.diversity import tile_skew

    rows = ([(f"a{i}", 10.0, 10.0, "en") for i in range(2)]
            + [(f"b{i}", 10.0, 60.0, "en") for i in range(2)])
    r = tile_skew(_docs(spark, rows), precision=2).collect()[0]
    assert r["gini"] == 0.0 and r["top_share"] == 0.5


def test_tile_skew_top_tie_lowest_tile(spark):
    """Equal occupancy: the top-tile witness breaks to the lexicographically
    lowest tile (struct-min on (-n, tile))."""
    from geohash_dotnet_spark.functions.native import with_geohash
    from geohash_dotnet_spark.operators.diversity import tile_skew

    rows = [("a0", 10.0, 10.0, "en"), ("b0", 10.0, 60.0, "en")]
    df = _docs(spark, rows)
    tiles = sorted(r["gh"] for r in
                   with_geohash(df, "lat", "lon", 2).select("gh").collect())
    r = tile_skew(df, precision=2).collect()[0]
    assert r["top_tile"] == tiles[0]


def test_tile_skew_validation(spark):
    from geohash_dotnet_spark.operators.diversity import tile_skew

    for bad in (0, 5):
        with pytest.raises(ValueError):
            tile_skew(None, precision=bad)
