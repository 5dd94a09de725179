"""Hypertable-style time rollup (operators/rollup.py)."""

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from geohash_dotnet_spark.operators import time_rollup


def _ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def rolled(spark):
    rows = [
        (_ts("2024-01-01T00:00:10"), 1.25),
        (_ts("2024-01-01T00:00:50"), 2.50),   # same minute
        (_ts("2024-01-01T00:59:00"), 4.00),   # same hour, other minute
        (_ts("2024-01-01T23:00:00"), 8.00),   # same day, other hour
        (_ts("2024-01-02T00:00:00"), 16.00),  # next day
    ]
    df = spark.createDataFrame(rows, ["ts", "value"])
    out = time_rollup(df).collect()
    return {(r["level"], r["bucket"]): (r["n"], r["sum_value_us"])
            for r in out}


def test_rollup_known_values(rolled):
    assert rolled[("minute", _ts("2024-01-01T00:00:00"))] == (2, 3_750_000)
    assert rolled[("hour", _ts("2024-01-01T00:00:00"))] == (3, 7_750_000)
    assert rolled[("day", _ts("2024-01-01T00:00:00"))] == (4, 15_750_000)
    assert rolled[("day", _ts("2024-01-02T00:00:00"))] == (1, 16_000_000)
    # level cardinalities: 4 minutes, 3 hours, 2 days
    levels = {}
    for (lv, _b) in rolled:
        levels[lv] = levels.get(lv, 0) + 1
    assert levels == {"minute": 4, "hour": 3, "day": 2}


def test_rollup_reuses_exchanges_single_scan(spark, sf_small):
    """Each coarser level must read the finer level's exchange, not the
    source: final plan = ONE FileScan + a ReusedExchange per extra
    level."""
    ev = spark.read.parquet(f"{sf_small}/events.parquet")
    r = time_rollup(ev)
    r.collect()  # AQE finalizes the plan on execution
    plan = r._jdf.queryExecution().executedPlan().toString()
    final = plan.split("Initial Plan")[0]
    assert final.count("ReusedExchange") == 2
    assert final.count("Scan parquet") + final.count("FileScan") <= 2


def test_tile_pyramid_known_values(spark):
    """Four points in known quadrants: zoom-1 quadkeys and the zoom-0
    grand total, plus level cardinalities at deeper zooms."""
    from geohash_dotnet_spark.operators.rollup import tile_pyramid

    rows = [(40.0, -100.0), (45.0, -90.0),   # NW quadrant -> quadkey '0'
            (40.0, 100.0),                   # NE -> '1'
            (-40.0, -100.0)]                 # SW -> '2'
    df = spark.createDataFrame(rows, "lat double, lon double")
    out = tile_pyramid(df, max_z=3)
    z1 = {r["quadkey"]: r["n_pages"] for r in
          out.filter(F.col("z") == 1).collect()}
    assert z1 == {"0": 2, "1": 1, "2": 1}
    z0 = out.filter(F.col("z") == 0).collect()
    assert len(z0) == 1 and z0[0]["quadkey"] == "" and z0[0]["n_pages"] == 4
    # every zoom's counts sum to the corpus
    for z in range(4):
        assert sum(r["n_pages"] for r in
                   out.filter(F.col("z") == z).collect()) == 4


def test_tile_pyramid_matches_direct_assignment(spark, sf_small):
    """Prefix rollup == direct per-zoom assignment (the nesting
    property the oracle also checks)."""
    from geohash_dotnet_spark.functions.tiles import with_tiles
    from geohash_dotnet_spark.operators.rollup import tile_pyramid
    from geohash_dotnet_spark.sources.pages import pages

    pg = pages(spark, sf_small)
    out = {(r["z"], r["quadkey"]): r["n_pages"]
           for r in tile_pyramid(pg, max_z=5).collect()}
    for z in (1, 3, 5):
        direct = {(z, r["quadkey"]): r["count"] for r in
                  with_tiles(pg, z=z).groupBy("quadkey").count().collect()}
        assert {k: v for k, v in out.items() if k[0] == z} == direct


def test_tile_pyramid_reuses_exchanges_single_scan(spark, sf_small):
    from geohash_dotnet_spark.operators.rollup import tile_pyramid
    from geohash_dotnet_spark.sources.pages import pages

    spark.catalog.clearCache()
    r = tile_pyramid(pages(spark, sf_small), max_z=4)
    r.collect()
    plan = r._jdf.queryExecution().executedPlan().toString()
    final = plan.split("Initial Plan")[0]
    assert final.count("ReusedExchange") >= 3  # zooms 3..0 reuse below
    assert final.count("Scan parquet") == 1


def test_tile_pyramid_validation():
    from geohash_dotnet_spark.operators.rollup import tile_pyramid

    with pytest.raises(ValueError):
        tile_pyramid(None, max_z=0)
    with pytest.raises(ValueError):
        tile_pyramid(None, max_z=21)


# ---------------------------------------------------------------------------
# tile_freshness
# ---------------------------------------------------------------------------

def _fresh_df(spark, rows):
    return spark.createDataFrame(
        rows, "url string, lat double, lon double, warc_ts timestamp")


def test_tile_freshness_halflife_staircase(spark):
    """Ages 0 / 3.5d / 7d / 14d / 70d at halflife 7d quantize to whole
    half-lives e = 0, 0, 1, 2, 10 -> weights 1e6, 1e6, 5e5, 2.5e5,
    floor(1e6/1024) = 976 micro-units, summed exactly."""
    from geohash_dotnet_spark.operators.rollup import tile_freshness

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    base = datetime(2024, 3, 1, 0, 0, 0)
    ages_h = [0, 84, 168, 336, 1680]  # hours
    rows = [(f"u{i}", 10.0, 10.0, base - timedelta(hours=h))
            for i, h in enumerate(ages_h)]
    out = tile_freshness(_fresh_df(spark, rows), ts="warc_ts",
                         precision=2, halflife_days=7).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_pages"] == 5
    assert r["fresh_fp"] == 1_000_000 + 1_000_000 + 500_000 + 250_000 + 976
    assert r["freshness"] == r["fresh_fp"] / 1e6


def test_tile_freshness_ancient_pages_weigh_zero(spark):
    """e >= 60 clamps to weight 0 (beyond double-exact 2^e territory)."""
    from geohash_dotnet_spark.operators.rollup import tile_freshness

    base = datetime(2024, 3, 1)
    rows = [("new", 10.0, 10.0, base),
            ("old", 10.0, 10.0, base - timedelta(days=7 * 61))]
    r = tile_freshness(_fresh_df(spark, rows), ts="warc_ts",
                       precision=2, halflife_days=7).collect()[0]
    assert r["n_pages"] == 2 and r["fresh_fp"] == 1_000_000


def test_tile_freshness_single_corpus_exchange(spark):
    """The reference-epoch scalar broadcasts; the only hashpartitioning
    Exchange is the tile aggregation."""
    from geohash_dotnet_spark.operators.rollup import tile_freshness
    from geohash_dotnet_spark.sources.pages import pages

    out = tile_freshness(pages(spark, "/root/testdata/sf0.001"),
                         precision=2)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("Initial Plan")[0]
    assert final.count("Exchange hashpartitioning") == 1
    assert "BatchEvalPython" not in final
    assert "ArrowEvalPython" not in final


def test_tile_freshness_validation():
    from geohash_dotnet_spark.operators.rollup import tile_freshness

    with pytest.raises(ValueError):
        tile_freshness(None, halflife_days=0)
