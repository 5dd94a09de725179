"""HLL++ approximate tile stats: accuracy gate + plan shape."""

from pyspark.sql import functions as F

from geohash_dotnet_spark.operators.sketches import approx_tile_stats
from geohash_dotnet_spark.operators.spatial_join import tile_stats
from geohash_dotnet_spark.sources.pages import pages


def test_approx_tile_stats_within_rsd(spark, sf_small):
    pg = pages(spark, sf_small, replicate=20)
    exact = {r["tile"]: (r["n_pages"], r["n_urls"])
             for r in tile_stats(pg, precision=1).collect()}
    approx = {r["tile"]: (r["n_pages"], r["n_urls"])
              for r in approx_tile_stats(pg, precision=1, rsd=0.05).collect()}
    assert set(approx) == set(exact)
    for tile, (n_pages, n_urls) in exact.items():
        a_pages, a_urls = approx[tile]
        assert a_pages == n_pages  # plain count stays exact
        # HLL++ rel-error: 4 sigma of the configured rsd (plus a floor for
        # tiny tiles where the sparse representation is exact anyway)
        assert abs(a_urls - n_urls) <= max(4 * 0.05 * n_urls, 2), \
            f"tile {tile}: approx {a_urls} vs exact {n_urls}"


def test_approx_tile_stats_plan_has_no_expand_single_exchange(spark, sf_small):
    # replicate=1: the replicate>1 source path adds its own repartition
    # Exchange, which would obscure the aggregation-exchange count
    pg = pages(spark, sf_small)

    exact_plan = tile_stats(pg, precision=2)._jdf.queryExecution() \
        .executedPlan().toString()
    approx_plan = approx_tile_stats(pg, precision=2)._jdf.queryExecution() \
        .executedPlan().toString()

    # the exact form pays the distinct-agg rewrite: a first aggregation
    # keyed by (tile, url) and a SECOND exchange for the final rollup —
    # at 100 TB that first exchange carries (tile, url) pairs, i.e. the
    # corpus. The sketch form must shuffle exactly once, moving only
    # fixed-size HLL buffers.
    assert exact_plan.count("Exchange") >= 2
    assert "url" in exact_plan.split("Exchange")[1]  # corpus-keyed shuffle
    assert approx_plan.count("Exchange") == 1
    assert "approx_count_distinct" in approx_plan
