"""Physical-plan shape checks — the 100TB-scale properties must be visible
in the plan, not just asserted in prose:

* spatial joins broadcast the covering (no shuffle of the pages side);
* tile aggregations are partial+final hash aggs;
* filters/projections reach the parquet scan (pushdown / pruning);
* native paths contain no Python evaluation nodes.
"""

import pytest
from pyspark.sql import functions as F

from geohash_dotnet_spark.functions import with_geohash
from geohash_dotnet_spark.kernels import cover_polygon
from geohash_dotnet_spark.operators import spatial_join, tile_stats
from geohash_dotnet_spark.sources.pages import pages

RECT = "POLYGON((-85 -60, 85 -60, 85 60, -85 60, -85 -60))"


def _executed(df):
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df):
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_spatial_join_broadcasts_coverage(spark, sf_small):
    pg = pages(spark, sf_small)
    cov = spark.createDataFrame(
        [(c,) for c in cover_polygon(RECT, 2, "intersects")], "cell string")
    plan = _executed(spatial_join(pg, cov, precision=2))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # pages side must not shuffle


def test_tile_stats_partial_final_agg(spark, sf_small):
    plan = _executed(tile_stats(pages(spark, sf_small), precision=3))
    # partial_count before the exchange, final after: two HashAggregates
    assert plan.count("HashAggregate") >= 2
    # shuffle keyed by the tile (Catalyst may collapse the alias back to gh)
    assert ("Exchange hashpartitioning(tile" in plan
            or "Exchange hashpartitioning(gh" in plan)


def test_parquet_filter_pushdown(spark, sf_med):
    li = spark.read.parquet(f"{sf_med}/lineitem.parquet")
    q = li.filter(F.col("l_orderkey") == 42).select("l_orderkey", "l_quantity")
    plan = _executed(q)
    assert "PushedFilters: [IsNotNull(l_orderkey), EqualTo(l_orderkey,42)]" in plan
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" in plan


def test_native_paths_no_python_nodes(spark, sf_small):
    pg = with_geohash(pages(spark, sf_small), "lat", "lon", 7)
    stats = tile_stats(pg, precision=7)
    plan = _executed(stats)
    for marker in ("BatchEvalPython", "ArrowEvalPython", "FlatMapGroupsInPandas",
                   "MapInPandas"):
        assert marker not in plan, marker


def test_whole_stage_codegen_covers_encode(spark, sf_small):
    pg = with_geohash(pages(spark, sf_small), "lat", "lon", 7)
    plan = _executed(pg.select("gh"))
    # toString renders whole-stage-codegen stages as "*(n) Op"
    assert "WholeStageCodegen" in plan or "*(1)" in plan
