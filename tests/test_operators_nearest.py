"""Reverse geocoding via shuffle-free argmin (operators/knn.py
nearest_assign)."""

from pyspark.sql import functions as F

from geohash_dotnet_spark.operators import nearest_assign

SITES = [("a", 0.0, 0.0), ("b", 0.0, 90.0), ("c", 45.0, 180.0)]


def test_nearest_known_assignments(spark):
    pts = spark.createDataFrame(
        [(1, 1.0, 2.0),      # near a
         (2, -3.0, 88.0),    # near b
         (3, 44.0, -179.0),  # near c across the antimeridian
         (4, 0.0, 45.0)],    # EXACT tie between a and b -> name order: a
        ["id", "lat", "lon"])
    out = {r["id"]: r for r in nearest_assign(pts, SITES).collect()}
    assert [out[i]["site"] for i in (1, 2, 3)] == ["a", "b", "c"]
    assert out[4]["site"] == "a"
    assert out[1]["dist_m"] > 0


def test_nearest_is_shuffle_free(spark, sf_small):
    from geohash_dotnet_spark.sources.pages import pages

    pg = pages(spark, sf_small, replicate=2)
    plan = (nearest_assign(pg, SITES)
            ._jdf.queryExecution().executedPlan().toString())
    # the pages SOURCE broadcasts its tiny replication factor; the
    # assignment itself must add no shuffle and no join
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan
    for node in ("SortMergeJoin", "BroadcastHashJoin",
                 "CartesianProduct"):
        assert node not in plan
