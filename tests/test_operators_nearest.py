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


def test_nearest_sites_topk_matches_bruteforce(spark):
    import math

    from geohash_dotnet_spark.operators import nearest_sites

    pts = [(1, 1.0, 2.0), (2, -3.0, 88.0), (3, 44.0, -179.0),
           (4, 0.0, 45.0), (5, 80.0, 10.0)]
    out = nearest_sites(spark.createDataFrame(pts, ["id", "lat", "lon"]),
                        SITES, k=2).collect()
    # brute force: haversine + (dist, name) sort
    def hav(a, b, c, d):
        la1, lo1, la2, lo2 = map(math.radians, (a, b, c, d))
        x = (math.sin((la2 - la1) / 2) ** 2
             + math.cos(la1) * math.cos(la2) * math.sin((lo2 - lo1) / 2) ** 2)
        return 2 * 6371008.8 * math.asin(min(1.0, math.sqrt(x)))

    for pid, la, lo in pts:
        want = sorted((hav(la, lo, sla, slo), nm) for nm, sla, slo in SITES)[:2]
        got = sorted((r["rank"], r["site"]) for r in out if r["id"] == pid)
        assert [s for _, s in got] == [nm for _, nm in want], pid
    assert {r["rank"] for r in out} == {1, 2}


def test_nearest_sites_k_clamped_and_validated(spark):
    import pytest

    from geohash_dotnet_spark.operators import nearest_sites

    pts = spark.createDataFrame([(1, 0.0, 0.0)], ["id", "lat", "lon"])
    assert nearest_sites(pts, SITES, k=99).count() == len(SITES)
    with pytest.raises(ValueError):
        nearest_sites(pts, SITES, k=0)


def test_nearest_sites_is_shuffle_free(spark, sf_small):
    from geohash_dotnet_spark.operators import nearest_sites
    from geohash_dotnet_spark.sources.pages import pages

    pg = pages(spark, sf_small, replicate=2)
    plan = (nearest_sites(pg, SITES, k=2)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan
    for node in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct"):
        assert node not in plan
