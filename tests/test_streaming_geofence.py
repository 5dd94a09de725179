"""Stream-static geofence join vs the batch membership filter."""

from pyspark.sql import functions as F

from geohash_dotnet_spark.kernels import cover_polygon
from geohash_dotnet_spark.sources.pages import pages
from geohash_dotnet_spark.streaming.geofence import streaming_geofence
from geohash_dotnet_spark.streaming.tiles import run_available_now

SCHEMA = ("url string, warc_ts timestamp, text string, lang string, "
          "doc_id long, rep int, lat double, lon double")
# a generous mid-latitude box so the fence actually catches pages
FENCE_WKT = "POLYGON((-30 -20, 60 -20, 60 45, -30 45, -30 -20))"
P = 2


def test_streaming_geofence_matches_batch(spark, sf_small, tmp_path):
    from geohash_dotnet_spark.functions.native import with_geohash

    src = str(tmp_path / "src")
    pg = pages(spark, sf_small, replicate=2)
    pg.write.parquet(src)

    cells = [str(c) for c in cover_polygon(FENCE_WKT, P, "intersects")]
    fence = spark.createDataFrame([(c,) for c in cells], ["gh"])

    result = streaming_geofence(spark, src, SCHEMA, fence, P)
    out = str(tmp_path / "out")
    run_available_now(result, str(tmp_path / "ckpt"), out)

    got = spark.read.parquet(out)
    batch = (with_geohash(pg, "lat", "lon", P, out="gh")
             .filter(F.col("gh").isin(cells)))
    assert got.count() == batch.count() > 0
    g = {r["url"] for r in got.select("url").collect()}
    b = {r["url"] for r in batch.select("url").collect()}
    assert g == b


def test_streaming_geofence_join_is_broadcast(spark, sf_small, tmp_path):
    """The stream side must never shuffle: the same join shape executed
    in batch mode (identical operator construction) must be a
    BroadcastHashJoin, never a SortMergeJoin."""
    from geohash_dotnet_spark.functions.native import with_geohash

    src = str(tmp_path / "bsrc")
    pages(spark, sf_small, replicate=1).write.parquet(src)
    fence = spark.createDataFrame([("9q",), ("9r",)], ["gh"])
    batch = (with_geohash(spark.read.parquet(src), "lat", "lon", P,
                          out="gh")
             .join(F.broadcast(fence.select(F.col("gh")
                                            .alias("__fence_gh"))
                               .distinct()),
                   F.col("gh") == F.col("__fence_gh"), "left_semi"))
    s = batch._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in s and "SortMergeJoin" not in s
