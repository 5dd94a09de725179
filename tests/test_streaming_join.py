"""Stream-stream tile-activity join vs the identical batch join."""

from pyspark.sql import functions as F

from geohash_dotnet_spark.functions.native import geocode_from_url, with_geohash
from geohash_dotnet_spark.sources.pages import pages
from geohash_dotnet_spark.streaming.join import streaming_tile_activity_join
from geohash_dotnet_spark.streaming.tiles import run_available_now

PAGES_SCHEMA = ("url string, warc_ts timestamp, text string, lang string, "
                "doc_id long, rep int, lat double, lon double")
EVENTS_SCHEMA = ("event_id long, ts timestamp, user_id long, "
                 "event_type string, value double, props string")
P = 1
WINDOW_S = 2 * 86400  # wide window so the small sf0.001 slice matches


def test_stream_stream_join_matches_batch(spark, sf_small, tmp_path):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    pg = pages(spark, sf_small, replicate=1)
    ev = spark.read.parquet(f"{sf_small}/events.parquet")
    psrc, esrc = str(tmp_path / "p"), str(tmp_path / "e")
    pg.write.parquet(psrc)
    ev.write.parquet(esrc)

    result = streaming_tile_activity_join(
        spark, psrc, PAGES_SCHEMA, esrc, EVENTS_SCHEMA,
        precision=P, window_s=WINDOW_S)
    out = str(tmp_path / "out")
    run_available_now(result, str(tmp_path / "ckpt"), out)
    got = spark.read.parquet(out)

    bpg = with_geohash(pg, "lat", "lon", P, out="tile")
    bev = geocode_from_url(
        ev.withColumn("__uid", F.col("user_id").cast("string")),
        url="__uid", lat_out="e_lat", lon_out="e_lon")
    bev = with_geohash(bev, "e_lat", "e_lon", P, out="e_tile")
    cond = ((F.col("tile") == F.col("e_tile"))
            & (F.col("ts") >= F.col("warc_ts")
               - F.expr(f"INTERVAL {WINDOW_S} SECONDS"))
            & (F.col("ts") <= F.col("warc_ts")
               + F.expr(f"INTERVAL {WINDOW_S} SECONDS")))
    batch = bpg.join(bev, cond, "inner")

    assert got.count() == batch.count() > 0
    g = {(r["url"], r["event_id"]) for r in
         got.select("url", "event_id").collect()}
    b = {(r["url"], r["event_id"]) for r in
         batch.select("url", "event_id").collect()}
    assert g == b
