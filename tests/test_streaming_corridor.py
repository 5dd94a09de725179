"""Streaming corridor alerts (availableNow, offline): stateless
stream-static composition must equal the batch corridor join exactly."""

from pyspark.sql import functions as F

from geohash_dotnet_spark.functions.native import geocode_from_url
from geohash_dotnet_spark.operators import corridor_join
from geohash_dotnet_spark.streaming.corridor import (
    streaming_corridor_alerts,
)

SCHEMA = ("event_id long, ts timestamp, user_id long, event_type string, "
          "value double, lat double, lon double")

SEGS = [("eu1", 40.0, 0.0, 45.0, 10.0), ("eu2", 45.0, 10.0, 48.0, 20.0),
        ("na1", 30.0, -120.0, 40.0, -90.0)]


def _events(spark, sf_small):
    ev = (spark.read.parquet(f"{sf_small}/events.parquet")
          .withColumn("__eid", F.col("event_id").cast("string")))
    ev = geocode_from_url(ev, url="__eid").drop("__eid", "props")
    return ev.select("event_id", "ts", "user_id", "event_type",
                     "value", "lat", "lon")


def _hits(df):
    return sorted((r["event_id"], r["seg_id"], r["dist_deg"])
                  for r in df.collect())


def test_streaming_alerts_match_batch(spark, sf_small, tmp_path):
    """Stateless stream-static corridor: emitted alerts equal the batch
    operator row-for-row (same distances, bit-identical)."""
    ev = _events(spark, sf_small)
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))
    ev.write.parquet(src)

    q = (streaming_corridor_alerts(spark, src, SCHEMA, SEGS,
                                   radius_deg=3.0, precision=2)
         .select("event_id", "seg_id", "dist_deg")
         .writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination()

    got = _hits(spark.read.parquet(out))
    want = _hits(corridor_join(ev, SEGS, radius_deg=3.0, precision=2)
                 .select("event_id", "seg_id", "dist_deg"))
    assert got == want and len(want) > 0


def test_incremental_batches_append_only_new_hits(spark, sf_small,
                                                  tmp_path):
    """A second micro-batch emits exactly its own hits — no state, no
    reprocessing, no duplicates."""
    ev = _events(spark, sf_small)
    first = ev.filter(F.col("event_id") % 2 == 0)
    second = ev.filter(F.col("event_id") % 2 == 1)
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))
    first.write.parquet(src)

    def drain():
        q = (streaming_corridor_alerts(spark, src, SCHEMA, SEGS,
                                       radius_deg=3.0, precision=2)
             .select("event_id", "seg_id", "dist_deg")
             .writeStream.format("parquet")
             .option("path", out).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    drain()
    n_first = spark.read.parquet(out).count()
    second.write.mode("append").parquet(src)
    drain()
    got = _hits(spark.read.parquet(out))
    want = _hits(corridor_join(ev, SEGS, radius_deg=3.0, precision=2)
                 .select("event_id", "seg_id", "dist_deg"))
    assert got == want
    assert n_first == len(_hits(
        corridor_join(first, SEGS, radius_deg=3.0, precision=2)
        .select("event_id", "seg_id", "dist_deg")))
