"""Streaming co-presence pairs (availableNow, offline): parity with the
batch co-travel operator, crowd-cap behavior, exactly-once emission."""

from pyspark.sql import functions as F

from geohash_dotnet_spark.functions.native import geocode_from_url
from geohash_dotnet_spark.operators import cotravel_pairs
from geohash_dotnet_spark.streaming.colocation import (
    streaming_copresence_pairs,
)

SCHEMA = ("event_id long, ts timestamp, user_id long, event_type string, "
          "value double, lat double, lon double")

BUCKET_S = 21600


def _events(spark, sf_small):
    ev = (spark.read.parquet(f"{sf_small}/events.parquet")
          .withColumn("__eid", F.col("event_id").cast("string")))
    ev = geocode_from_url(ev, url="__eid").drop("__eid", "props")
    return ev.select("event_id", "ts", "user_id", "event_type",
                     "value", "lat", "lon")


def _drain(spark, src, ckpt, out, **kw):
    q = (streaming_copresence_pairs(spark, src, SCHEMA, precision=1,
                                    bucket_s=BUCKET_S, **kw)
         .writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination()


def _run_with_barrier(spark, ev, tmp_path, **kw):
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))
    ev.write.parquet(src)
    _drain(spark, src, ckpt, out, **kw)
    # append mode holds back windows newer than the final watermark; a
    # barrier batch with a far-future timestamp finalizes them on re-run
    barrier = ev.limit(1).withColumn(
        "ts", F.to_timestamp(F.lit("2030-01-01 00:00:00")))
    barrier.write.mode("append").parquet(src)
    _drain(spark, src, ckpt, out, **kw)
    return spark.read.parquet(out).filter(
        F.col("bucket_start") < F.lit("2029-01-01"))


def test_streaming_pairs_match_batch(spark, sf_small, tmp_path):
    """Rolling the emitted per-cell pairs up by (user_a, user_b) must
    equal the batch co-travel operator (min_cobuckets=1, same cap)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = _events(spark, sf_small)
    emitted = _run_with_barrier(spark, ev, tmp_path, max_cell_users=8)
    got = {(r["user_a"], r["user_b"]): (r["n"], r["t"])
           for r in emitted.groupBy("user_a", "user_b")
           .agg(F.count(F.lit(1)).alias("n"),
                F.countDistinct("tile").alias("t")).collect()}
    want = {(r["user_a"], r["user_b"]): (r["n_cobuckets"], r["n_tiles"])
            for r in cotravel_pairs(ev, precision=1, bucket_s=BUCKET_S,
                                    min_cobuckets=1,
                                    max_cell_users=8).collect()}
    assert got == want and len(want) > 0


def test_crowd_cells_never_emit(spark, sf_small, tmp_path):
    """With a cap of 2 every cell holding 3+ users is dropped — emitted
    pairs must be exactly the batch pairs under the same cap."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = _events(spark, sf_small)
    emitted = _run_with_barrier(spark, ev, tmp_path, max_cell_users=2)
    got = {(r["user_a"], r["user_b"]): r["n"]
           for r in emitted.groupBy("user_a", "user_b")
           .agg(F.count(F.lit(1)).alias("n")).collect()}
    want = {(r["user_a"], r["user_b"]): r["n_cobuckets"]
            for r in cotravel_pairs(ev, precision=1, bucket_s=BUCKET_S,
                                    min_cobuckets=1,
                                    max_cell_users=2).collect()}
    assert got == want


def test_pairs_ordered_and_distinct(spark, sf_small, tmp_path):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = _events(spark, sf_small)
    emitted = _run_with_barrier(spark, ev, tmp_path, max_cell_users=8)
    rows = emitted.collect()
    assert all(r["user_a"] < r["user_b"] for r in rows)
    assert emitted.distinct().count() == len(rows)  # exactly-once cells
