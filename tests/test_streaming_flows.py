"""Streaming OD tile flows (availableNow, offline): parity with the
batch lag-window operator, cross-batch state carry, late-row policy."""

from pyspark.sql import functions as F

from geohash_dotnet_spark.functions.native import geocode_from_url
from geohash_dotnet_spark.operators.flows import tile_flows
from geohash_dotnet_spark.streaming.flows import (
    flows_from_transitions,
    streaming_tile_flows,
)

SCHEMA = ("event_id long, ts timestamp, user_id long, event_type string, "
          "value double, lat double, lon double")


def _events(spark, sf_small):
    ev = (spark.read.parquet(f"{sf_small}/events.parquet")
          .withColumn("__eid", F.col("event_id").cast("string")))
    ev = geocode_from_url(ev, url="__eid").drop("__eid", "props")
    return ev.select("event_id", "ts", "user_id", "event_type",
                     "value", "lat", "lon")


def _drain(spark, src, ckpt, out):
    q = (streaming_tile_flows(spark, src, SCHEMA, precision=2)
         .writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination()


def _od(df):
    return {(r["from_tile"], r["to_tile"]): (r["n_moves"], r["n_users"])
            for r in df.collect()}


def test_streaming_flows_match_batch(spark, sf_small, tmp_path):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = _events(spark, sf_small)
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))
    ev.write.parquet(src)

    _drain(spark, src, ckpt, out)
    got = _od(flows_from_transitions(spark.read.parquet(out)))
    want = _od(tile_flows(ev, precision=2, tiebreak="event_id"))
    assert got == want and len(want) > 0


def test_streaming_flows_state_carries_across_restarts(spark, sf_small,
                                                       tmp_path):
    """Split the stream at the median event time: transitions that CROSS
    the boundary only exist if per-user state survives the restart."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = _events(spark, sf_small)
    # cut on event time so the second batch is strictly later (the
    # parquet ts is TIMESTAMP_NTZ: cast before unix_micros; UTC pinned)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    tcut = ev.agg(F.expr(
        "percentile(unix_micros(CAST(ts AS TIMESTAMP)), 0.5)")).first()[0]
    early = ev.filter(us <= tcut)
    late = ev.filter(us > tcut)

    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))
    early.write.parquet(src)
    _drain(spark, src, ckpt, out)
    late.write.mode("append").parquet(src)
    _drain(spark, src, ckpt, out)

    got = _od(flows_from_transitions(spark.read.parquet(out)))
    want = _od(tile_flows(ev, precision=2, tiebreak="event_id"))
    assert got == want


def test_streaming_flows_drop_late_rows(spark, sf_small, tmp_path):
    """A row older than a user's saved position is dropped — replaying
    the whole input a second time emits zero new transitions."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = _events(spark, sf_small)
    src, ckpt, out = (str(tmp_path / d) for d in ("lsrc", "lckpt", "lout"))
    ev.write.parquet(src)
    _drain(spark, src, ckpt, out)
    n1 = spark.read.parquet(out).count()
    ev.write.mode("append").parquet(src)  # exact replay: all late/dupe
    _drain(spark, src, ckpt, out)
    n2 = spark.read.parquet(out).count()
    # the replayed copy of the LAST event per user ties the saved
    # position (equal ts and tiebreak) and is dropped as late too
    assert n2 == n1


def test_streaming_flows_numeric_tiebreak(spark, tmp_path):
    """Same-timestamp events with ids 9 and 10 must order NUMERICALLY:
    a string-cast tiebreak gates a new id-10 row at the saved (ts, 9)
    position as late ('10' < '9') and silently drops its transition.
    Regression for the native-type tiebreak projection."""
    import datetime as dt

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    t1 = dt.datetime(2024, 1, 1, 0, 10, 0)
    a = (0.1, 0.1)
    b = (40.0, 40.0)
    sch = "user_id long, ts timestamp, event_id long, lat double, lon double"
    batch1 = [(1, t0, 5, *a), (1, t1, 9, *a)]
    batch2 = [(1, t1, 10, *b)]  # same ts as id 9: dropped iff '10' < '9'
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))
    spark.createDataFrame(batch1, sch).write.parquet(src)
    q = (streaming_tile_flows(spark, src, sch, precision=3)
         .writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    spark.createDataFrame(batch2, sch).write.mode("append").parquet(src)
    q = (streaming_tile_flows(spark, src, sch, precision=3)
         .writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination()

    rows = spark.read.parquet(out).collect()
    # exactly one move: cell A -> cell B at t1, driven by the id-10 row
    assert len(rows) == 1 and rows[0]["move_ts_us"] == (
        int(t1.replace(tzinfo=dt.timezone.utc).timestamp()) * 1_000_000)


def test_tiebreak_projection_types(spark):
    """Native-type contract: integral -> long, float/double -> double,
    string -> string; anything whose string rendering orders differently
    from its native ORDER BY (decimal, timestamp, ...) raises instead of
    silently falling back to lexicographic order."""
    import pytest

    from geohash_dotnet_spark.streaming._order import tiebreak_projection

    df = spark.createDataFrame(
        [(1, 1.5, "a", __import__("datetime").datetime(2024, 1, 1))],
        "i long, d double, s string, t timestamp")
    assert tiebreak_projection(df, "i")[1:] == ("long", int)
    assert tiebreak_projection(df, "d")[1:] == ("double", float)
    assert tiebreak_projection(df, "s")[1:] == ("string", str)
    with pytest.raises(TypeError, match="native ORDER BY"):
        tiebreak_projection(df, "t")
