"""Streaming geofence transitions (availableNow, offline): FULL parity
with the batch lag-window twin (no open-run caveat — every crossing is
provably closed at its own event), cross-batch baseline carry, replay
policy, and a hand-built crossing sequence."""

import datetime as dt

from pyspark.sql import Window
from pyspark.sql import functions as F

from geohash_dotnet_spark.functions.native import with_geohash
from geohash_dotnet_spark.streaming.transitions import (
    streaming_geofence_transitions)

SCHEMA = ("user_id long, ts timestamp, event_id long, "
          "lat double, lon double")
P = 3
# last-char split of the base32 alphabet: a deterministic ~half of all
# p3 cells is "inside", so jittering users keep crossing the boundary
_IN_LAST = "0123456789bcdefg"


def _sticky(spark, sf_small):
    from __spark_entry__ import _sticky_events

    return _sticky_events(spark, sf_small)


def _fence(spark, ev):
    """The fence covering set: every p3 cell the corpus visits whose
    last character falls in the lower half of the base32 alphabet."""
    g = with_geohash(ev, "lat", "lon", P)
    return (g.select("gh").distinct()
            .filter(F.substring("gh", P, 1).isin(list(_IN_LAST))))


def _drain(spark, src, ckpt, out, fence):
    q = (streaming_geofence_transitions(spark, src, SCHEMA, fence, P)
         .writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination()


def _batch_transitions(ev, fence):
    """Batch truth: lag window over the same broadcast fence
    membership, first row per user emits nothing (lag NULL)."""
    g = with_geohash(ev, "lat", "lon", P)
    member = (g.join(F.broadcast(fence.select(F.col("gh")
                                              .alias("__fence_gh"))
                                 .withColumn("__in", F.lit(1))),
                     g["gh"] == F.col("__fence_gh"), "left")
              .withColumn("inside", F.coalesce(F.col("__in"), F.lit(0))))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("inside").over(w)
    rows = (member.withColumn("__prev", prev)
            .filter(F.col("__prev").isNotNull()
                    & (F.col("__prev") != F.col("inside")))
            .select(F.col("user_id").cast("string").alias("user"),
                    F.unix_micros(F.col("ts").cast("timestamp"))
                    .alias("event_ts_us"),
                    F.when(F.col("inside") == 1, "enter")
                    .otherwise("exit").alias("kind"))
            .collect())
    return sorted((r["user"], r["event_ts_us"], r["kind"]) for r in rows)


def _got(spark, out):
    rows = spark.read.parquet(out).collect()
    return sorted((r["user"], r["event_ts_us"], r["kind"]) for r in rows)


def test_streaming_transitions_full_parity(spark, sf_small, tmp_path):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = _sticky(spark, sf_small)
    fence = _fence(spark, ev)
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))
    ev.write.parquet(src)
    _drain(spark, src, ckpt, out, fence)

    want = _batch_transitions(ev, fence)
    got = _got(spark, out)
    assert got == want and len(want) > 0
    # both directions must occur
    kinds = {k for _, _, k in got}
    assert kinds == {"enter", "exit"}


def test_streaming_transitions_baseline_carries_across_batches(
        spark, sf_small, tmp_path):
    """Split at the median event time: a crossing whose two events
    straddle the boundary only emits if the inside-flag baseline
    survives in state."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = _sticky(spark, sf_small)
    fence = _fence(spark, ev)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    tcut = ev.agg(F.expr(
        "percentile(unix_micros(CAST(ts AS TIMESTAMP)), 0.5)")).first()[0]
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))
    ev.filter(us <= tcut).write.parquet(src)
    _drain(spark, src, ckpt, out, fence)
    ev.filter(us > tcut).write.mode("append").parquet(src)
    _drain(spark, src, ckpt, out, fence)

    assert _got(spark, out) == _batch_transitions(ev, fence)


def test_streaming_transitions_replay_emits_nothing(spark, sf_small,
                                                    tmp_path):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = _sticky(spark, sf_small)
    fence = _fence(spark, ev)
    src, ckpt, out = (str(tmp_path / d) for d in ("rsrc", "rckpt", "rout"))
    ev.write.parquet(src)
    _drain(spark, src, ckpt, out, fence)
    n1 = spark.read.parquet(out).count()
    ev.write.mode("append").parquet(src)
    _drain(spark, src, ckpt, out, fence)
    assert spark.read.parquet(out).count() == n1


def test_streaming_transitions_hand_sequence(spark, tmp_path):
    """out -> in -> in -> out -> in: enter at e2, exit at e4, enter at
    e5; the first event is baseline only."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    from geohash_dotnet_spark.kernels import encode

    t = lambda h: dt.datetime(2024, 1, 1, h, 0, 0)
    inside_pt = (10.0, 10.0)
    outside_pt = (40.0, 40.0)
    cell = str(encode(*inside_pt, P)[0])
    fence = spark.createDataFrame([(cell,)], "gh string")
    rows = [(1, t(1), 1, *outside_pt),
            (1, t(2), 2, *inside_pt),
            (1, t(3), 3, *inside_pt),
            (1, t(4), 4, *outside_pt),
            (1, t(5), 5, *inside_pt)]
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))
    spark.createDataFrame(rows, SCHEMA).write.parquet(src)
    _drain(spark, src, ckpt, out, fence)

    def us(h):
        return int(dt.datetime(2024, 1, 1, h, 0, 0,
                               tzinfo=dt.timezone.utc).timestamp()
                   * 1_000_000)

    assert _got(spark, out) == [("1", us(2), "enter"),
                                ("1", us(4), "exit"),
                                ("1", us(5), "enter")]
