"""Streaming stay points (availableNow, offline): closed-run parity
with the batch operator, cross-batch run extension, late-row policy."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from geohash_dotnet_spark.operators.flows import stay_points
from geohash_dotnet_spark.streaming.stays import streaming_stay_points

SCHEMA = ("user_id long, ts timestamp, event_id long, "
          "lat double, lon double")

P = 3
MIN_DWELL_S = 600
MIN_POINTS = 2


def _sticky(spark, sf_small):
    """Sticky home+jitter events — exactly the q_stay_points input
    (imported, not re-derived: the jitter scale was tuned against the p3
    cell size and a drifting copy here would silently change coverage)."""
    from __spark_entry__ import _sticky_events

    return _sticky_events(spark, sf_small)


def _drain(spark, src, ckpt, out):
    q = (streaming_stay_points(spark, src, SCHEMA, precision=P,
                               min_dwell_s=MIN_DWELL_S,
                               min_points=MIN_POINTS)
         .writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination()


def _batch_closed_stays(ev):
    """Batch truth for the streaming contract: qualifying runs MINUS each
    user's final (still-open) run.  Derive ALL runs (no thresholds),
    drop the last per user, then apply the thresholds."""
    allruns = stay_points(ev, precision=P, min_dwell_s=0, min_points=1,
                          tiebreak="event_id")
    w = Window.partitionBy("user_id")
    closed = (allruns
              .withColumn("__last", F.max("enter_ts").over(w))
              .filter(F.col("enter_ts") < F.col("__last"))
              .filter((F.col("dwell_us") >= MIN_DWELL_S * 1_000_000)
                      & (F.col("n_points") >= MIN_POINTS)))
    return {(r["user_id"], r["cell"],
             r["enter_ts"], r["exit_ts"], r["n_points"])
            for r in closed.collect()}


def _got(spark, out):
    rows = spark.read.parquet(out).collect()
    return {(int(r["user"]), r["cell"], r["enter_ts_us"],
             r["exit_ts_us"], r["n_points"]) for r in rows}


def _us(ts):
    import calendar

    return (calendar.timegm(ts.timetuple()) * 1_000_000 + ts.microsecond)


def test_streaming_stays_match_batch_closed_runs(spark, sf_small, tmp_path):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = _sticky(spark, sf_small)
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))
    ev.write.parquet(src)
    _drain(spark, src, ckpt, out)

    want = {(u, c, _us(e), _us(x), n)
            for u, c, e, x, n in _batch_closed_stays(ev)}
    got = _got(spark, out)
    assert got == want and len(want) > 0


def test_streaming_stays_runs_extend_across_batches(spark, sf_small,
                                                    tmp_path):
    """Split the stream at the median event time: runs that STRADDLE the
    boundary only come out whole if the open-run state survives."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = _sticky(spark, sf_small)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    tcut = ev.agg(F.expr(
        "percentile(unix_micros(CAST(ts AS TIMESTAMP)), 0.5)")).first()[0]
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))
    ev.filter(us <= tcut).write.parquet(src)
    _drain(spark, src, ckpt, out)
    ev.filter(us > tcut).write.mode("append").parquet(src)
    _drain(spark, src, ckpt, out)

    want = {(u, c, _us(e), _us(x), n)
            for u, c, e, x, n in _batch_closed_stays(ev)}
    assert _got(spark, out) == want


def test_streaming_stays_replay_emits_nothing(spark, sf_small, tmp_path):
    """Exact replay: every row ties or precedes the saved position and
    is dropped as late — zero new stays."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = _sticky(spark, sf_small)
    src, ckpt, out = (str(tmp_path / d) for d in ("rsrc", "rckpt", "rout"))
    ev.write.parquet(src)
    _drain(spark, src, ckpt, out)
    n1 = spark.read.parquet(out).count()
    ev.write.mode("append").parquet(src)
    _drain(spark, src, ckpt, out)
    assert spark.read.parquet(out).count() == n1


def test_streaming_stays_numeric_tiebreak(spark, tmp_path):
    """Same-timestamp events with ids 9 and 10 must order NUMERICALLY
    (9 then 10) — a string-cast tiebreak puts '10' before '9', which
    both segments runs differently from the batch twin and, across
    batches, gates a genuinely-new id-10 row as late (silent data
    loss). Regression for the native-type tiebreak projection."""
    import datetime as dt

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    t1 = dt.datetime(2024, 1, 1, 0, 10, 0)
    t2 = dt.datetime(2024, 1, 1, 0, 20, 0)
    a = (0.1, 0.1)      # cell A (p3)
    b = (40.0, 40.0)    # cell B (p3) — closes the A run
    batch1 = [(1, t0, 5, *a), (1, t1, 9, *a)]
    batch2 = [(1, t1, 10, *a),  # same ts as id 9: late iff '10' < '9'
              (1, t2, 11, *b)]
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))
    spark.createDataFrame(batch1, SCHEMA).write.parquet(src)
    q = (streaming_stay_points(spark, src, SCHEMA, precision=P,
                               min_dwell_s=0, min_points=1)
         .writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    spark.createDataFrame(batch2, SCHEMA).write.mode("append").parquet(src)
    q = (streaming_stay_points(spark, src, SCHEMA, precision=P,
                               min_dwell_s=0, min_points=1)
         .writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination()

    rows = spark.read.parquet(out).collect()
    assert len(rows) == 1
    r = rows[0]
    # ids 5, 9 AND 10 belong to the closed cell-A run
    assert r["n_points"] == 3
    assert r["enter_ts_us"] == _us(t0) and r["exit_ts_us"] == _us(t1)
