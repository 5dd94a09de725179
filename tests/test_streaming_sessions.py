"""Streaming gap sessionization (session_window) vs the batch operator."""

from pyspark.sql import functions as F

from geohash_dotnet_spark.operators import sessionize
from geohash_dotnet_spark.streaming.sessions import streaming_sessions
from geohash_dotnet_spark.streaming.tiles import run_available_now

SCHEMA = ("event_id long, ts timestamp, user_id long, event_type string, "
          "value double, props string")
GAP_S = 1800


def test_streaming_sessions_match_batch(spark, sf_small, tmp_path):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = spark.read.parquet(f"{sf_small}/events.parquet")

    # boundary-tie precondition: the >= (streaming) vs > (batch) gap
    # semantics only coincide when no adjacent pair is EXACTLY gap apart
    from pyspark.sql import Window
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ep = F.unix_micros(F.col("ts").cast("timestamp"))
    ties = ev.withColumn("d", ep - F.lag(ep).over(w)) \
        .filter(F.col("d") == GAP_S * 1_000_000).count()
    assert ties == 0

    src = str(tmp_path / "src")
    ev.write.parquet(src)
    result = streaming_sessions(spark, src, SCHEMA, gap_s=GAP_S,
                                watermark="4 hours")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    run_available_now(result, ckpt, out)

    # append mode holds sessions newer than the final watermark; a
    # far-future barrier row closes them on a re-run over the same
    # checkpoint
    barrier = ev.limit(1).withColumn(
        "ts", F.to_timestamp(F.lit("2030-01-01 00:00:00"))) \
        .withColumn("user_id", F.lit(-1).cast("long"))
    barrier.write.mode("append").parquet(src)
    run_available_now(
        streaming_sessions(spark, src, SCHEMA, gap_s=GAP_S,
                           watermark="4 hours"), ckpt, out)

    got = (spark.read.parquet(out)
           .filter(F.col("user_id") >= 0)
           .select("user_id",
                   F.unix_micros(F.col("session_start").cast("timestamp"))
                   .alias("start_us"),
                   F.col("session_end_us").alias("end_us"),
                   "n_events", "duration_us", "sum_value"))

    batch = (sessionize(ev, gap_s=GAP_S)
             .select("user_id",
                     F.unix_micros(F.col("session_start").cast("timestamp"))
                     .alias("start_us"),
                     F.unix_micros(F.col("session_end").cast("timestamp"))
                     .alias("end_us"),
                     "n_events", "duration_us", "sum_value"))

    g = {tuple(r) for r in got.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert len(g) == len(b) > 0
    assert g == b


def test_streaming_sessions_plan_is_native(spark, sf_small, tmp_path):
    """The session aggregation must be the JVM session-window operator —
    no Python (FlatMapGroupsInPandas/ArrowEvalPython) in the plan."""
    src = str(tmp_path / "nsrc")
    spark.read.parquet(f"{sf_small}/events.parquet").write.parquet(src)
    result = streaming_sessions(spark, src, SCHEMA)
    plan = result._jdf.queryExecution().analyzed().toString()
    assert "session_window" in plan
    assert "FlatMapGroupsInPandas" not in plan
    assert "ArrowEval" not in plan
