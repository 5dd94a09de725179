"""Structured Streaming tile counts (availableNow, offline)."""

from pyspark.sql import functions as F

from geohash_dotnet_spark.sources.pages import pages
from geohash_dotnet_spark.streaming.tiles import (
    run_available_now,
    streaming_tile_counts,
)


def test_streaming_tile_counts_matches_batch(spark, sf_small, tmp_path):
    src = str(tmp_path / "src")
    pg = pages(spark, sf_small, replicate=2)
    pg.write.parquet(src)

    schema = ("url string, warc_ts timestamp, text string, lang string, "
              "doc_id long, rep int, lat double, lon double")
    result = streaming_tile_counts(spark, src, schema, precision=2,
                                   window="24 hours", watermark="48 hours")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    run_available_now(result, ckpt, out)

    # append mode holds back windows newer than the final watermark; a
    # barrier batch with a far-future timestamp finalizes them on re-run
    barrier = pg.limit(1).withColumn(
        "warc_ts", F.to_timestamp(F.lit("2030-01-01 00:00:00")))
    barrier.write.mode("append").parquet(src)
    result2 = streaming_tile_counts(spark, src, schema, precision=2,
                                    window="24 hours", watermark="48 hours")
    run_available_now(result2, ckpt, out)

    got = spark.read.parquet(out).filter(
        F.col("window_start") < F.lit("2029-01-01"))
    # streaming totals equal the batch aggregation
    from geohash_dotnet_spark.functions import with_geohash
    batch = (with_geohash(pg, "lat", "lon", 2)
             .groupBy(F.window("warc_ts", "24 hours").alias("win"),
                      F.col("gh"))
             .count())
    assert got.agg(F.sum("n_pages")).collect()[0][0] == pg.count()
    assert got.count() == batch.count()


def test_stateful_tile_totals_accumulate_across_restarts(spark, sf_small,
                                                         tmp_path):
    """applyInPandasWithState custom operator: per-tile running totals
    must persist in checkpointed state across a query restart and equal
    the batch ground truth after each drain."""
    from geohash_dotnet_spark.functions import with_geohash
    from geohash_dotnet_spark.streaming.tiles import (
        drain_updates,
        stateful_tile_totals,
    )

    src = str(tmp_path / "ssrc")
    ckpt = str(tmp_path / "sckpt")
    out = str(tmp_path / "sout")
    pg = pages(spark, sf_small, replicate=2)
    pg.write.parquet(src)
    schema = ("url string, warc_ts timestamp, text string, lang string, "
              "doc_id long, rep int, lat double, lon double")

    drain_updates(stateful_tile_totals(spark, src, schema, precision=2),
                  ckpt, out)
    got1 = (spark.read.parquet(out)
            .groupBy("tile").agg(F.max("total").alias("total")).collect())
    want = {r["gh"]: r["n"] for r in
            with_geohash(pg, "lat", "lon", 2).groupBy("gh")
            .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert {r["tile"]: r["total"] for r in got1} == want

    # second drop of the same data, NEW query, SAME checkpoint: state
    # restores and totals double
    pg.write.mode("append").parquet(src)
    drain_updates(stateful_tile_totals(spark, src, schema, precision=2),
                  ckpt, out)
    got2 = (spark.read.parquet(out)
            .groupBy("tile").agg(F.max("total").alias("total")).collect())
    assert {r["tile"]: r["total"] for r in got2} == \
        {t: 2 * n for t, n in want.items()}
