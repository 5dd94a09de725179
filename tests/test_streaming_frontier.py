"""Stream-static frontier discovery vs the batch frontier_hosts twin."""

from pyspark.sql import functions as F

from geohash_dotnet_spark.operators.links import (
    frontier_hosts,
    with_planted_mixed_anchors,
)
from geohash_dotnet_spark.sources.pages import pages
from geohash_dotnet_spark.streaming.frontier import streaming_frontier
from geohash_dotnet_spark.streaming.tiles import run_available_now

SCHEMA = ("url string, warc_ts timestamp, html binary, text string, "
          "lang string, doc_id long, rep int, lat double, lon double")


def _planted(spark, sf_small, replicate=4):
    return with_planted_mixed_anchors(
        pages(spark, sf_small, replicate=replicate), replicate=replicate)


def test_streaming_frontier_matches_batch(spark, sf_small, tmp_path):
    """Full parity: the streamed per-link frontier rows, aggregated by
    host in batch, equal frontier_hosts over the same corpus — and the
    resolved complement is genuinely dropped (both branches live)."""
    pg = _planted(spark, sf_small)
    src = str(tmp_path / "src")
    pg.write.parquet(src)

    known = pg.select("url")
    result = streaming_frontier(spark, src, SCHEMA, known)
    out = str(tmp_path / "out")
    run_available_now(result, str(tmp_path / "ckpt"), out)

    got = (spark.read.parquet(out)
           .groupBy("host")
           .agg(F.count(F.lit(1)).alias("n_links"),
                F.countDistinct("src_url").alias("n_src_urls"),
                F.min("link").alias("sample_url")))
    want = frontier_hosts(pg)
    g = sorted(tuple(r) for r in got.collect())
    w = sorted(tuple(r) for r in want.collect())
    assert g == w and len(g) > 0
    # every emitted link is off-corpus (the anti join held)
    emitted = spark.read.parquet(out)
    assert emitted.join(pg.select(F.col("url").alias("link")),
                        "link", "left_semi").count() == 0


def test_streaming_frontier_incremental_batches_append(spark, sf_small,
                                                       tmp_path):
    """Two arrivals: rows emitted for the second file are exactly the
    second file's frontier — stateless append, no cross-batch state."""
    pg = _planted(spark, sf_small, replicate=2)
    first = pg.filter(F.col("rep") == 0)
    second = pg.filter(F.col("rep") == 1)
    src = str(tmp_path / "src")
    first.write.parquet(src)

    known = pg.select("url")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    run_available_now(streaming_frontier(spark, src, SCHEMA, known),
                      ckpt, out)
    n1 = spark.read.parquet(out).count()

    second.write.mode("append").parquet(src)
    run_available_now(streaming_frontier(spark, src, SCHEMA, known),
                      ckpt, out)
    n2 = spark.read.parquet(out).count()

    # second run appended exactly the second slice's frontier rows
    from geohash_dotnet_spark.operators.links import extract_links

    ext2 = (extract_links(second)
            .where(F.col("link").rlike("^https?://"))
            .join(pg.select(F.col("url").alias("link")),
                  "link", "left_anti").count())
    assert n2 - n1 == ext2


def test_streaming_frontier_join_is_broadcast(spark, sf_small):
    """The stream side must never shuffle: the identical operator
    construction in batch mode plans a BroadcastHashJoin LeftAnti,
    never a SortMergeJoin."""
    pg = _planted(spark, sf_small, replicate=2)
    links = F.expr(
        "regexp_extract_all(decode(html, 'UTF-8'), '<a href=\"([^\"]+)\"', 1)")
    src = (pg.select(F.col("url").alias("src_url"),
                     F.explode(links).alias("link"))
           .where(F.col("link").rlike("^https?://")))
    known = F.broadcast(pg.select(F.col("url").alias("link")).distinct())
    plan = (src.join(known, "link", "left_anti")
            ._jdf.queryExecution().executedPlan().toString())
    main = plan.split("Initial Plan")[0]
    assert "BroadcastHashJoin" in main and "LeftAnti" in main
    assert "SortMergeJoin" not in main
