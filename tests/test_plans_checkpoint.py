"""Resumable checkpointing: idempotent re-run, lineage, crash recovery."""

import json
import os

from pyspark.sql import functions as F

from geohash_dotnet_spark.functions import with_geohash
from geohash_dotnet_spark.plans.checkpoint import (
    checkpointed_write,
    read_checkpointed,
    run_lineage,
)
from geohash_dotnet_spark.sources.pages import pages


def _tagged(spark, sf_small):
    pg = with_geohash(pages(spark, sf_small, replicate=4), "lat", "lon", 3)
    return pg.withColumn("bucket", F.substring("gh", 1, 1))


def test_checkpointed_write_and_resume(spark, sf_small, tmp_path):
    out = str(tmp_path / "run1")
    df = _tagged(spark, sf_small)
    buckets = sorted(r["bucket"] for r in df.select("bucket").distinct().collect())

    r1 = checkpointed_write(df, out, "bucket", buckets, "url",
                            metric_cols={"n_cells": "count(distinct gh)"})
    assert sorted(r1["written"]) == buckets and not r1["skipped"]

    # full resume: everything skipped, nothing rewritten
    r2 = checkpointed_write(df, out, "bucket", buckets, "url")
    assert sorted(r2["skipped"]) == buckets and not r2["written"]

    # lineage carries rows + metrics + app id per partition
    lineage = run_lineage(out)
    assert len(lineage) == len(buckets)
    assert all(m["rows"] > 0 and "n_cells" in m and m["app_id"] for m in lineage)

    # read-back equals input
    back = read_checkpointed(spark, out)
    assert back.count() == df.count()


def test_checkpoint_recovers_from_partial_run(spark, sf_small, tmp_path):
    out = str(tmp_path / "run2")
    df = _tagged(spark, sf_small)
    buckets = sorted(r["bucket"] for r in df.select("bucket").distinct().collect())

    # simulate a crash after the first two buckets
    checkpointed_write(df, out, "bucket", buckets[:2], "url")
    # delete one manifest -> that bucket must be re-written
    victim = buckets[0]
    os.remove(os.path.join(out, "_manifests", f"bucket-{victim}.json"))

    r = checkpointed_write(df, out, "bucket", buckets, "url")
    assert victim in r["written"]
    assert buckets[1] in r["skipped"]
    assert set(r["written"]) | set(r["skipped"]) == set(buckets)
    assert read_checkpointed(spark, out).count() == df.count()


def test_checkpoint_invalidates_on_input_change(spark, sf_small, tmp_path):
    out = str(tmp_path / "run3")
    df = _tagged(spark, sf_small)
    b = sorted(r["bucket"] for r in df.select("bucket").distinct().collect())[:1]
    checkpointed_write(df, out, "bucket", b, "url")
    # same bucket, different input slice -> fingerprint mismatch -> rewrite
    df2 = _tagged(spark, sf_small).filter(F.length("url") > 0).limit(10**9) \
        .filter(F.col("rep") < 2)
    r = checkpointed_write(df2, out, "bucket", b, "url")
    assert r["written"] == b


def test_checkpoint_then_bucket_composition(spark, sf_small, tmp_path):
    """Resumable checkpointed write composed with the bucketed layout:
    manifests commit per slice, and the final bucketed table aggregates
    exchange-free with values equal to the source."""
    from pyspark.sql import functions as F

    from geohash_dotnet_spark.functions import with_geohash
    from geohash_dotnet_spark.plans import (
        bucketed_tile_stats,
        checkpoint_then_bucket,
        run_lineage,
    )
    from geohash_dotnet_spark.sources.pages import pages

    pg = with_geohash(pages(spark, sf_small), "lat", "lon", 4) \
        .withColumn("gh2", F.substring("gh", 1, 1))
    summary, table = checkpoint_then_bucket(
        pg.select("url", "gh", "gh2"), str(tmp_path / "ck"),
        "t_ckpt_bucketed", str(tmp_path / "tbl"), n_buckets=8)
    assert summary["written"] and not summary["skipped"]
    assert len(run_lineage(str(tmp_path / "ck"))) == len(summary["written"])

    agg = bucketed_tile_stats(table)
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    want = {r["gh2"]: r["n"] for r in
            pg.groupBy("gh2").agg(F.count(F.lit(1)).alias("n")).collect()}
    got = {r["tile"]: r["n_pages"] for r in agg.collect()}
    assert got == want
    spark.sql("DROP TABLE IF EXISTS t_ckpt_bucketed")
