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


def test_checkpointed_write_runs_o1_source_scans(spark, sf_small, tmp_path):
    """A 4-bucket write must run O(1) Spark jobs (stats pre-pass + one
    partitionBy write + one read-back agg), not O(buckets) — counted via
    the status tracker on a dedicated job group."""
    sc = spark.sparkContext

    def probe(n_buckets, out):
        df = _tagged(spark, sf_small).withColumn(
            "bucket", (F.xxhash64("url") % n_buckets + n_buckets) % n_buckets)
        group = f"ckpt_o1_{n_buckets}"
        sc.setJobGroup(group, "checkpointed_write job-count probe")
        try:
            r = checkpointed_write(df, out, "bucket",
                                   list(range(n_buckets)), "url")
        finally:
            sc.setJobGroup(None, None)
        assert sorted(r["written"]) == list(range(n_buckets))
        assert read_checkpointed(spark, out).count() == df.count()
        return len(sc.statusTracker().getJobIdsForGroup(group))

    j2 = probe(2, str(tmp_path / "o1_2"))
    j8 = probe(8, str(tmp_path / "o1_8"))
    # old per-bucket form: 1 stats + N x (write + read-back) jobs; the
    # single-scan form's job count must not grow with the bucket count
    assert j8 == j2, f"{j2} jobs at 2 buckets vs {j8} at 8"
    assert j2 <= 9, f"{j2} jobs at 2 buckets"


def test_checkpoint_bucket_key_type_mismatch_is_not_silent(spark, sf_small,
                                                           tmp_path):
    """ADVICE r2: an int bucket column matched against string bucket keys
    must still fingerprint correctly (str-normalized on both sides) —
    never write real rows under an empty '0:None' fingerprint."""
    df = _tagged(spark, sf_small).withColumn(
        "bucket", (F.xxhash64("url") % 2 + 2) % 2)  # int column: {0, 1}
    out = str(tmp_path / "mix")
    r = checkpointed_write(df, out, "bucket", ["0", "1"], "url")
    assert sorted(r["written"]) == ["0", "1"]
    for m in r["metrics"].values():
        assert m["rows"] > 0
        assert m["input_fingerprint"] != "0:None"
    # resume with the int-typed key list: same normalized fingerprints
    r2 = checkpointed_write(df, out, "bucket", [0, 1], "url")
    assert sorted(r2["skipped"]) == [0, 1] and not r2["written"]


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


def test_checkpointed_layout_prunes_partitions_at_the_scan(spark, tmp_path):
    """The sink-side scale contract: a bucket-filtered read of the
    partitionBy layout must prune at the DIRECTORY level — the scan's
    PartitionFilters carries the bucket predicate, and the executed
    file scan reads only the matching bucket's files (at 100 TB this is
    the difference between touching one tile's directory and listing
    the whole lake)."""
    from pyspark.sql import functions as F

    from geohash_dotnet_spark.functions.native import with_geohash
    from geohash_dotnet_spark.sources.pages import pages

    out = str(tmp_path / "part")
    pg = with_geohash(pages(spark, "/root/testdata/sf0.001"),
                      "lat", "lon", 1, out="gh")
    (pg.withColumn("bucket", F.col("gh"))
       .write.partitionBy("bucket").parquet(out))

    back = (spark.read.option("basePath", out).parquet(out + "/bucket=*")
            .filter(F.col("bucket") == "9"))
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "bucket" in pf and "9" in pf, pf
    # value parity: pruned read == full-scan filter
    full = spark.read.option("basePath", out).parquet(out + "/bucket=*")
    assert back.count() == full.filter(F.col("bucket") == "9").count() > 0
    # and the scan really skipped the other buckets' files
    n_files = back.select(F.input_file_name()).distinct().collect()
    assert all("/bucket=9/" in r[0] for r in n_files)
