"""Streaming per-tile SpaceSaving heavy hitters (availableNow,
offline): exact-regime batch parity, cross-restart merge, overflow
guarantees."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from geohash_dotnet_spark.functions.native import with_geohash
from geohash_dotnet_spark.sources.pages import pages
from geohash_dotnet_spark.streaming.heavy import (
    heavy_hitters_latest,
    streaming_tile_heavy_hitters,
)

SCHEMA = "url string, lat double, lon double, lang string"


def _pages(spark, sf_small):
    return (pages(spark, sf_small)
            .select("url", "lat", "lon", "lang"))


def _drain(spark, src, ckpt, out, capacity=8, precision=1):
    q = (streaming_tile_heavy_hitters(spark, src, SCHEMA, key="lang",
                                      precision=precision,
                                      capacity=capacity)
         .writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination()


def _latest(spark, out):
    return {(r["tile"], r["key"]): (r["cnt_est"], r["err"])
            for r in heavy_hitters_latest(
                spark.read.parquet(out)).collect()}


def _batch_truth(df, precision=1):
    return {(r["gh"], r["lang"]): r["count"] for r in
            with_geohash(df, "lat", "lon", precision)
            .groupBy("gh", "lang").count().collect()}


def test_exact_regime_matches_batch(spark, sf_small, tmp_path):
    """capacity >= distinct keys per tile (langs) -> the sketch is
    exact: latest tables == batch per-(tile, key) counts, err = 0."""
    pg = _pages(spark, sf_small)
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))
    pg.write.parquet(src)
    _drain(spark, src, ckpt, out, capacity=8)
    got = _latest(spark, out)
    want = _batch_truth(pg)
    assert {k: v[0] for k, v in got.items()} == want
    assert all(err == 0 for _, err in got.values())


def test_state_merges_across_restarts(spark, sf_small, tmp_path):
    """Counts accumulated before a restart keep counting after it."""
    pg = _pages(spark, sf_small).cache()
    half1 = pg.filter(F.crc32("url") % 2 == 0)
    half2 = pg.filter(F.crc32("url") % 2 == 1)
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))
    half1.write.parquet(src)
    _drain(spark, src, ckpt, out, capacity=8)
    half2.write.mode("append").parquet(src)
    _drain(spark, src, ckpt, out, capacity=8)
    got = _latest(spark, out)
    want = _batch_truth(pg)
    assert {k: v[0] for k, v in got.items()} == want


def test_overflow_guarantees(spark, tmp_path):
    """One tile, 10 distinct keys, capacity 4: every counter
    overestimates within its recorded err, max err <= N/capacity, and
    every key with true freq > N/capacity is present."""
    # key i appears 2^i times (i = 0..9), all at one location
    rows = [(f"u{i}-{j}", 10.0, 10.0, f"k{i:02d}")
            for i in range(10) for j in range(1 << i)]
    df = spark.createDataFrame(rows, SCHEMA)
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))
    df.repartition(1).write.parquet(src)
    _drain(spark, src, ckpt, out, capacity=4)
    table = {k[1]: v for k, v in _latest(spark, out).items()}
    assert len(table) == 4
    true = {f"k{i:02d}": 1 << i for i in range(10)}
    n = sum(true.values())  # 1023
    for k, (est, err) in table.items():
        assert true[k] <= est <= true[k] + err
        assert err <= n // 4
    for k, c in true.items():
        if c > n / 4:  # SpaceSaving guarantee
            assert k in table, f"heavy key {k} missing"


def test_validation(spark):
    with pytest.raises(ValueError):
        streaming_tile_heavy_hitters(spark, "/tmp/x", SCHEMA, capacity=0)


def test_latest_fold_keeps_only_max_seq(spark):
    em = spark.createDataFrame(
        [("t", "a", 1, 0, 1, 1), ("t", "a", 3, 0, 3, 2),
         ("t", "b", 2, 0, 3, 2), ("s", "a", 5, 0, 5, 1)],
        "tile string, key string, cnt_est long, err long, "
        "n_total long, seq long")
    got = {(r["tile"], r["key"]): r["cnt_est"]
           for r in heavy_hitters_latest(em).collect()}
    assert got == {("t", "a"): 3, ("t", "b"): 2, ("s", "a"): 5}


def test_null_keys_excluded_from_sketch_and_total(spark, tmp_path):
    """NULL keys are filtered out BEFORE the sketch: they appear in no
    counter and do not inflate n_total (which would corrupt the
    err <= N/capacity bound)."""
    rows = ([(f"u{i}", 10.0, 10.0, "en") for i in range(5)]
            + [(f"n{i}", 10.0, 10.0, None) for i in range(3)])
    df = spark.createDataFrame(rows, SCHEMA)
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))
    df.repartition(1).write.parquet(src)
    _drain(spark, src, ckpt, out, capacity=8)
    emitted = spark.read.parquet(out).collect()
    assert {r["key"] for r in emitted} == {"en"}
    assert all(r["n_total"] == 5 for r in emitted)
    got = _latest(spark, out)
    assert list(got.values()) == [(5, 0)]
