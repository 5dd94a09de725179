"""duplicate_spans / group_quantiles / tile_anomaly unit tests (the
driver-gate oracle replica in test_entry_oracle.py covers the
cross-engine value contract; these pin operator semantics)."""

import numpy as np
from pyspark.sql import functions as F

from geohash_dotnet_spark.operators.dedup import duplicate_spans
from geohash_dotnet_spark.operators.hotspots import tile_anomaly
from geohash_dotnet_spark.operators.text import group_quantiles


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dup_spans_planted_pair(spark):
    boiler = " ".join(f"w{i}" for i in range(10))
    rows = [
        (1, boiler + " unique one here extra pad tokens"),
        (2, boiler + " totally different tail of words x"),
        (3, "short"),  # < width: excluded entirely
        (4, " ".join(f"u{i}" for i in range(20))),  # all-unique spans
    ]
    out = {r["doc_id"]: r for r in
           duplicate_spans(_docs(spark, rows), width=10).collect()}
    assert 3 not in out  # too short for one span
    assert out[4]["n_dup_spans"] == 0 and out[4]["dup_frac"] == 0.0
    # docs 1 and 2 share exactly the width-10 boilerplate prefix span
    assert out[1]["n_dup_spans"] == 1
    assert out[2]["n_dup_spans"] == 1
    assert out[1]["n_spans"] == len(rows[0][1].split()) - 10 + 1


def test_dup_spans_counts_positions_not_distinct_spans(spark):
    ten = " ".join(f"w{i}" for i in range(10))
    # doc 1 contains the shared span TWICE (two positions)
    rows = [(1, ten + " gap1 gap2 gap3 gap4 gap5 gap6 gap7 gap8 gap9 "
             + ten),
            (2, ten)]
    out = {r["doc_id"]: r for r in
           duplicate_spans(_docs(spark, rows), width=10).collect()}
    assert out[2]["n_dup_spans"] == 1
    assert out[1]["n_dup_spans"] == 2  # both positions of the repeat


def test_dup_spans_layout_independent(spark, sf_med):
    docs = spark.read.parquet(f"{sf_med}/documents.parquet")
    a = duplicate_spans(docs, width=8).orderBy("doc_id").collect()
    b = (duplicate_spans(docs.repartition(13), width=8)
         .orderBy("doc_id").collect())
    assert a == b


def test_group_quantiles_exact_matches_numpy(spark, sf_med):
    docs = spark.read.parquet(f"{sf_med}/documents.parquet")
    out = {r["lang"]: r for r in group_quantiles(docs).collect()}
    pdf = docs.select("lang", "n_chars").toPandas()
    for lang, grp in pdf.groupby("lang"):
        want = np.percentile(grp["n_chars"].to_numpy(dtype=float),
                             [50, 90, 99])
        got = out[lang]
        for col, w in zip(("q_50", "q_90", "q_99"), want):
            assert abs(got[col] - w) < 1e-5, (lang, col)


def test_group_quantiles_approx_within_tolerance(spark, sf_med):
    """The documented 100 TB path: percentile_approx stays near exact."""
    docs = spark.read.parquet(f"{sf_med}/documents.parquet")
    exact = {r["lang"]: r for r in group_quantiles(docs).collect()}
    approx = {r["lang"]: r for r in
              group_quantiles(docs, exact=False).collect()}
    for lang, e in exact.items():
        spread = e["q_99"] - e["q_50"] + 1.0
        for col in ("q_50", "q_90", "q_99"):
            assert abs(approx[lang][col] - e[col]) <= 0.1 * spread


def test_tile_anomaly_planted_burst(spark):
    # one tile, 5 quiet days (1 event) + 1 burst day (21 events)
    rows = ([(f"2024-01-0{d} 12:00:00", 10.0, 10.0) for d in range(1, 6)]
            + [("2024-01-06 12:00:00", 10.0, 10.0)] * 21)
    df = spark.createDataFrame(rows, "t string, lat double, lon double") \
        .select(F.to_timestamp("t").alias("ts"), "lat", "lon")
    out = {str(r["day"]): r for r in tile_anomaly(df, precision=2).collect()}
    assert len(out) == 6
    burst = out["2024-01-06"]
    assert burst["n"] == 21 and burst["z"] > 2.0
    assert all(v["z"] < 0 for k, v in out.items() if k != "2024-01-06")


def test_tile_anomaly_degenerate_tiles_emit_null_z(spark):
    rows = [
        ("2024-01-01 00:00:00", 10.0, 10.0),   # tile A: single day
        ("2024-01-01 00:00:00", -40.0, 100.0),  # tile B: two days,
        ("2024-01-02 00:00:00", -40.0, 100.0),  # equal counts (var=0)
    ]
    df = spark.createDataFrame(rows, "t string, lat double, lon double") \
        .select(F.to_timestamp("t").alias("ts"), "lat", "lon")
    out = tile_anomaly(df, precision=2).collect()
    assert len(out) == 3
    assert all(r["z"] is None for r in out)
