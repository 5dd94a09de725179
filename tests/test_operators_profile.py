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


def test_paragraph_dedup_global_first_wins(spark):
    from geohash_dotnet_spark.operators.dedup import paragraph_dedup
    rows = [
        (1, "alpha\nbeta\ngamma"),
        (2, "beta\ndelta"),        # beta already owned by doc 1 pos 1
        (3, "alpha\nbeta"),        # fully deduped away
    ]
    out = {r["doc_id"]: r for r in
           paragraph_dedup(_docs(spark, rows)).collect()}
    assert out[1]["text_dedup"] == "alpha\nbeta\ngamma"
    assert (out[1]["n_pars"], out[1]["n_kept"]) == (3, 3)
    assert out[2]["text_dedup"] == "delta"
    assert (out[2]["n_pars"], out[2]["n_kept"]) == (2, 1)
    # every paragraph of doc 3 occurred earlier -> empty but present
    assert out[3]["text_dedup"] == ""
    assert (out[3]["n_pars"], out[3]["n_kept"]) == (2, 0)


def test_paragraph_dedup_within_doc_repeat_and_order(spark):
    from geohash_dotnet_spark.operators.dedup import paragraph_dedup
    rows = [(7, "x\ny\nx\nz")]  # repeat inside ONE doc also collapses
    out = paragraph_dedup(_docs(spark, rows)).collect()[0]
    assert out["text_dedup"] == "x\ny\nz"  # original order preserved
    assert (out["n_pars"], out["n_kept"]) == (4, 3)


def test_paragraph_dedup_layout_independent(spark, sf_med):
    from geohash_dotnet_spark.operators.dedup import paragraph_dedup
    docs = spark.read.parquet(f"{sf_med}/documents.parquet")
    a = paragraph_dedup(docs, sep=" ").orderBy("doc_id").collect()
    b = (paragraph_dedup(docs.repartition(13), sep=" ")
         .orderBy("doc_id").collect())
    assert a == b


def test_paragraph_dedup_no_window_sort(spark):
    """The 100 TB claim in the docstring, pinned: keeper election is a
    keyed min agg, never a corpus-wide Window (no single-partition
    sort node anywhere in the plan)."""
    from geohash_dotnet_spark.operators.dedup import paragraph_dedup
    rows = [(1, "a\nb"), (2, "b\nc")]
    plan = (paragraph_dedup(_docs(spark, rows))
            ._jdf.queryExecution().executedPlan().toString())
    assert "Window" not in plan
    assert "SinglePartition" not in plan
