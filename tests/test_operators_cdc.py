"""Snapshot diff / CDC (operators/cdc.py)."""

from pyspark.sql import functions as F

from geohash_dotnet_spark.operators import snapshot_diff


def test_all_four_statuses(spark):
    old = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")],
        "doc_id long, text string")
    new = spark.createDataFrame(
        [(1, "alpha"), (2, "beta CHANGED"), (4, "delta")],
        "doc_id long, text string")
    out = {r["doc_id"]: r["status"]
           for r in snapshot_diff(old, new).collect()}
    assert out == {1: "unchanged", 2: "changed", 3: "removed",
                   4: "added"}


def test_whitespace_normalized_fingerprint(spark):
    """Only-whitespace edits are NOT changes (the shared fingerprint
    normalization from exact dedup applies here too)."""
    old = spark.createDataFrame([(1, "a  b")], "doc_id long, text string")
    new = spark.createDataFrame([(1, "A b ")], "doc_id long, text string")
    out = snapshot_diff(old, new).collect()
    assert out[0]["status"] == "unchanged"


def test_fp_column_carries_survivor(spark):
    old = spark.createDataFrame(
        [(1, "x"), (2, "y")], "doc_id long, text string")
    new = spark.createDataFrame(
        [(1, "x2")], "doc_id long, text string")
    rows = {r["doc_id"]: r for r in snapshot_diff(old, new).collect()}
    # changed row carries the NEW fp, removed row the OLD fp
    from geohash_dotnet_spark.operators.text import with_fingerprint
    fx2 = with_fingerprint(
        spark.createDataFrame([("x2",)], "text string")).collect()[0][
        "fingerprint"]
    fy = with_fingerprint(
        spark.createDataFrame([("y",)], "text string")).collect()[0][
        "fingerprint"]
    assert rows[1]["fp"] == fx2 and rows[2]["fp"] == fy


def test_join_payload_excludes_text(spark, sf_small):
    """The diff join must carry (id, fp) only — text is pruned before
    the exchange (fingerprint computed in the scan projection)."""
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    new = docs.filter(F.col("doc_id") % 2 == 0)
    out = snapshot_diff(docs, new)
    out.collect()
    head = (out._jdf.queryExecution().executedPlan().toString()
            .split("Initial Plan")[0])
    join_on = head[head.index("SortMergeJoin"):].split("\n")[0] \
        if "SortMergeJoin" in head else ""
    assert "text" not in join_on
