"""As-of join (operators/asof.py): union+window formulation vs known
values, and the no-join-node plan shape."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from geohash_dotnet_spark.operators import asof_join


def _ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def joined(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01T01:00:00")),   # ties a right row exactly
         (2, 10, _ts("2024-01-01T00:10:00")),   # before any right row
         (3, 10, _ts("2024-01-01T02:00:00")),   # latest-of-two applies
         (4, 10, _ts("2024-01-02T09:00:00")),   # beyond 6h tolerance
         (5, 99, _ts("2024-01-01T02:00:00"))],  # other key: no right rows
        ["event_id", "k", "ts"])
    right = spark.createDataFrame(
        [(10, _ts("2024-01-01T00:30:00"), 7.0),
         (10, _ts("2024-01-01T01:00:00"), 9.0)],
        ["k", "ts", "value"])
    rows = asof_join(left, right, key="k", tolerance_s=6 * 3600).collect()
    return {r["event_id"]: r.asDict() for r in rows}


def test_equal_ts_matches(joined):
    # >= semantics: a right row AT the left timestamp is taken
    assert joined[1]["asof_value"] == 9.0
    assert joined[1]["asof_ts"] == _ts("2024-01-01T01:00:00")


def test_no_prior_row_is_null(joined):
    assert joined[2]["asof_value"] is None
    assert joined[2]["asof_ts"] is None


def test_latest_of_several_wins(joined):
    assert joined[3]["asof_value"] == 9.0


def test_tolerance_nulls_stale_match(joined):
    assert joined[4]["asof_value"] is None
    assert joined[4]["asof_ts"] is None


def test_keys_are_isolated(joined):
    assert joined[5]["asof_value"] is None


def test_plan_has_no_join_node(spark, sf_small):
    """The as-of is one key exchange + window — no join operator, so no
    range-explosion or build-side risk at any scale."""
    ev = spark.read.parquet(f"{sf_small}/events.parquet")
    left = (ev.filter(F.col("event_type") != "purchase")
            .select("event_id", "user_id", "ts"))
    right = (ev.filter(F.col("event_type") == "purchase")
             .select("user_id", "ts", "value"))
    plan = (asof_join(left, right, key="user_id")
            ._jdf.queryExecution().executedPlan().toString())
    for node in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
                 "CartesianProduct", "BroadcastNestedLoopJoin"):
        assert node not in plan
    assert plan.count("Exchange hashpartitioning") == 1


# ---------------------------------------------------------------------------
# interval (range) join
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def rjoined(spark):
    from geohash_dotnet_spark.operators import interval_join

    events = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01T01:00:00")),   # exactly at start: IN
         (2, 10, _ts("2024-01-01T02:30:00")),   # mid-window, crosses the
                                                 # event's own hour bucket
         (3, 10, _ts("2024-01-01T03:00:00")),   # exactly at end: OUT
         (4, 10, _ts("2024-01-01T05:30:00")),   # in the second window only
         (5, 10, _ts("2024-01-01T09:00:00")),   # outside all windows
         (6, 99, _ts("2024-01-01T01:30:00"))],  # other key
        ["event_id", "k", "ts"])
    win = spark.createDataFrame(
        [(100, 10, _ts("2024-01-01T01:00:00"), _ts("2024-01-01T03:00:00")),
         (101, 10, _ts("2024-01-01T02:00:00"), _ts("2024-01-01T06:00:00"))],
        ["window_id", "k", "start_ts", "end_ts"])
    rows = interval_join(events, win, key="k").collect()
    out = {}
    for r in rows:
        out.setdefault(r["event_id"], set()).add(r["window_id"])
    return out


def test_interval_membership(rjoined):
    assert rjoined.get(1) == {100}          # start inclusive
    assert rjoined.get(2) == {100, 101}     # overlap: both windows
    assert rjoined.get(3) == {101}          # end exclusive for 100,
                                            # still inside 101
    assert rjoined.get(4) == {101}          # multi-bucket interval
    assert 5 not in rjoined
    assert 6 not in rjoined                 # key isolation


def test_interval_join_is_equi_not_nested_loop(spark, sf_small):
    """The bucketed decomposition must plan as an EQUI join — a raw
    inequality join would fall back to BroadcastNestedLoopJoin and go
    O(n*m) per key."""
    from geohash_dotnet_spark.operators import interval_join

    ev = spark.read.parquet(f"{sf_small}/events.parquet")
    win = (ev.filter(F.col("event_type") == "purchase")
           .select(F.col("event_id").alias("window_id"), "user_id",
                   F.col("ts").alias("start_ts"),
                   (F.col("ts") + F.expr("interval 2 hours"))
                   .alias("end_ts")))
    lft = (ev.filter(F.col("event_type") != "purchase")
           .select("event_id", "user_id", "ts"))
    plan = (interval_join(lft, win, key="user_id")
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert ("SortMergeJoin" in plan or "ShuffledHashJoin" in plan
            or "BroadcastHashJoin" in plan)


def test_tiny_and_fractional_tolerance(spark):
    """Sub-1e-4 tolerances previously died in the INTERVAL literal
    parser ('%g' goes scientific); make_dt_interval takes any float.
    1e-7 s rounds below microsecond resolution -> only the exact-tie
    row matches; 0.5 s admits a 400 ms-stale match but not 700 ms."""
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01T01:00:00")),
         (2, 10, _ts("2024-01-01T01:00:00.400")),
         (3, 10, _ts("2024-01-01T01:00:00.700"))],
        ["event_id", "k", "ts"])
    right = spark.createDataFrame(
        [(10, _ts("2024-01-01T01:00:00"), 9.0)], ["k", "ts", "value"])

    tiny = {r["event_id"]: r["asof_value"]
            for r in asof_join(left, right, key="k",
                               tolerance_s=1e-7).collect()}
    assert tiny[1] == 9.0 and tiny[2] is None and tiny[3] is None

    half = {r["event_id"]: r["asof_value"]
            for r in asof_join(left, right, key="k",
                               tolerance_s=0.5).collect()}
    assert half[1] == 9.0 and half[2] == 9.0 and half[3] is None
