"""Hypertable-style time rollup (operators/rollup.py)."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from geohash_dotnet_spark.operators import time_rollup


def _ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def rolled(spark):
    rows = [
        (_ts("2024-01-01T00:00:10"), 1.25),
        (_ts("2024-01-01T00:00:50"), 2.50),   # same minute
        (_ts("2024-01-01T00:59:00"), 4.00),   # same hour, other minute
        (_ts("2024-01-01T23:00:00"), 8.00),   # same day, other hour
        (_ts("2024-01-02T00:00:00"), 16.00),  # next day
    ]
    df = spark.createDataFrame(rows, ["ts", "value"])
    out = time_rollup(df).collect()
    return {(r["level"], r["bucket"]): (r["n"], r["sum_value_us"])
            for r in out}


def test_rollup_known_values(rolled):
    assert rolled[("minute", _ts("2024-01-01T00:00:00"))] == (2, 3_750_000)
    assert rolled[("hour", _ts("2024-01-01T00:00:00"))] == (3, 7_750_000)
    assert rolled[("day", _ts("2024-01-01T00:00:00"))] == (4, 15_750_000)
    assert rolled[("day", _ts("2024-01-02T00:00:00"))] == (1, 16_000_000)
    # level cardinalities: 4 minutes, 3 hours, 2 days
    levels = {}
    for (lv, _b) in rolled:
        levels[lv] = levels.get(lv, 0) + 1
    assert levels == {"minute": 4, "hour": 3, "day": 2}


def test_rollup_reuses_exchanges_single_scan(spark, sf_small):
    """Each coarser level must read the finer level's exchange, not the
    source: final plan = ONE FileScan + a ReusedExchange per extra
    level."""
    ev = spark.read.parquet(f"{sf_small}/events.parquet")
    r = time_rollup(ev)
    r.collect()  # AQE finalizes the plan on execution
    plan = r._jdf.queryExecution().executedPlan().toString()
    final = plan.split("Initial Plan")[0]
    assert final.count("ReusedExchange") == 2
    assert final.count("Scan parquet") + final.count("FileScan") <= 2
