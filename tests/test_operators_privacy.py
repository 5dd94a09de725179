"""K-anonymous tile generalization (operators/privacy.py)."""

import pytest

from geohash_dotnet_spark.kernels.geohash import decode
from geohash_dotnet_spark.operators import k_anonymous_tiles

SCHEMA = "pt_id long, lat double, lon double"


def _center(cell):
    la, lo = decode([cell])
    return float(la[0]), float(lo[0])


def _pts(counts):
    """counts: {geohash cell: n points at its center}."""
    rows, i = [], 0
    for cell, n in counts.items():
        la, lo = _center(cell)
        for _ in range(n):
            rows.append((i, la, lo))
            i += 1
    return rows


def test_hand_hierarchy(spark):
    """u33 emits at level 3 (5 >= k); its below-k siblings u30/u31/u32
    combine to 8 at parent u3 WITHOUT the already-emitted u33 rows;
    the lone far-away point rolls to the root and is suppressed."""
    df = spark.createDataFrame(
        _pts({"u33": 5, "u30": 2, "u31": 3, "u32": 3, "s11": 1}), SCHEMA)
    out = {(r["tile"], r["level"]): r["n"]
           for r in k_anonymous_tiles(df, k=5, precision=3).collect()}
    assert out == {("u33", 3): 5, ("u3", 2): 8, ("*", 0): 1}


def test_accounting_invariant(spark):
    """Every input record lands in exactly one output row: sum(n) ==
    |input|, every published tile has n >= k, tile length == level."""
    rows = [(i, -60.0 + (i * 37 % 120) + 0.11, -170.0 + (i * 53 % 340)
             + 0.13) for i in range(500)]
    df = spark.createDataFrame(rows, SCHEMA)
    out = k_anonymous_tiles(df, k=7, precision=3).collect()
    assert sum(r["n"] for r in out) == 500
    for r in out:
        if r["tile"] == "*":
            assert r["level"] == 0
        else:
            assert r["n"] >= 7 and len(r["tile"]) == r["level"]


def test_k1_emits_everything_at_max_precision(spark):
    df = spark.createDataFrame(_pts({"u33": 2, "s11": 1}), SCHEMA)
    out = {(r["tile"], r["level"]): r["n"]
           for r in k_anonymous_tiles(df, k=1, precision=3).collect()}
    assert out == {("u33", 3): 2, ("s11", 3): 1}


def test_all_suppressed(spark):
    df = spark.createDataFrame(_pts({"u33": 2, "s11": 1}), SCHEMA)
    out = [tuple(r) for r in k_anonymous_tiles(df, k=10,
                                               precision=3).collect()]
    assert out == [("*", 0, 3)]


def test_layout_independent(spark):
    rows = [(i, -60.0 + (i * 37 % 120) + 0.11, -170.0 + (i * 53 % 340)
             + 0.13) for i in range(300)]
    df = spark.createDataFrame(rows, SCHEMA)
    a = sorted(map(tuple, k_anonymous_tiles(df, 5, 3).collect()))
    b = sorted(map(tuple, k_anonymous_tiles(df.repartition(7, "pt_id"),
                                            5, 3).collect()))
    assert a == b and len(a) > 0


def test_param_validation(spark):
    df = spark.createDataFrame([(1, 0.0, 0.0)], SCHEMA)
    with pytest.raises(ValueError):
        k_anonymous_tiles(df, k=0, precision=3)
    with pytest.raises(ValueError):
        k_anonymous_tiles(df, k=5, precision=13)


def test_plan_no_window_no_sort(spark):
    """The ladder is pure filter+agg: no Window, no Sort, no cartesian —
    the corpus is touched by partial-agged hash aggregation only."""
    df = spark.createDataFrame([(1, 10.0, 10.0)], SCHEMA)
    plan = k_anonymous_tiles(df, k=3, precision=3) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "Sort" not in plan
    assert "CartesianProduct" not in plan
    assert "partial_count" in plan  # map-side partials on the corpus agg
