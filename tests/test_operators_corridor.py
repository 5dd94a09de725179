"""Corridor (route-buffer) join (operators/tracks.py:corridor_join)."""

import pytest
from pyspark.sql import functions as F

from geohash_dotnet_spark.operators import corridor_join

SCHEMA = "pt_id long, lat double, lon double"


def _grid(n=25, lat0=38.0, lat1=52.0, lon0=-5.0, lon1=35.0):
    rows, i = [], 0
    for a in range(n):
        for b in range(n):
            rows.append((i, lat0 + (lat1 - lat0) * a / (n - 1) + 0.003,
                         lon0 + (lon1 - lon0) * b / (n - 1) + 0.007))
            i += 1
    return rows


SEGS = [("s1", 40.0, 0.0, 45.0, 10.0), ("s2", 45.0, 10.0, 48.0, 20.0),
        ("s3", 48.0, 20.0, 50.0, 30.0)]


def _bruteforce(rows, segs, r):
    out = set()
    for pid, py, px in rows:
        for sid, y1, x1, y2, x2 in segs:
            dx, dy = x2 - x1, y2 - y1
            l2 = dx * dx + dy * dy
            if l2 == 0.0:
                d = ((px - x1) ** 2 + (py - y1) ** 2) ** 0.5
            else:
                t = min(max(((px - x1) * dx + (py - y1) * dy) / l2, 0.0), 1.0)
                d = ((px - (x1 + t * dx)) ** 2
                     + (py - (y1 + t * dy)) ** 2) ** 0.5
            if d <= r:
                out.add((pid, sid))
    return out


def test_matches_bruteforce(spark):
    """The candidate-ring over-approximation + exact refine must equal
    plain brute force over every (point, segment) pair."""
    rows = _grid()
    df = spark.createDataFrame(rows, SCHEMA)
    got = {(r["pt_id"], r["seg_id"])
           for r in corridor_join(df, SEGS, radius_deg=3.0,
                                  precision=2).collect()}
    want = _bruteforce(rows, SEGS, 3.0)
    assert len(want) > 100  # the lattice genuinely straddles the route
    assert got == want


def test_point_near_two_segments_hits_both(spark):
    """A point near the shared vertex of s1/s2 emits one row per
    segment (corridor joins are per-segment, not per-route)."""
    df = spark.createDataFrame([(1, 45.1, 10.1)], SCHEMA)
    got = sorted(r["seg_id"] for r in corridor_join(
        df, SEGS, radius_deg=1.0, precision=2).collect())
    assert got == ["s1", "s2"]


def test_degenerate_segment_is_point_distance(spark):
    df = spark.createDataFrame([(1, 45.0, 10.5)], SCHEMA)
    segs = [("pt", 45.0, 10.0, 45.0, 10.0)]
    [r] = corridor_join(df, segs, radius_deg=1.0, precision=2).collect()
    assert abs(r["dist_deg"] - 0.5) < 1e-12


def test_radius_exceeding_cell_rejected(spark):
    df = spark.createDataFrame([(1, 45.0, 10.0)], SCHEMA)
    with pytest.raises(ValueError):
        corridor_join(df, SEGS, radius_deg=10.0, precision=3)


def test_broadcast_plan_no_point_shuffle(spark):
    df = spark.createDataFrame(_grid(5), SCHEMA)
    plan = corridor_join(df, SEGS, radius_deg=3.0, precision=2) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "CartesianProduct" not in plan


def test_layout_independent(spark):
    rows = _grid(12)
    df = spark.createDataFrame(rows, SCHEMA)
    a = sorted(map(tuple, corridor_join(df, SEGS, 3.0, 2)
                   .select("pt_id", "seg_id", "dist_deg").collect()))
    b = sorted(map(tuple, corridor_join(df.repartition(7, "pt_id"),
                                        SEGS, 3.0, 2)
                   .select("pt_id", "seg_id", "dist_deg").collect()))
    assert a == b and len(a) > 0


def test_snap_to_route_is_argmin(spark):
    """snap picks the nearest segment per point; points off-route drop."""
    from geohash_dotnet_spark.operators import snap_to_route

    rows = _grid(12)
    df = spark.createDataFrame(rows, SCHEMA)
    got = {r["pt_id"]: (r["seg_id"], r["dist_deg"])
           for r in snap_to_route(df, SEGS, 3.0, 2, "pt_id").collect()}
    # brute-force nearest within radius
    want = {}
    for pid, py, px in rows:
        best = None
        for sid, y1, x1, y2, x2 in SEGS:
            dx, dy = x2 - x1, y2 - y1
            l2 = dx * dx + dy * dy
            t = min(max(((px - x1) * dx + (py - y1) * dy) / l2, 0.0), 1.0)
            d = ((px - (x1 + t * dx)) ** 2
                 + (py - (y1 + t * dy)) ** 2) ** 0.5
            if d <= 3.0 and (best is None or (d, sid) < best):
                best = (d, sid)
        if best is not None:
            want[pid] = (best[1], best[0])
    assert set(got) == set(want)
    for pid in got:
        assert got[pid][0] == want[pid][0]
        assert abs(got[pid][1] - want[pid][1]) < 1e-12
    assert len(got) > 20


def test_snap_one_row_per_point(spark):
    from geohash_dotnet_spark.operators import snap_to_route

    df = spark.createDataFrame([(1, 45.1, 10.1)], SCHEMA)  # near s1/s2
    out = snap_to_route(df, SEGS, 3.0, 2, "pt_id").collect()
    assert len(out) == 1


def test_duplicate_seg_id_rejected(spark):
    """Duplicate seg_ids would silently refine every candidate against
    the LAST segment's geometry — reject up front (ADVICE r4)."""
    df = spark.createDataFrame([(1, 45.0, 10.0)], SCHEMA)
    segs = [("s1", 45.0, 9.0, 45.0, 11.0),
            ("s1", 0.0, 0.0, 1.0, 1.0)]
    with pytest.raises(ValueError, match="duplicate seg_id"):
        corridor_join(df, segs, radius_deg=1.0, precision=2)
