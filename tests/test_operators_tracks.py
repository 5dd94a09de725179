"""Trajectory-to-cells coverage (operators/tracks.py)."""

import pytest
from pyspark.sql import functions as F

from geohash_dotnet_spark.kernels import encode
from geohash_dotnet_spark.kernels.geohash import lat_lng_steps
from geohash_dotnet_spark.operators.tracks import cover_tracks


def _seg_df(spark, rows):
    return spark.createDataFrame(
        rows, ["track_id", "lat1", "lon1", "lat2", "lon2"])


def test_point_segment_is_one_cell(spark):
    df = _seg_df(spark, [(1, 10.0, 20.0, 10.0, 20.0)])
    out = cover_tracks(df, precision=5).collect()
    assert len(out) == 1
    assert out[0]["gh"] == encode(10.0, 20.0, 5)[0]


def test_horizontal_segment_covers_every_crossed_cell(spark):
    """An axis-aligned segment cannot corner-clip, so the sampled
    covering must equal the exact crossed-cell set."""
    p = 5
    _, lng_step = lat_lng_steps(p)
    lat = 10.0 + 1e-9  # keep off the cell boundary
    lon_a, lon_b = 20.0, 20.0 + 7.3 * lng_step
    df = _seg_df(spark, [(1, lat, lon_a, lat, lon_b)])
    got = {r["gh"] for r in cover_tracks(df, precision=p).collect()}
    want = {encode(lat, lon_a + k * lng_step, p)[0] for k in range(8)}
    assert got == want


def test_endpoints_always_present(spark):
    df = _seg_df(spark, [(7, -33.9, 151.2, 48.85, 2.35)])  # SYD -> PAR
    got = {r["gh"] for r in cover_tracks(df, precision=3).collect()}
    assert encode(-33.9, 151.2, 3)[0] in got
    assert encode(48.85, 2.35, 3)[0] in got
    assert len(got) > 50  # a ~17,000 km track crosses many p3 cells


def test_sample_ceiling_guard(spark):
    df = _seg_df(spark, [(1, -80.0, -170.0, 80.0, 170.0)])
    with pytest.raises(ValueError, match="samples"):
        cover_tracks(df, precision=9, max_samples_per_segment=1000)


def test_no_shuffle_before_distinct(spark):
    """The sample fan-out and encode are projections; the only exchange
    is the final distinct on (track, cell)."""
    df = _seg_df(spark, [(1, 10.0, 20.0, 11.0, 21.0)])
    plan = (cover_tracks(df, precision=4, guard=False)
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange") == 1
