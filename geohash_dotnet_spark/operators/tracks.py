"""Trajectory (polyline) to geohash-cell coverage.

The reference covers polygons and circles (`/root/reference/src/
PolygonHasher.cs`, `RadiusHasher.cs`); routes/tracks are the third shape
web-scale geo pipelines need (map-matching, corridor joins, movement
tile rollups). Semantics here are SAMPLING-BASED and engine-portable:
each segment is sampled at >= 2 points per cell step (endpoints always
included), every sample is geohash-encoded with the native JVM encode,
and the per-track distinct cell set is the covering. A cell the segment
only corner-clips for less than half a cell step may be missed — that
is the documented contract (identical in the DuckDB twin, which replays
the same sample lattice bit-for-bit); densify with ``oversample`` where
the guarantee must tighten.

Scale shape: one projection computes the per-segment sample count, an
``explode(sequence(...))`` fans samples out WITHOUT any shuffle (rows
expand in place), the encode is the same staged codegen projection the
pages pipeline uses, and the only exchange is the final per-track
distinct — keyed by (track, cell), the output's own key. Long segments
are bounded by an admission guard (`max_samples_per_segment`) mirroring
the reference's candidate-cell ceiling (src/RadiusHasher.cs:56-63).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.native import with_geohash
from ..functions.oracle import tagged_select_sql
from ..kernels.geohash import lat_lng_steps

__all__ = ["cover_tracks", "cover_tracks_sql"]


def _samples_expr(lat_step: float, lng_step: float, oversample: float,
                  cap: int):
    """Per-segment sample count n (segment is split into n spans, n+1
    points): >= oversample points per cell step crossed, >= 1."""
    spans = F.greatest(
        F.abs(F.col("lat2") - F.col("lat1")) / F.lit(lat_step),
        F.abs(F.col("lon2") - F.col("lon1")) / F.lit(lng_step))
    return F.least(F.greatest(F.ceil(spans * F.lit(oversample)),
                              F.lit(1)).cast("int"),
                   F.lit(cap))


def cover_tracks(segments: DataFrame, precision: int,
                 track_col: str = "track_id", oversample: float = 2.0,
                 max_samples_per_segment: int = 100_000,
                 guard: bool = True) -> DataFrame:
    """(track_id, gh) distinct cell covering of each track's segments.

    ``segments`` needs columns (track_col, lat1, lon1, lat2, lon2).
    ``guard=True`` raises when any segment would exceed the sample
    ceiling instead of silently truncating its covering.
    """
    lat_step, lng_step = lat_lng_steps(precision)
    n = _samples_expr(lat_step, lng_step, oversample,
                      max_samples_per_segment)
    seg = segments.withColumn("__n", n)
    if guard:
        spans = F.greatest(
            F.abs(F.col("lat2") - F.col("lat1")) / F.lit(lat_step),
            F.abs(F.col("lon2") - F.col("lon1")) / F.lit(lng_step))
        need = F.ceil(spans * F.lit(oversample))
        over = seg.filter(need > F.lit(max_samples_per_segment)).count()
        if over:
            raise ValueError(
                f"{over} segment(s) need more than "
                f"{max_samples_per_segment} samples at precision "
                f"{precision}; raise max_samples_per_segment, lower the "
                f"precision, or split the segments")
    t = (F.col("__i").cast("double") / F.col("__n"))
    pts = (seg.select(F.col(track_col),
                      "lat1", "lon1", "lat2", "lon2", "__n",
                      F.explode(F.sequence(F.lit(0), F.col("__n")))
                      .alias("__i"))
           .withColumns({
               "lat": F.col("lat1") + (F.col("lat2") - F.col("lat1")) * t,
               "lon": F.col("lon1") + (F.col("lon2") - F.col("lon1")) * t,
           }))
    return (with_geohash(pts, "lat", "lon", precision, out="gh")
            .select(track_col, "gh")
            .distinct())


def cover_tracks_sql(inner: str, precision: int,
                     track_col: str = "track_id", oversample: float = 2.0,
                     max_samples_per_segment: int = 100_000) -> str:
    """DuckDB twin of cover_tracks: same sample lattice (identical IEEE
    arithmetic), same staged encode, same distinct."""
    lat_step, lng_step = lat_lng_steps(precision)
    spans = (f"greatest(abs(lat2 - lat1) / {lat_step!r}, "
             f"abs(lon2 - lon1) / {lng_step!r})")
    n = (f"least(CAST(greatest(ceil({spans} * {oversample!r}), 1) AS INT), "
         f"{max_samples_per_segment})")
    pts = f"""
SELECT {track_col},
       lat1 + (lat2 - lat1) * (CAST(__i AS DOUBLE) / __n) AS lat,
       lon1 + (lon2 - lon1) * (CAST(__i AS DOUBLE) / __n) AS lon
FROM (SELECT *, unnest(range(0, __n + 1)) AS __i
      FROM (SELECT *, {n} AS __n FROM ({inner})))
"""
    tagged = tagged_select_sql(pts, precision, keep=track_col)
    return f"SELECT DISTINCT {track_col}, gh FROM ({tagged})"
