"""Streaming corridor alerts: live "point entered the route buffer"
detection — the streaming face of the batch corridor join.

This is deliberately a THIN composition: `operators/tracks.py:
corridor_join` is already streaming-safe, because every piece of it is
stateless from Spark's point of view — the geohash tag is a
projection, the candidate cells are a STATIC broadcast relation
(stream-static joins need no watermark and hold no state), and the
exact planar refine is a codegen filter. No aggregation, no
watermark, no state store: each arriving point either matches a
segment and emits immediately or passes through — per-event latency is
one broadcast-hash-probe plus a few FLOPs, and emissions equal the
batch operator row-for-row on the same input (parity-tested).

The alternative shape — streaming the SEGMENTS too — would need a
stream-stream join with geometry rekeying per batch; routes change at
human timescales, so the static-broadcast form (restart the query to
pick up a new route, or wire the candidates through a memory-table
side input) is the production answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.tracks import corridor_join

__all__ = ["streaming_corridor_alerts"]


def streaming_corridor_alerts(spark: SparkSession, source_dir: str,
                              schema: str, segments: list[tuple],
                              radius_deg: float, precision: int,
                              lat: str = "lat",
                              lon: str = "lon") -> DataFrame:
    """readStream(parquet dir with lat/lon) -> corridor_join against the
    static route. Append-mode, stateless: rows emit the moment they
    arrive, one row per (point, segment) hit with ``dist_deg``."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    return corridor_join(stream, segments, radius_deg, precision,
                         lat=lat, lon=lon)
