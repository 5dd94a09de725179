"""Streaming geofence alerting: a stream-static join between a page
stream and a (small, static) geofence covering-cell set.

The README's batch geofence recipe (`/root/reference/README.md:58-86`:
polygon -> covering cells -> membership test) turned continuous: the
covering set is computed ONCE with the batch kernels (cover_polygon /
compress), registered as a static DataFrame, and every micro-batch
hash-joins against its broadcast copy — Structured Streaming's
stream-static join, which needs no watermark and holds no state (the
static side is re-broadcast per batch, so a refreshed fence table is
picked up without restarting the query).

At scale: the fence set is cells (thousands), the stream is pages
(unbounded); the join must be broadcast — a shuffled stream-static join
would re-partition every micro-batch. Asserted in the parity test via
the batch twin's plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.native import with_geohash


def streaming_geofence(spark: SparkSession, source_dir: str, schema: str,
                       fence_cells: DataFrame, precision: int,
                       lat: str = "lat", lon: str = "lon") -> DataFrame:
    """readStream(parquet dir) -> gh tag -> stream-static broadcast
    semi-join against the fence covering cells. Emits the matching rows
    (append mode, stateless)."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    tagged = with_geohash(stream, lat, lon, precision, out="gh")
    fence = F.broadcast(fence_cells.select(F.col("gh").alias("__fence_gh"))
                        .distinct())
    return (tagged.join(fence, tagged["gh"] == fence["__fence_gh"],
                        "left_semi"))
