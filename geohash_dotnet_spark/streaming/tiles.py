"""Structured Streaming tile counts: a stream of geocoded pages aggregated
per (event-time window, geohash tile) with watermark-based late-data
handling.

The reference is batch-only; this is the engine's streaming extension so
the same gh_* functions serve continuous ingestion. File-source +
``availableNow`` keeps it testable offline; swap readStream source for
Kafka in production.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.native import with_geohash


def streaming_tile_counts(spark: SparkSession, source_dir: str, schema: str,
                          precision: int = 3, ts_col: str = "warc_ts",
                          window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """readStream(parquet dir) -> gh tag -> windowed per-tile counts.

    Late rows beyond the watermark are dropped; state is bounded by
    (watermark / window) * live tiles.
    """
    stream = (spark.readStream.schema(schema).parquet(source_dir))
    tagged = with_geohash(stream, "lat", "lon", precision, out="gh")
    return (tagged
            .withWatermark(ts_col, watermark)
            .groupBy(F.window(F.col(ts_col), window).alias("win"),
                     F.col("gh").alias("tile"))
            .agg(F.count(F.lit(1)).alias("n_pages"))
            .select(F.col("win.start").alias("window_start"),
                    F.col("win.end").alias("window_end"),
                    "tile", "n_pages"))


def run_available_now(result: DataFrame, checkpoint_dir: str,
                      out_dir: str) -> None:
    """Drain everything currently available and stop (offline-testable)."""
    q = (result.writeStream
         .format("parquet")
         .option("checkpointLocation", checkpoint_dir)
         .option("path", out_dir)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
