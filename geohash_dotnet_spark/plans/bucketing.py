"""Geohash-prefix bucketed persistence (SURVEY §4.3's physical-layout
promise, demonstrated end-to-end).

Persisting the pages table with ``bucketBy(N, gh2)`` (gh2 = the
precision-2 geohash prefix) records a ``HashPartitioning(gh2, N)`` in the
table metadata. Every downstream operator whose required distribution is
satisfied by that partitioning — per-tile aggregation keyed by ``gh2``
(including distinct aggregates, whose (gh2, url) clustering is implied by
gh2 co-location), cell-keyed joins between two tables bucketed the same
way, compression/rollup within a prefix — then runs with NO shuffle
exchange: the scan itself delivers the distribution.

At 100 TB this converts the per-query tile-stats exchange (the dominant
cost of repeated spatial rollups) into a one-time write cost amortized
over every query against the layout; tests/test_plan_shapes.py asserts
the Exchange-free plans and bench.py measures the win.

Relationship to plans/checkpoint.py: checkpointed_write slices a dataset
into independently-committed hive-style bucket *directories* for resume;
persist_bucketed records hash-bucket *metadata* for shuffle elimination.
Compose them by checkpoint-writing first, then persisting the validated
dataset bucketed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_prefix(df: DataFrame, gh_col: str = "gh", out: str = "gh2",
                length: int = 2) -> DataFrame:
    """Materialize the geohash prefix used as the bucket key."""
    return df.withColumn(out, F.substring(gh_col, 1, length))


def persist_bucketed(df: DataFrame, name: str, path: str,
                     bucket_col: str = "gh2", n_buckets: int = 32,
                     sort: bool = True) -> DataFrame:
    """Write ``df`` as a bucketed parquet table and return the re-read
    table (whose scan carries the bucket distribution).

    ``name`` registers in the session catalog; ``path`` makes the table
    external so the files live where the caller chooses.
    """
    w = (df.write.format("parquet").mode("overwrite").option("path", path)
         .bucketBy(n_buckets, bucket_col))
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(name)
    return df.sparkSession.table(name)


def bucketed_tile_stats(table: DataFrame, bucket_col: str = "gh2",
                        tile_col: str | None = None) -> DataFrame:
    """Per-tile stats — exchange-free on a table written by
    persist_bucketed (assert: no Exchange in the plan).

    With ``tile_col`` set (e.g. the full-precision ``gh``), the grouping
    key is (bucket_col, tile_col): semantically identical to grouping by
    the tile alone (the bucket is a prefix-function of it), but it lets
    Spark's syntactic distribution check see that the bucketed scan
    already satisfies the clustering — so even FULL-precision tile
    rollups run shuffle-free on the prefix-bucketed layout.
    """
    keys = [F.col(bucket_col)] if tile_col is None else \
        [F.col(bucket_col), F.col(tile_col)]
    out = (table.groupBy(*keys)
           .agg(F.count(F.lit(1)).alias("n_pages"),
                F.countDistinct("url").alias("n_urls")))
    tile = bucket_col if tile_col is None else tile_col
    return out.select(F.col(tile).alias("tile"), "n_pages", "n_urls")
