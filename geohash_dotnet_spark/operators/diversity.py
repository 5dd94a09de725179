"""Tile diversity and radial-profile analytics over the pages table.

Two census-style reductions a geo web-corpus pipeline runs constantly:

- :func:`tile_entropy` — per-tile Shannon entropy of a categorical
  column (language mix diversity). One (tile, key) aggregation, then a
  tile-level reduction; the identity H = log2(N) - sum(n*log2 n)/N
  makes it a single pass over per-key counts (no per-row probability
  column, no second join back for totals).
- :func:`distance_bands` — radial histogram around a point: page
  counts per fixed-width great-circle ring. A pure projection plus one
  aggregation; the band id is computed from the FIXED-POINT distance
  (floor(m * 1e6) integer), so the bucket edge behaves identically in
  Spark and DuckDB even where libm trig differs in the last ulp only
  after the 6th decimal.

Both are partial-aggregate shapes: map-side combine shrinks the
shuffle to |tiles| x |keys| (entropy) or n_bands+1 (bands) rows —
corpus-size-independent exchanges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.native import haversine_m, with_geohash
from ..functions.oracle import haversine_sql
from .text import fp6, fp6_sql

__all__ = ["tile_entropy", "tile_entropy_sql",
           "distance_bands", "distance_bands_sql"]


def tile_entropy(df: DataFrame, lat: str = "lat", lon: str = "lon",
                 precision: int = 2, key: str = "lang") -> DataFrame:
    """-> (tile, n_pages long, n_keys long, entropy double): Shannon
    entropy (bits) of the ``key`` distribution inside each geohash
    tile. entropy is fp6-rounded; 0.0 for single-key tiles."""
    pg = with_geohash(df, lat, lon, precision, out="__tile")
    per_key = (pg.groupBy(F.col("__tile").alias("tile"), F.col(key))
               .agg(F.count(F.lit(1)).alias("n")))
    return (per_key.groupBy("tile")
            .agg(F.sum("n").alias("n_pages"),
                 F.count(F.lit(1)).alias("n_keys"),
                 F.sum(F.col("n").cast("double") * F.log2("n")).alias("__s"))
            .select("tile", "n_pages", "n_keys",
                    fp6(F.log2("n_pages")
                        - F.col("__s") / F.col("n_pages").cast("double"))
                    .alias("entropy")))


def tile_entropy_sql(tagged_inner: str, key: str = "lang") -> str:
    """DuckDB twin; ``tagged_inner`` must expose ``gh`` and ``key``."""
    return (
        f"WITH pk AS (SELECT gh AS tile, {key} AS k, "
        f"CAST(count(*) AS BIGINT) AS n FROM ({tagged_inner}) GROUP BY 1, 2) "
        f"SELECT tile, CAST(sum(n) AS BIGINT) AS n_pages, "
        f"CAST(count(*) AS BIGINT) AS n_keys, "
        + fp6_sql("log2(CAST(sum(n) AS DOUBLE)) - "
                  "sum(CAST(n AS DOUBLE) * log2(n)) / sum(CAST(n AS DOUBLE))")
        + " AS entropy FROM pk GROUP BY tile")


def distance_bands(df: DataFrame, center_lat: float, center_lon: float,
                   band_m: int = 500_000, n_bands: int = 20,
                   lat: str = "lat", lon: str = "lon") -> DataFrame:
    """-> (band int, n_pages long, n_urls long): ring histogram around
    (center_lat, center_lon). band b covers [b*band_m, (b+1)*band_m);
    everything at/past n_bands*band_m lands in the overflow band
    ``n_bands``. Bucketing happens on the fixed-point distance
    (micro-meters, BIGINT) so edges are engine-portable."""
    if band_m < 1 or n_bands < 1:
        raise ValueError(f"band_m/n_bands must be >= 1, got "
                         f"{band_m}/{n_bands}")
    d = haversine_m(F.col(lat).cast("double"), F.col(lon).cast("double"),
                    F.lit(float(center_lat)), F.lit(float(center_lon)))
    fpd = F.floor(d * F.lit(1000000.0) + F.lit(0.5)).cast("long")
    band = F.least(F.floor(fpd / F.lit(float(band_m) * 1000000.0)),
                   F.lit(int(n_bands)))
    return (df.withColumn("__band", band.cast("int"))
            .groupBy(F.col("__band").alias("band"))
            .agg(F.count(F.lit(1)).alias("n_pages"),
                 F.countDistinct("url").alias("n_urls")))


def distance_bands_sql(inner: str, center_lat: float, center_lon: float,
                       band_m: int = 500_000, n_bands: int = 20,
                       lat: str = "lat", lon: str = "lon") -> str:
    """DuckDB twin; ``inner`` must expose lat/lon/url."""
    d = haversine_sql(lat, lon, repr(float(center_lat)),
                      repr(float(center_lon)))
    fpd = f"CAST(floor(({d}) * 1000000.0 + 0.5) AS BIGINT)"
    band = (f"CAST(least(floor({fpd} / {float(band_m) * 1000000.0!r}), "
            f"{int(n_bands)}) AS INT)")
    return (f"SELECT {band} AS band, CAST(count(*) AS BIGINT) AS n_pages, "
            f"CAST(count(DISTINCT url) AS BIGINT) AS n_urls "
            f"FROM ({inner}) GROUP BY 1")
