"""Spatial hotspot detection: Getis-Ord Gi* z-scores over geohash tiles.

The classic local-statistic layer of tile analytics, one step past focal
smoothing (``q_tile_smooth``): instead of reporting the raw 3x3
neighborhood sum, score how anomalous that sum is against the global
distribution of tile values. Binary queen-contiguity weights (the 8
geohash neighbors plus self), restricted to tiles WITH data — the
standard formulation for sparse grids, where empty cells are outside
the study area rather than zeros.

For tile i with W_i = |(neighbors(i) + {i}) restricted to occupied|:

    Gi* = (sum_j w_ij x_j  -  xbar * W_i)
          / ( S * sqrt((n * W_i - W_i^2) / (n - 1)) )

with n = occupied-tile count, xbar = sum(x)/n, S = sqrt(sum(x^2)/n -
xbar^2)  (Getis & Ord 1995, the Gi* form with self-inclusion).

Scale shape (100 TB): the neighborhood expansion runs on the
AGGREGATED tile table (|tiles| rows, never the corpus), so the cost is
independent of page count; the global moments are ONE row computed from
exact integer sums (count/sum/sum-of-squares of bigint tile counts —
order-independent, hence engine-portable) and reach the plan as a
broadcast, never a driver collect; the focal join is tile-keyed. All
double math downstream of the exact integer moments is a fixed IEEE
expression tree mirrored verbatim by the DuckDB oracle twin, with the
final z fp6-gated.

Caveat: S = 0 (all tiles equal) or W_i = n (every tile adjacent to
every other, only possible for <= 9-cell study areas) make the
denominator 0 and Gi* undefined — callers feed real tile grids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.udfs import gh_neighbors
from .text import fp6, fp6_sql

__all__ = ["focal_hotspots", "focal_hotspots_sql"]


def focal_hotspots(tiles: DataFrame, cell_col: str = "gh",
                   value_col: str = "n",
                   hot_z: float = 2.0) -> DataFrame:
    """Gi* z-score per occupied tile; ``hot`` = 1 where gi_z >= hot_z.

    ``tiles`` is an aggregated (cell, value) table — e.g. the output of
    a per-tile count — with integral values (exact global moments).
    Output: (cell_col, value_col, wx = neighborhood sum, w = occupied
    neighborhood size incl. self, gi_z fp6, hot).
    """
    t = tiles.select(F.col(cell_col).alias("t"),
                     F.col(value_col).cast("long").alias("x"))
    nb = t.select(
        "t",
        F.explode(F.array_union(gh_neighbors(F.col("t")),
                                F.array(F.col("t")))).alias("s"))
    focal = (nb.join(t.select(F.col("t").alias("s"),
                              F.col("x").alias("xs")), "s")
             .groupBy("t").agg(F.sum("xs").alias("wx"),
                               F.count(F.lit(1)).alias("w")))
    glob = t.agg(F.count(F.lit(1)).alias("nt"),
                 F.sum("x").alias("sx"),
                 F.sum(F.col("x") * F.col("x")).alias("sxx"))
    j = t.join(focal, "t").crossJoin(F.broadcast(glob))
    # fixed IEEE expression tree — mirrored token-for-token in the twin
    mean = F.col("sx") / F.col("nt")
    s = F.sqrt(F.col("sxx") / F.col("nt") - mean * mean)
    denom = s * F.sqrt(
        (F.col("nt") * F.col("w") - F.col("w") * F.col("w")).cast("double")
        / (F.col("nt") - F.lit(1)))
    z = fp6(((F.col("wx") - mean * F.col("w")) / denom).cast("double"))
    return (j.select(F.col("t").alias(cell_col),
                     F.col("x").alias(value_col),
                     "wx", "w", z.alias("gi_z"))
            .withColumn("hot", (F.col("gi_z") >= F.lit(hot_z)).cast("int")))


def focal_hotspots_sql(tiles_cte: str, pairs_cte: str,
                       cell_col: str = "gh", value_col: str = "n",
                       hot_z: float = 2.0) -> str:
    """DuckDB oracle twin of focal_hotspots.

    ``tiles_cte`` must yield (gh, n) occupied tiles; ``pairs_cte`` must
    yield DISTINCT (t, s) = tile -> {neighbors + self} pairs (the same
    expansion the tile_smooth oracle builds). Column aliases follow
    cell_col/value_col.
    """
    mean = "(CAST(sx AS DOUBLE) / nt)"
    sdev = f"sqrt(CAST(sxx AS DOUBLE) / nt - {mean} * {mean})"
    denom = (f"{sdev} * sqrt(CAST(nt * w - w * w AS DOUBLE) "
             f"/ (nt - 1))")
    zraw = f"(CAST(wx AS DOUBLE) - {mean} * w) / ({denom})"
    z = fp6_sql(zraw)
    return f"""
WITH tiles AS ({tiles_cte}), pairs AS ({pairs_cte}),
focal AS (
  SELECT p.t, CAST(sum(c.n) AS BIGINT) AS wx,
         CAST(count(*) AS BIGINT) AS w
  FROM pairs p JOIN tiles c ON c.gh = p.s GROUP BY p.t
), gstats AS (
  SELECT CAST(count(*) AS BIGINT) AS nt, CAST(sum(n) AS BIGINT) AS sx,
         CAST(sum(n * n) AS BIGINT) AS sxx FROM tiles
)
SELECT tiles.gh AS {cell_col}, CAST(tiles.n AS BIGINT) AS {value_col},
       wx, w, {z} AS gi_z,
       CAST({z} >= {hot_z} AS INT) AS hot
FROM tiles JOIN focal ON focal.t = tiles.gh CROSS JOIN gstats
"""
