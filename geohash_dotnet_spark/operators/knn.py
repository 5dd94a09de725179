"""k-nearest-neighbors via geohash cell-ring expansion + window top-k.

The reference README positions the cell index as the candidate pre-filter
for distance queries (/root/reference/README.md:58-72); kNN composes that
with iterative radius doubling:

round r: cover a circle of radius R*2^r around each query (driver-side
circle kernel, cells broadcast) -> equi-join candidate points ->
row_number() over (partition by query order by exact haversine) <= k.
A query is *settled* when it has >= k candidates whose k-th distance is
within the covered radius (the covering guarantees no closer point exists
outside it). Unsettled queries escalate to the next round.

Queries are a small table (collected to the driver); the points table is
only ever touched by broadcast semi-joins — no shuffle of the big side.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.native import haversine_m, with_geohash
from ..kernels.circle import cover_circle
from ..kernels.distance import precision_for_radius


def knn_join(spark: SparkSession, points_df: DataFrame, queries: pd.DataFrame,
             k: int, initial_radius_m: float = 2_000.0, max_rounds: int = 10,
             lat: str = "lat", lon: str = "lon", gh_col: str = "gh",
             precision: int | None = None) -> DataFrame:
    """queries: pandas DataFrame (query_id, lat, lon). Returns a DataFrame
    (query_id, rank, dist_m, + point columns) with rank 1..k by distance."""
    remaining = queries.copy()
    results: list[DataFrame] = []

    for r in range(max_rounds):
        radius = initial_radius_m * (2 ** r)
        p = precision or precision_for_radius(radius)
        p = max(min(p, 9), 2)

        cov_rows = []
        for q in remaining.itertuples(index=False):
            cells = cover_circle(float(q.lat), float(q.lon), radius, p, "intersects")
            cov_rows.append(pd.DataFrame({
                "query_id": q.query_id, "q_lat": q.lat, "q_lon": q.lon,
                gh_col: cells}))
        cov = spark.createDataFrame(pd.concat(cov_rows, ignore_index=True))

        tagged = points_df if gh_col in points_df.columns else \
            with_geohash(points_df, lat, lon, p, out=gh_col)
        cand = tagged.join(F.broadcast(cov), on=gh_col, how="inner")
        cand = cand.withColumn(
            "dist_m", haversine_m(F.col("q_lat"), F.col("q_lon"),
                                  F.col(lat), F.col(lon)))
        w = Window.partitionBy("query_id").orderBy(F.col("dist_m").asc())
        topk = (cand.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k))

        # settle check: k-th distance must be within the guaranteed radius
        kth = (topk.groupBy("query_id")
               .agg(F.count(F.lit(1)).alias("n"), F.max("dist_m").alias("kth"))
               .collect())
        settled_ids = {row["query_id"] for row in kth
                       if row["n"] >= k and row["kth"] <= radius}
        if r == max_rounds - 1:
            settled_ids = set(remaining.query_id)
        if settled_ids:
            results.append(topk.filter(F.col("query_id").isin(list(settled_ids)))
                           .drop("q_lat", "q_lon", gh_col))
        remaining = remaining[~remaining.query_id.isin(settled_ids)]
        if remaining.empty:
            break

    if not results:
        return spark.createDataFrame([], "query_id string, rank int, dist_m double")
    out = results[0]
    for other in results[1:]:
        out = out.unionByName(other)
    return out
