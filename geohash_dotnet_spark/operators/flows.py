"""Origin–destination tile flows: movement analytics over an event
stream.

The OD-matrix primitive of geo-temporal analytics: order each user's
events in time, take consecutive-event cell transitions, and aggregate
them into a (from_tile, to_tile) flow matrix with move counts and
distinct-mover counts — commute matrices, migration flows, taxi OD
studies all reduce to this shape.

Scale shape: one user-keyed exchange feeds the lag window (users are
the natural partition; a hot user is impossible by construction — a
human emits bounded events), self-transitions are dropped BEFORE the
flow aggregation, and the final groupBy keys on (from, to) whose
cardinality is bounded by tiles², not events — partial aggs collapse
the event volume map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.native import with_geohash
from ..functions.oracle import tagged_select_sql

__all__ = ["tile_flows", "tile_flows_sql"]


def tile_flows(df: DataFrame, user: str = "user_id", ts: str = "ts",
               lat: str = "lat", lon: str = "lon", precision: int = 2,
               tiebreak: str | None = None) -> DataFrame:
    """(from_tile, to_tile, n_moves, n_users) for consecutive-event
    geohash transitions per user. ``tiebreak`` orders same-timestamp
    events deterministically (pass the event id when timestamps can
    collide — a window order that ties is a nondeterministic flow)."""
    g = with_geohash(df, lat, lon, precision)
    order = [F.col(ts).asc()]
    if tiebreak is not None:
        order.append(F.col(tiebreak).asc())
    w = Window.partitionBy(user).orderBy(*order)
    g = g.withColumn("__prev", F.lag("gh").over(w))
    moves = g.filter(F.col("__prev").isNotNull()
                     & (F.col("__prev") != F.col("gh")))
    return (moves.groupBy(F.col("__prev").alias("from_tile"),
                          F.col("gh").alias("to_tile"))
            .agg(F.count(F.lit(1)).alias("n_moves"),
                 F.countDistinct(user).alias("n_users")))


def tile_flows_sql(inner: str, user: str = "user_id", ts: str = "ts",
                   precision: int = 2,
                   tiebreak: str | None = None) -> str:
    """DuckDB oracle twin of :func:`tile_flows`. ``inner`` must expose
    ``lat``/``lon`` plus the user/ts(/tiebreak) columns."""
    keep = f"{user}, {ts}" + (f", {tiebreak}" if tiebreak else "")
    tagged = tagged_select_sql(inner, precision, keep=keep)
    order = f"{ts}" + (f", {tiebreak}" if tiebreak else "")
    return f"""
WITH t AS ({tagged}), l AS (
  SELECT {user}, gh,
         lag(gh) OVER (PARTITION BY {user} ORDER BY {order}) AS prev
  FROM t
)
SELECT prev AS from_tile, gh AS to_tile,
       count(*) AS n_moves, count(DISTINCT {user}) AS n_users
FROM l WHERE prev IS NOT NULL AND prev <> gh
GROUP BY prev, gh
"""
