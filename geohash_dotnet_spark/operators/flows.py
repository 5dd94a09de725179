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

__all__ = ["tile_flows", "tile_flows_sql", "user_mobility", "user_mobility_sql"]


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


# ---------------------------------------------------------------------------
# Per-user mobility: centroid + radius of gyration
# ---------------------------------------------------------------------------

_Q = 10000  # 1e-4 deg quantum (~11 m) — keeps sums-of-squares in BIGINT


def user_mobility(df: DataFrame, user: str = "user_id",
                  lat: str = "lat", lon: str = "lon") -> DataFrame:
    """Per-user activity extent: event count, centroid, and radius of
    gyration (degree-space RMS distance from the centroid — the
    González-et-al human-mobility statistic; multiply by ~111 km/deg
    for a magnitude in metres at mid latitudes).

    One user-keyed aggregation over integer-quantized coordinates
    (1e-4-degree quanta): sums and sums-of-squares are exact BIGINTs
    (safe to ~10^7 events per user before the square-sum nears 2^63),
    so centroid and rog come out of ONE shared IEEE tree —
    deterministic on any layout, any cluster size, bit-identical in
    DuckDB (sqrt is IEEE-correctly-rounded, unlike ln/exp). The
    E[x^2] - E[x]^2 form can go epsilon-negative under cancellation;
    both engines clamp at zero before the sqrt.
    """
    la = F.floor(F.col(lat) * _Q + F.lit(0.5)).cast("long")
    lo = F.floor(F.col(lon) * _Q + F.lit(0.5)).cast("long")
    agg = (df.groupBy(user)
           .agg(F.count(F.lit(1)).alias("n_events"),
                F.sum(la).alias("sl"), F.sum(lo).alias("so"),
                F.sum(la * la).alias("ssl"),
                F.sum(lo * lo).alias("sso")))
    nq = (F.col("n_events") * F.lit(_Q)).cast("double")
    nqq = (F.col("n_events") * F.lit(_Q * _Q)).cast("double")
    cl = F.col("sl").cast("double") / nq
    co = F.col("so").cast("double") / nq
    var = ((F.col("ssl").cast("double") / nqq - cl * cl)
           + (F.col("sso").cast("double") / nqq - co * co))
    return agg.select(
        user, "n_events", cl.alias("c_lat"), co.alias("c_lon"),
        F.sqrt(F.greatest(var, F.lit(0.0))).alias("rog_deg"))


def user_mobility_sql(inner: str, user: str = "user_id",
                      lat: str = "lat", lon: str = "lon") -> str:
    """DuckDB oracle twin of :func:`user_mobility`."""
    la = f"CAST(floor(({lat}) * {_Q} + 0.5e0) AS BIGINT)"
    lo = f"CAST(floor(({lon}) * {_Q} + 0.5e0) AS BIGINT)"
    return f"""
WITH q AS (
  SELECT {user}, {la} AS la, {lo} AS lo FROM {inner}
), a AS (
  SELECT {user}, count(*) AS n_events,
         CAST(sum(la) AS BIGINT) AS sl, CAST(sum(lo) AS BIGINT) AS so,
         CAST(sum(la * la) AS BIGINT) AS ssl,
         CAST(sum(lo * lo) AS BIGINT) AS sso
  FROM q GROUP BY {user}
)
SELECT {user}, n_events,
       CAST(sl AS DOUBLE) / CAST(n_events * {_Q} AS DOUBLE) AS c_lat,
       CAST(so AS DOUBLE) / CAST(n_events * {_Q} AS DOUBLE) AS c_lon,
       sqrt(greatest(
         ((CAST(ssl AS DOUBLE) / CAST(n_events * {_Q * _Q} AS DOUBLE)
           - (CAST(sl AS DOUBLE) / CAST(n_events * {_Q} AS DOUBLE))
             * (CAST(sl AS DOUBLE) / CAST(n_events * {_Q} AS DOUBLE)))
          + (CAST(sso AS DOUBLE) / CAST(n_events * {_Q * _Q} AS DOUBLE)
           - (CAST(so AS DOUBLE) / CAST(n_events * {_Q} AS DOUBLE))
             * (CAST(so AS DOUBLE) / CAST(n_events * {_Q} AS DOUBLE)))),
         0.0e0)) AS rog_deg
FROM a
"""
