"""Co-location / co-travel detection: user pairs repeatedly sharing a
(geohash tile, time bucket) cell.

The contact-graph primitive of geo-temporal analytics (co-travel
analysis, contact tracing, account-correlation in anti-abuse): two
users are "co-located" when they both emit an event in the same
spatial tile during the same time bucket, and the interesting signal
is PAIRS that co-occur in many distinct (tile, bucket) cells — a
single shared cell is coincidence, ten shared cells across a day is a
relationship.

Scale shape (the quadratic trap, and the guard):

- Presence is reduced FIRST: events collapse to distinct
  (user, tile, bucket) rows before any pairing, so a chatty user
  (10^4 pings in one cell) contributes exactly one presence row per
  cell — the pair stage never sees raw event volume.
- The pair stage is a presence⋈presence self-join on (tile, bucket).
  Its output is sum over cells of k_cell·(k_cell−1)/2, quadratic in
  per-cell occupancy — a stadium cell with 10^5 users would emit
  5×10^9 pairs on its own. ``max_cell_users`` drops cells above the
  occupancy cap BEFORE the join (a broadcast-size per-cell count
  filter): crowded-venue cells carry no pairwise signal (everyone
  "co-occurs" with everyone) and are exactly the cells that blow up.
  This is the same admission-guard pattern as the simhash
  degenerate-bucket guard and ngram max_df cap in dedup.py.
- After the cap, per-cell fan-out is ≤ max_cell_users²/2 — bounded
  work per cell, and AQE's skew-join split handles residual density
  variation. The final aggregation keys on (user_a, user_b), whose
  support is bounded by the capped pair output, with map-side partial
  aggs collapsing repeated co-occurrences of the same pair.

Determinism: the time bucket is integer microsecond floor-division
(``unix_micros`` here, ``epoch_us`` in the DuckDB twin — the same
NTZ-safe convention as sessions.py/asof.py), tiles are the native
geohash encode, and every output column is an exact integer — no IEEE
anywhere, so results are bit-identical on any layout, any cluster
size, and cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.native import with_geohash
from ..functions.oracle import tagged_select_sql

__all__ = ["cotravel_pairs", "cotravel_pairs_sql",
           "place_profile_pairs", "place_profile_pairs_sql"]


def cotravel_pairs(df: DataFrame, user: str = "user_id", ts: str = "ts",
                   lat: str = "lat", lon: str = "lon", precision: int = 2,
                   bucket_s: int = 900, min_cobuckets: int = 2,
                   max_cell_users: int = 200) -> DataFrame:
    """(user_a, user_b, n_cobuckets, n_tiles) for user pairs sharing at
    least ``min_cobuckets`` distinct (tile, bucket) cells.

    ``bucket_s`` is the co-presence window in seconds; ``precision``
    the geohash tile size. Cells occupied by more than
    ``max_cell_users`` distinct users are excluded from pairing (see
    module docstring — crowd cells are quadratic noise). user_a <
    user_b in every output row.
    """
    if min_cobuckets < 1:
        raise ValueError("min_cobuckets must be >= 1")
    if max_cell_users < 2:
        raise ValueError("max_cell_users must be >= 2 (pairs need 2)")
    bucket_us = int(bucket_s) * 1_000_000
    g = with_geohash(df, lat, lon, precision)
    # floor(double-division) bucket: epoch_us < 2^53 is exactly
    # representable, and the quotient's distance to the next integer
    # (>= 1/bucket_us) exceeds half an ulp at any 32-bit bucket value,
    # so the floor is exact — and the DuckDB twin runs the SAME IEEE
    # ops, making the bucket bit-identical cross-engine.
    epoch_us = F.unix_micros(F.col(ts).cast("timestamp")).cast("double")
    presence = (g.select(
        F.col(user).alias("u"),
        F.col("gh").alias("tile"),
        F.floor(epoch_us / F.lit(float(bucket_us))).alias("bucket"))
        .distinct())
    # occupancy cap: per-(tile, bucket) distinct-user counts; presence
    # is already distinct, so count(*) == count(DISTINCT u)
    ok = (presence.groupBy("tile", "bucket")
          .agg(F.count(F.lit(1)).alias("__k"))
          .filter((F.col("__k") >= 2) & (F.col("__k") <= max_cell_users))
          .select("tile", "bucket"))
    adm = presence.join(ok, ["tile", "bucket"])
    a = adm.select("tile", "bucket", F.col("u").alias("user_a"))
    b = adm.select("tile", "bucket", F.col("u").alias("user_b"))
    pairs = a.join(b, ["tile", "bucket"]).filter(
        F.col("user_a") < F.col("user_b"))
    return (pairs.groupBy("user_a", "user_b")
            .agg(F.count(F.lit(1)).alias("n_cobuckets"),
                 F.countDistinct("tile").alias("n_tiles"))
            .filter(F.col("n_cobuckets") >= min_cobuckets))


def cotravel_pairs_sql(inner: str, user: str = "user_id", ts: str = "ts",
                       precision: int = 2, bucket_s: int = 900,
                       min_cobuckets: int = 2,
                       max_cell_users: int = 200) -> str:
    """DuckDB oracle twin of :func:`cotravel_pairs`. ``inner`` must
    expose ``lat``/``lon`` plus the user/ts columns."""
    bucket_us = int(bucket_s) * 1_000_000
    tagged = tagged_select_sql(inner, precision, keep=f"{user}, {ts}")
    return f"""
WITH t AS ({tagged}), presence AS (
  SELECT DISTINCT {user} AS u, gh AS tile,
         CAST(floor(CAST(epoch_us({ts}) AS DOUBLE) / {bucket_us})
              AS BIGINT) AS bucket
  FROM t
), ok AS (
  SELECT tile, bucket FROM presence
  GROUP BY tile, bucket
  HAVING count(*) BETWEEN 2 AND {max_cell_users}
), adm AS (
  SELECT p.u, p.tile, p.bucket
  FROM presence p JOIN ok USING (tile, bucket)
)
SELECT a.u AS user_a, b.u AS user_b,
       count(*) AS n_cobuckets,
       count(DISTINCT a.tile) AS n_tiles
FROM adm a JOIN adm b ON a.tile = b.tile AND a.bucket = b.bucket
                     AND a.u < b.u
GROUP BY a.u, b.u
HAVING count(*) >= {min_cobuckets}
"""


def place_profile_pairs(df: DataFrame, user: str = "user_id",
                        lat: str = "lat", lon: str = "lon",
                        precision: int = 3, threshold: float = 0.25,
                        max_cell_users: int = 200) -> DataFrame:
    """Similar-users-by-place-profile: pairs whose VISITED-CELL SETS
    (no time dimension) have Jaccard similarity >= ``threshold``.

    The account-correlation complement of :func:`cotravel_pairs`: two
    accounts operated from the same handful of places look alike here
    even when never online simultaneously.

    Same scale discipline as co-travel: events collapse to distinct
    (user, cell) presence first; cells with more than
    ``max_cell_users`` distinct visitors are excluded from BOTH the
    pairing and the profile sizes (ubiquitous places carry no identity
    signal and are exactly the quadratic cells) — the admission guard
    makes the semantics "Jaccard over non-crowd cells", which the
    oracle replicates. The threshold test is exact integer arithmetic:
    keep iff n_common * 10^6 >= round(threshold * 10^6) * n_union.

    -> (user_a, user_b, n_common, n_a, n_b, jaccard) with user_a <
    user_b; jaccard = n_common / (n_a + n_b - n_common), an exact
    small-integer IEEE division (identical cross-engine, no fp6
    needed).
    """
    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    if int(round(float(threshold) * 1_000_000)) < 1:
        raise ValueError(
            f"threshold {threshold} rounds to 0 in the micro-unit "
            f"integer test (minimum expressible threshold is 1e-6)")
    if max_cell_users < 2:
        raise ValueError("max_cell_users must be >= 2 (pairs need 2)")
    g = with_geohash(df, lat, lon, precision)
    presence = (g.select(F.col(user).alias("u"), F.col("gh").alias("c"))
                .distinct())
    ok = (presence.groupBy("c")
          .agg(F.count(F.lit(1)).alias("__k"))
          .filter(F.col("__k") <= max_cell_users)
          .select("c"))
    adm = presence.join(ok, "c")
    sizes = adm.groupBy("u").agg(F.count(F.lit(1)).alias("n"))
    a = adm.select("c", F.col("u").alias("user_a"))
    b = adm.select("c", F.col("u").alias("user_b"))
    common = (a.join(b, "c").filter(F.col("user_a") < F.col("user_b"))
              .groupBy("user_a", "user_b")
              .agg(F.count(F.lit(1)).alias("n_common")))
    thr_us = int(round(float(threshold) * 1_000_000))
    out = (common
           .join(sizes.select(F.col("u").alias("user_a"),
                              F.col("n").alias("n_a")), "user_a")
           .join(sizes.select(F.col("u").alias("user_b"),
                              F.col("n").alias("n_b")), "user_b"))
    union = F.col("n_a") + F.col("n_b") - F.col("n_common")
    return (out.filter(F.col("n_common") * F.lit(1_000_000)
                       >= F.lit(thr_us) * union)
            .select("user_a", "user_b", "n_common", "n_a", "n_b",
                    (F.col("n_common").cast("double")
                     / union.cast("double")).alias("jaccard")))


def place_profile_pairs_sql(tagged_inner: str, user: str = "user_id",
                            threshold: float = 0.25,
                            max_cell_users: int = 200) -> str:
    """DuckDB twin — INDEPENDENT list-algebra formulation: per-user
    sorted cell lists, quadratic user-pair cross join, list
    intersection length (no inverted index anywhere). ``tagged_inner``
    must expose ``gh`` and the user column."""
    thr_us = int(round(float(threshold) * 1_000_000))
    return (
        f"WITH pres AS (SELECT DISTINCT {user} AS u, gh AS c "
        f"FROM ({tagged_inner})), "
        f"ok AS (SELECT c FROM pres GROUP BY c "
        f"HAVING count(*) <= {int(max_cell_users)}), "
        f"adm AS (SELECT u, pres.c FROM pres JOIN ok ON pres.c = ok.c), "
        f"prof AS (SELECT u, list_sort(list(c)) AS cells, "
        f"CAST(count(*) AS BIGINT) AS n FROM adm GROUP BY u) "
        f"SELECT p1.u AS user_a, p2.u AS user_b, "
        f"CAST(len(list_intersect(p1.cells, p2.cells)) AS BIGINT) "
        f"AS n_common, p1.n AS n_a, p2.n AS n_b, "
        f"CAST(len(list_intersect(p1.cells, p2.cells)) AS DOUBLE) "
        f"/ (p1.n + p2.n - len(list_intersect(p1.cells, p2.cells))) "
        f"AS jaccard "
        f"FROM prof p1 JOIN prof p2 ON p1.u < p2.u "
        f"WHERE len(list_intersect(p1.cells, p2.cells)) * 1000000 "
        f">= {thr_us} * (p1.n + p2.n - len(list_intersect(p1.cells, "
        f"p2.cells)))")
