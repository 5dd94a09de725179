"""Cell-index spatial join — the engine's core dataflow operator.

Canonical usage from the reference README (/root/reference/README.md:58-86):
cover a shape, key the fact table by geohash, equi-join on the cell id,
then refine with the exact predicate. Here:

    pages -> with_geohash(p) -> JOIN coverage(shape_id, cell) -> [refine]

Physical strategy:
* coverage sets are query-side small -> ``broadcast()`` hash join, no
  shuffle of the pages table at all;
* optional *prefix join* at a coarser precision via substring (partition
  pruning analogue of src/PolygonHasher.cs:96-104 grid arithmetic);
* skewed fact keys (dense urban tiles) -> ``salted_join``: replicate
  coverage rows S ways, append a deterministic per-row salt to the fact key
  (result rows provably invariant — verified in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.native import with_geohash
from ..functions.udfs import point_in_polygon


def tag_pages(pages_df: DataFrame, precision: int, lat: str = "lat",
              lon: str = "lon", out: str = "gh") -> DataFrame:
    """Key a point table by its geohash cell (JVM-native encode)."""
    return with_geohash(pages_df, lat, lon, precision, out)


def spatial_join(pages_df: DataFrame, coverage_df: DataFrame, precision: int,
                 how: str = "inner", use_broadcast: bool = True,
                 gh_col: str = "gh") -> DataFrame:
    """Equi-join pages to exploded coverage sets on the cell id.

    ``coverage_df``: (shape id column(s), cell string) — from
    cover_polygons / cover_circles or a precomputed covering.
    ``how='left_semi'`` gives the pure containment filter.
    """
    tagged = pages_df if gh_col in pages_df.columns else \
        tag_pages(pages_df, precision, out=gh_col)
    cov = coverage_df.withColumnRenamed("cell", gh_col) \
        if "cell" in coverage_df.columns else coverage_df
    if use_broadcast:
        cov = F.broadcast(cov)
    return tagged.join(cov, on=gh_col, how=how)


def spatial_join_refined(pages_df: DataFrame, polygon_id: str, wkt: str,
                         coverage_df: DataFrame, precision: int,
                         lat: str = "lat", lon: str = "lon") -> DataFrame:
    """Coverage join + exact point-in-polygon refine.

    With an ``intersects`` covering this yields exact polygon membership:
    the covering over-approximates, the vectorized even-odd refine keeps
    only true interior points (README.md:62-72 recipe).
    """
    cov = coverage_df.filter(F.col("polygon_id") == polygon_id) \
        .select("cell") if "polygon_id" in coverage_df.columns else coverage_df
    joined = spatial_join(pages_df, cov, precision, how="left_semi")
    return joined.filter(point_in_polygon(F.col(lat), F.col(lon), wkt))


def salted_join(pages_df: DataFrame, coverage_df: DataFrame, precision: int,
                salt: int = 8, gh_col: str = "gh") -> DataFrame:
    """Skew-resistant variant for hot cells: coverage replicated x``salt``,
    fact rows salted deterministically by a hash of the row identity.

    Join-row counts are identical to the unsalted join (each fact row
    matches exactly one salted coverage replica).
    """
    tagged = pages_df if gh_col in pages_df.columns else \
        tag_pages(pages_df, precision, out=gh_col)
    first = tagged.columns[0]
    tagged = tagged.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(first)), F.lit(salt)).cast("int"))
    cov = coverage_df.withColumnRenamed("cell", gh_col)
    cov = cov.withColumn("__salt", F.explode(
        F.sequence(F.lit(0), F.lit(salt - 1)))).withColumn(
        "__salt", F.col("__salt").cast("int"))
    out = tagged.join(cov, on=[gh_col, "__salt"], how="inner")
    return out.drop("__salt")


def auto_salted_join(pages_df: DataFrame, coverage_df: DataFrame,
                     precision: int, hot_factor: float = 4.0,
                     salt: int = 16, gh_col: str = "gh") -> DataFrame:
    """Adaptive skew handling for the *shuffle* join regime (coverage too
    large to broadcast): a cheap count pre-pass finds hot cells (page
    count > hot_factor x mean), which join salted; the cold remainder
    joins un-salted. Row counts are identical to the plain join.

    This is the SURVEY §4.3 pre-pass + selective-salting design: salting
    everything multiplies the coverage x``salt`` for no benefit on the
    long tail; salting nothing leaves one reducer owning a dense urban
    tile at 100TB scale.
    """
    tagged = pages_df if gh_col in pages_df.columns else \
        tag_pages(pages_df, precision, out=gh_col)
    cov = coverage_df.withColumnRenamed("cell", gh_col) \
        if "cell" in coverage_df.columns else coverage_df

    counts = tagged.groupBy(gh_col).agg(F.count(F.lit(1)).alias("__n"))
    mean = counts.agg(F.avg("__n")).collect()[0][0] or 0.0
    hot = counts.filter(F.col("__n") > hot_factor * mean).select(gh_col)

    hot_cov = cov.join(F.broadcast(hot), on=gh_col, how="left_semi")
    cold_cov = cov.join(F.broadcast(hot), on=gh_col, how="left_anti")

    cold_out = tagged.join(cold_cov, on=gh_col, how="inner")
    hot_out = salted_join(tagged, hot_cov.withColumnRenamed(gh_col, "cell"),
                          precision, salt=salt, gh_col=gh_col)
    return cold_out.unionByName(hot_out)


def tile_stats(pages_df: DataFrame, precision: int, prefix_len: int | None = None,
               gh_col: str = "gh") -> DataFrame:
    """Per-tile page counts (partial+final hash agg, shuffle only on the
    tile key). ``prefix_len`` rolls tiles up to a coarser ancestor."""
    tagged = pages_df if gh_col in pages_df.columns else \
        tag_pages(pages_df, precision, out=gh_col)
    key = F.substring(F.col(gh_col), 1, prefix_len) if prefix_len else F.col(gh_col)
    return (tagged.groupBy(key.alias("tile"))
            .agg(F.count(F.lit(1)).alias("n_pages"),
                 F.countDistinct("url").alias("n_urls")))


def rect_overlap_join(rects_df: DataFrame, cell_deg: float = 1.0,
                      id_col: str = "rect_id") -> DataFrame:
    """Rectangle<->rectangle overlap self-join via grid-cell partitioning
    (PBSM / reference-point method) — the shape-to-shape analogue of the
    point-in-polygon join (README.md:58-86 recipe, generalized to two
    extended operands).

    Input: ``(id_col, min_lat, max_lat, min_lon, max_lon)``. Output: the
    distinct pairs ``(a_id, b_id)`` with ``a_id < b_id`` whose boxes
    intersect (closed-interval semantics: edge touching counts).

    Scale shape (100 TB design point): the naive form is an O(N^2) cross
    join; this one is ONE equi-join. Each rect is exploded onto the
    lat/lon grid cells (side ``cell_deg`` degrees) its box touches, the
    self-join is an equi-join on ``(xi, yi)``, and the exact interval
    predicate refines the candidates. A pair sharing k cells would
    surface k times; instead of a `distinct` (second full shuffle) each
    pair is emitted ONLY from the cell containing the intersection's
    lower-left corner — the classic duplicate-avoidance trick (Patel &
    DeWitt, SIGMOD'96): zero extra shuffles, exactly-once by geometry.
    ``cell_deg`` trades replication (small cells -> more copies of big
    rects) against candidate selectivity (big cells -> more false
    candidates); size it near the median rect side. Dense cells are the
    skew risk — AQE skew-join splits them at runtime; antimeridian-
    crossing boxes must be pre-split by the caller (kernels.polygon
    SplitAntimeridian semantics).
    """
    import math
    cell = float(cell_deg)
    if not math.isfinite(cell) or cell <= 0.0:
        raise ValueError(f"cell_deg must be finite and > 0, got {cell_deg!r}")
    exploded = (rects_df
                .withColumn("xi", F.explode(F.sequence(
                    F.floor(F.col("min_lon") / cell),
                    F.floor(F.col("max_lon") / cell))))
                .withColumn("yi", F.explode(F.sequence(
                    F.floor(F.col("min_lat") / cell),
                    F.floor(F.col("max_lat") / cell)))))
    a = exploded.select(F.col(id_col).alias("a_id"), "xi", "yi",
                        *[F.col(c).alias(f"a_{c}") for c in
                          ("min_lat", "max_lat", "min_lon", "max_lon")])
    b = exploded.select(F.col(id_col).alias("b_id"), "xi", "yi",
                        *[F.col(c).alias(f"b_{c}") for c in
                          ("min_lat", "max_lat", "min_lon", "max_lon")])
    ref_lon = F.greatest("a_min_lon", "b_min_lon")
    ref_lat = F.greatest("a_min_lat", "b_min_lat")
    return (a.join(b, ["xi", "yi"])
            .filter(F.col("a_id") < F.col("b_id"))
            .filter((F.col("a_min_lat") <= F.col("b_max_lat"))
                    & (F.col("b_min_lat") <= F.col("a_max_lat"))
                    & (F.col("a_min_lon") <= F.col("b_max_lon"))
                    & (F.col("b_min_lon") <= F.col("a_max_lon")))
            .filter((F.floor(ref_lon / cell) == F.col("xi"))
                    & (F.floor(ref_lat / cell) == F.col("yi")))
            .select("a_id", "b_id"))
