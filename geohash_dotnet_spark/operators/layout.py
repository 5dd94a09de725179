"""Hilbert-curve data layout: a space-filling-curve index whose
contiguous ranges are spatially compact — the layout primitive for
range-pruned scans at 100 TB.

Geohash IS a Z-order (Morton) curve: bit-interleaved lat/lon, so
prefix ranges are cells. Z-order however takes long diagonal jumps
(cell 0b0111 -> 0b1000 teleports across the map), so a contiguous
Z-range can straddle distant regions. The Hilbert curve visits every
cell of the 2^k x 2^k grid exactly once moving only between
edge-adjacent cells — contiguous Hilbert ranges are connected blobs.
Writing a table sorted/range-partitioned by Hilbert index gives
min/max-pruned spatial range scans with strictly better locality than
geohash-prefix layout (DataBricks Z-ORDER / Delta liquid clustering
rationale; here with the curve one better).

Everything is exact integer bit arithmetic (the classic xy2d state
machine, unrolled ``order`` times into staged JVM column expressions —
no UDFs), so the DuckDB twin matches bit-for-bit.

Scale notes: the index is a pure projection (zero shuffles, zero
joins, whole-stage codegen); the shard histogram below is one
partial+final aggregation. ``repartitionByRange(out)`` on the index
column is the write-side layout hook.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.native import (_grid_index_col, clamp_latitude,
                                normalize_longitude)
from ..functions.oracle import clamp_lat_sql, grid_index_sql, normalize_lon_sql

__all__ = ["with_hilbert", "hilbert_shards", "hilbert_select_sql",
           "hilbert_shards_sql"]


def with_hilbert(df: DataFrame, lat: str = "lat", lon: str = "lon",
                 order: int = 8, out: str = "hd") -> DataFrame:
    """Add the Hilbert index ``out`` (long, in [0, 4^order)) of each
    point on the 2^order x 2^order grid.

    Classic xy2d: walk bit-planes MSB-first, accumulate the quadrant
    digit, rotate/reflect the frame (Hilbert 1891; the bit formulation
    follows the public-domain Wikipedia reference implementation).
    Each iteration is staged as its own Project so the expression tree
    stays linear in ``order`` (same staging trick as with_geohash).
    """
    if not (1 <= order <= 16):
        raise ValueError(f"order must be in [1, 16], got {order}")
    n = 1 << order
    df = df.withColumns({
        "__hlat": clamp_latitude(F.col(lat).cast("double")),
        "__hlon": normalize_longitude(F.col(lon).cast("double")),
    }).withColumns({
        "__hy": _grid_index_col(F.col("__hlat"), -90.0, 180.0 / n, n),
        "__hx": _grid_index_col(F.col("__hlon"), -180.0, 360.0 / n, n),
        "__hd": F.lit(0).cast("long"),
    })
    for i in range(order - 1, -1, -1):
        s = 1 << i
        rx = F.shiftright(F.col("__hx"), i).bitwiseAND(F.lit(1))
        ry = F.shiftright(F.col("__hy"), i).bitwiseAND(F.lit(1))
        d2 = (F.col("__hd")
              + F.lit(s * s).cast("long")
              * ((rx * F.lit(3)).bitwiseXOR(ry)).cast("long"))
        # rot: if ry==0 { if rx==1 reflect both; swap x,y }
        fx = F.when(rx == F.lit(1),
                    F.lit(n - 1) - F.col("__hx")).otherwise(F.col("__hx"))
        fy = F.when(rx == F.lit(1),
                    F.lit(n - 1) - F.col("__hy")).otherwise(F.col("__hy"))
        df = df.withColumns({
            "__hd": d2,
            "__hx": F.when(ry == F.lit(0), fy).otherwise(F.col("__hx")),
            "__hy": F.when(ry == F.lit(0), fx).otherwise(F.col("__hy")),
        })
    return (df.withColumn(out, F.col("__hd"))
            .drop("__hlat", "__hlon", "__hx", "__hy", "__hd"))


def hilbert_shards(df: DataFrame, lat: str = "lat", lon: str = "lon",
                   order: int = 8, n_shards: int = 64) -> DataFrame:
    """-> (shard int, n_pages long, n_cells long): the population of
    each of ``n_shards`` equal contiguous Hilbert-index ranges — what a
    range-partitioned writer would put in each file. n_cells counts
    distinct grid cells (shard spatial footprint).

    shard = floor(hd * n_shards / 4^order): exact, because
    hd * n_shards < 2^53 for order <= 16 ranges checked here and the
    divisor is a power of two.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    if order > 20 or (4 ** order) * n_shards >= 2 ** 53:
        raise ValueError("order/n_shards too large for exact double math")
    total = 4 ** order
    hd = with_hilbert(df, lat, lon, order, out="__hd_s")
    shard = F.floor(F.col("__hd_s") * F.lit(n_shards) / F.lit(total))
    return (hd.groupBy(shard.cast("int").alias("shard"))
            .agg(F.count(F.lit(1)).alias("n_pages"),
                 F.countDistinct("__hd_s").alias("n_cells")))


def hilbert_select_sql(inner_sql: str, order: int = 8, lat: str = "lat",
                       lon: str = "lon", out: str = "hd",
                       keep: str = "*") -> str:
    """DuckDB twin of :func:`with_hilbert` — same xy2d bit state
    machine unrolled into chained subqueries."""
    n = 1 << order
    s0 = (f"SELECT {keep}, {clamp_lat_sql(lat)} AS __hlat, "
          f"{normalize_lon_sql(lon)} AS __hlon FROM ({inner_sql})")
    # every stage emits FRESH column names (suffix = bit plane) so the
    # SELECT-*-chained subqueries never collide
    y0, x0, d0 = f"__hy{order}", f"__hx{order}", f"__hd{order}"
    s1 = (f"SELECT {keep}, "
          f"{grid_index_sql('__hlat', -90.0, 180.0 / n, n)} AS {y0}, "
          f"{grid_index_sql('__hlon', -180.0, 360.0 / n, n)} AS {x0}, "
          f"CAST(0 AS BIGINT) AS {d0} FROM ({s0})")
    cur, px, py, pd = s1, x0, y0, d0
    for i in range(order - 1, -1, -1):
        s = 1 << i
        nx, ny, nd = f"__hx{i}", f"__hy{i}", f"__hd{i}"
        rx = f"(({px} >> {i}) & 1)"
        ry = f"(({py} >> {i}) & 1)"
        fx = f"CASE WHEN {rx} = 1 THEN {n - 1} - {px} ELSE {px} END"
        fy = f"CASE WHEN {rx} = 1 THEN {n - 1} - {py} ELSE {py} END"
        cur = (f"SELECT {keep}, "
               f"{pd} + {s * s} * CAST(xor(3 * {rx}, {ry}) AS BIGINT) "
               f"AS {nd}, "
               f"CASE WHEN {ry} = 0 THEN {fy} ELSE {px} END AS {nx}, "
               f"CASE WHEN {ry} = 0 THEN {fx} ELSE {py} END AS {ny} "
               f"FROM ({cur})")
        px, py, pd = nx, ny, nd
    return f"SELECT {keep}, {pd} AS {out} FROM ({cur})"


def hilbert_shards_sql(inner_sql: str, order: int = 8, lat: str = "lat",
                       lon: str = "lon", n_shards: int = 64) -> str:
    """DuckDB twin of :func:`hilbert_shards`."""
    total = 4 ** order
    hsql = hilbert_select_sql(inner_sql, order, lat, lon, out="hd",
                              keep="*")
    return (f"SELECT CAST(floor(hd * {n_shards} / {total}.0) AS INT) "
            f"AS shard, CAST(count(*) AS BIGINT) AS n_pages, "
            f"CAST(count(DISTINCT hd) AS BIGINT) AS n_cells "
            f"FROM ({hsql}) GROUP BY 1")
