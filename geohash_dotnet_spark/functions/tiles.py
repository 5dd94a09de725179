"""Web-Mercator XYZ tiles + Bing-style quadkeys — a second cell-index
scheme next to geohash (the north rule asks for "H3/S2-style cell
indexes"; XYZ/quadkey is the slippy-map standard: z/x/y integer tiles,
quadkey = the z-digit base-4 string whose digit i interleaves bit i of x
and y, so parent/child containment is string-prefix containment, exactly
like geohash but on the Web-Mercator projection).

Two tile-row (y) implementations, same tiling:

* ``tile_y`` — closed-form Mercator ``ln(tan/…)``: one codegen-friendly
  expression, the production path at any zoom.
* ``tile_y_portable`` — counts how many of the 2^z - 1 internal tile
  boundary latitudes (precomputed once, driver-side, as exact double
  literals) lie at or above the point. Pure comparisons, so DuckDB
  replays it bit-for-bit — ``ln`` differs by ≤1 ulp between Java and
  libm, which could flip a ``floor`` at a tile edge; a literal-table
  comparison cannot. Used by the driver-verified key; the closed form is
  asserted equal to it on the test corpora in pytest. The literal table
  is O(2^z) — fine to z≈12; production at deeper zooms uses the closed
  form (documented 1-ulp edge caveat).

x is exact in both engines unconditionally: ``floor((lon+180)/360·2^z)``
is +, /, · and floor — IEEE-defined, identical everywhere.

Tie rule: a point exactly on an internal boundary latitude belongs to
the tile BELOW it (count uses ``>=``), matching the canonical slippy
``floor`` at exactly-representable boundaries (e.g. lat=0).
"""

from __future__ import annotations

import math
from functools import lru_cache

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MAX_MERCATOR_LAT = math.degrees(math.atan(math.sinh(math.pi)))  # 85.0511...


@lru_cache(maxsize=None)
def tile_lat_bounds(z: int) -> tuple[float, ...]:
    """The 2^z + 1 tile-row boundary latitudes at zoom z, descending
    (index y = north edge of tile row y)."""
    n = 1 << z
    return tuple(
        math.degrees(math.atan(math.sinh(math.pi * (1 - 2 * k / n))))
        for k in range(n + 1))


def tile_x(lon: Column, z: int) -> Column:
    """Tile column from longitude — exact linear math, engine-portable."""
    n = 1 << z
    raw = F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(n)))
    return F.greatest(F.lit(0), F.least(F.lit(n - 1), raw)).cast("long")


def tile_y(lat: Column, z: int) -> Column:
    """Tile row via the closed-form Mercator projection (production path;
    ln carries a ≤1-ulp cross-engine edge caveat — see module doc)."""
    n = 1 << z
    # clamp to the Mercator domain first: |lat| -> 90 makes (1 - sin)
    # a zero divisor (ANSI divide-by-zero); the poles live in the edge
    # tile rows anyway
    lat = F.greatest(F.lit(-MAX_MERCATOR_LAT),
                     F.least(F.lit(MAX_MERCATOR_LAT), lat))
    lat_rad = F.radians(lat)
    frac = (F.lit(1.0)
            - F.log((F.lit(1.0) + F.sin(lat_rad))
                    / (F.lit(1.0) - F.sin(lat_rad))) / F.lit(2.0 * math.pi)
            ) / F.lit(2.0)
    raw = F.floor(frac * F.lit(float(n)))
    return F.greatest(F.lit(0), F.least(F.lit(n - 1), raw)).cast("long")


def tile_y_portable(lat: Column, z: int) -> Column:
    """Tile row by counting boundary latitudes above the point — exact
    cross-engine (pure double comparisons against shared literals)."""
    bounds = tile_lat_bounds(z)[1:-1]  # internal boundaries only
    arr = F.array(*[F.lit(b) for b in bounds])
    return F.size(F.filter(arr, lambda b: b >= lat)).cast("long")


def quadkey(x: Column, y: Column, z: int) -> Column:
    """z/x/y -> the z-character base-4 quadkey (digit = y-bit·2 + x-bit,
    most significant level first). Constant-unrolled integer bit math."""
    digits = []
    for i in range(z - 1, -1, -1):
        d = (F.shiftright(x, i).bitwiseAND(F.lit(1))
             + F.shiftright(y, i).bitwiseAND(F.lit(1)) * F.lit(2))
        digits.append(d.cast("string"))
    return F.concat(*digits)


def quadkey_to_xy(qk: Column) -> tuple[Column, Column, Column]:
    """quadkey string -> (x, y, z) columns (z = length)."""
    z = F.length(qk).cast("int")
    idx = F.sequence(F.lit(1), z)
    x = F.aggregate(
        idx, F.lit(0).cast("long"),
        lambda acc, i: (acc * 2 + (F.ascii(F.substr(qk, i, F.lit(1))) - 48)
                        .bitwiseAND(F.lit(1)).cast("long")).cast("long"))
    y = F.aggregate(
        idx, F.lit(0).cast("long"),
        lambda acc, i: (acc * 2
                        + F.shiftright(F.ascii(F.substr(qk, i, F.lit(1)))
                                       - 48, 1)
                        .bitwiseAND(F.lit(1)).cast("long")).cast("long"))
    return x, y, z.cast("long")


def tile_bounds(x: Column, y: Column, z: int) -> Column:
    """struct(w, s, e, n) degree bbox of tile (x, y) at zoom z; the
    north/south edges come from the same literal boundary table the
    portable encoder uses, so bbox and assignment agree exactly."""
    n_tiles = 1 << z
    lats = F.array(*[F.lit(b) for b in tile_lat_bounds(z)])
    w = x.cast("double") / F.lit(float(n_tiles)) * F.lit(360.0) - F.lit(180.0)
    e = (x + 1).cast("double") / F.lit(float(n_tiles)) * F.lit(360.0) \
        - F.lit(180.0)
    north = F.element_at(lats, (y + 1).cast("int"))
    south = F.element_at(lats, (y + 2).cast("int"))
    return F.struct(w.alias("w"), south.alias("s"), e.alias("e"),
                    north.alias("n"))


def with_tiles(df: DataFrame, lat: str = "lat", lon: str = "lon",
               z: int = 8, portable: bool = True) -> DataFrame:
    """Add z, x, y, quadkey columns for each point row."""
    ycol = tile_y_portable(F.col(lat), z) if portable \
        else tile_y(F.col(lat), z)
    out = (df.withColumn("z", F.lit(z).cast("long"))
           .withColumn("x", tile_x(F.col(lon), z))
           .withColumn("y", ycol))
    return out.withColumn("quadkey", quadkey(F.col("x"), F.col("y"), z))


# ---------------------------------------------------------------------------
# DuckDB oracle twins
# ---------------------------------------------------------------------------

def tile_x_sql(lon: str, z: int) -> str:
    n = 1 << z
    raw = f"floor((({lon}) + 180.0) / 360.0 * {float(n)!r})"
    return f"CAST(greatest(0, least({n - 1}, {raw})) AS BIGINT)"


def tile_y_portable_sql(lat: str, z: int) -> str:
    bounds = tile_lat_bounds(z)[1:-1]
    lits = ", ".join(repr(b) for b in bounds)
    return (f"CAST(len(list_filter([{lits}], "
            f"__b -> __b >= ({lat}))) AS BIGINT)")


def quadkey_sql(x: str, y: str, z: int) -> str:
    parts = [
        f"CAST(((({x}) >> {i}) & 1) + 2 * ((({y}) >> {i}) & 1) AS VARCHAR)"
        for i in range(z - 1, -1, -1)]
    return " || ".join(parts)
