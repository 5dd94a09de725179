"""JVM-native Spark column functions (whole-stage-codegen friendly).

The hot-path geohash encode is expressed entirely in built-in Spark SQL
arithmetic — no Python/Arrow in the data plane. It implements the same
exact integer formulation as kernels/geohash.py (floor-division grid index
plus a one-round exact fix-up against dyadic cell boundaries), which is
provably identical to the reference's midpoint-halving loop
(/root/reference/src/Geohasher.cs:76-102); cross-checked against the NumPy
kernel in tests/test_functions_spark.py.

Built as *staged selects* (``with_geohash``) so each intermediate is an
attribute reference, keeping the Catalyst expression tree small.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"
_VALID_RE = "^[0-9bcdefghjkmnpqrstuvwxyzBCDEFGHJKMNPQRSTUVWXYZ]{1,12}$"

EARTH_RADIUS_M = 6_371_008.8


def normalize_longitude(lng: Column) -> Column:
    """Wrap into [-180, 180) (src/Geohasher.cs:213-219)."""
    return F.pmod(lng + F.lit(180.0), F.lit(360.0)) - F.lit(180.0)


def clamp_latitude(lat: Column) -> Column:
    return F.greatest(F.least(lat, F.lit(90.0)), F.lit(-90.0))


def _grid_index_col(x: Column, lo: float, step: float, n: int) -> Column:
    """Exact grid index with dyadic-boundary fix-up (kernel _grid_index twin)."""
    i0 = F.least(
        F.greatest(F.floor((x - F.lit(lo)) / F.lit(step)).cast("long"), F.lit(0)),
        F.lit(n - 1),
    )
    i1 = i0 - F.when(x < F.lit(lo) + i0 * F.lit(step), F.lit(1)).otherwise(F.lit(0))
    i2 = i1 + F.when(
        (i1 < F.lit(n - 1)) & (x >= F.lit(lo) + (i1 + F.lit(1)) * F.lit(step)),
        F.lit(1),
    ).otherwise(F.lit(0))
    return F.least(F.greatest(i2, F.lit(0)), F.lit(n - 1))


def _char_from_bits(lat_i: Column, lng_i: Column, precision: int, c: int,
                    n_lat_bits: int, n_lng_bits: int) -> Column:
    """Base-32 char c (0-indexed from the left) of the geohash.

    Stream bit j (0 = MSB): even j -> lon bit (n_lng_bits-1 - j//2),
    odd j -> lat bit (n_lat_bits-1 - (j-1)//2) — lon-first interleave
    (src/Geohasher.cs:76-94).
    """
    digit = F.lit(0)
    for k in range(5):
        j = 5 * c + k
        if j % 2 == 0:
            src, bit = lng_i, n_lng_bits - 1 - j // 2
        else:
            src, bit = lat_i, n_lat_bits - 1 - (j - 1) // 2
        digit = digit + F.shiftright(src, bit).bitwiseAND(F.lit(1)) * F.lit(1 << (4 - k))
    return _b32_char(digit)


def _b32_char(digit: Column) -> Column:
    # substr(alphabet, digit+1, 1) — 1-based, same in Spark and DuckDB
    return F.substr(F.lit(BASE32), (digit + F.lit(1)).cast("int"), F.lit(1))


def with_geohash(df: DataFrame, lat: str, lon: str, precision: int,
                 out: str = "gh") -> DataFrame:
    """Add a geohash column computed fully JVM-side (staged selects)."""
    total = 5 * precision
    n_lat_bits = total // 2
    n_lng_bits = (total + 1) // 2
    lat_step = 180.0 / (1 << n_lat_bits)
    lng_step = 360.0 / (1 << n_lng_bits)

    t_lat, t_lon, t_lat_i, t_lng_i = "__gh_lat", "__gh_lon", "__gh_lat_i", "__gh_lng_i"
    staged = df.withColumns({
        t_lat: clamp_latitude(F.col(lat).cast("double")),
        t_lon: normalize_longitude(F.col(lon).cast("double")),
    }).withColumns({
        t_lat_i: _grid_index_col(F.col(t_lat), -90.0, lat_step, 1 << n_lat_bits),
        t_lng_i: _grid_index_col(F.col(t_lon), -180.0, lng_step, 1 << n_lng_bits),
    })
    chars = [
        _char_from_bits(F.col(t_lat_i), F.col(t_lng_i), precision, c,
                        n_lat_bits, n_lng_bits)
        for c in range(precision)
    ]
    return staged.withColumn(out, F.concat(*chars)).drop(t_lat, t_lon, t_lat_i, t_lng_i)


def gh_parent(gh: Column) -> Column:
    """Parent cell = drop last char (src/Geohasher.cs:181-187)."""
    return gh.substr(F.lit(1), F.length(gh) - 1)


def gh_truncate(gh: Column, level: int) -> Column:
    """Ancestor at a precision level (substring prefix)."""
    return F.substring(gh, 1, level)


def gh_is_valid(gh: Column) -> Column:
    """Syntactic validity (src/Geohasher.cs:190-199) — native rlike."""
    return gh.rlike(_VALID_RE)


def gh_children(gh: Column) -> Column:
    """All 32 children in base-32 order — native concat, no UDF
    (src/Geohasher.cs:168-178)."""
    return F.array(*[F.concat(gh, F.lit(c)) for c in BASE32])


def haversine_m(lat1: Column, lng1: Column, lat2: Column, lng2: Column) -> Column:
    """Great-circle distance in meters, native trig exprs
    (src/RadiusHasher.cs:275-280) — stays inside whole-stage codegen."""
    dlat = F.radians(lat2 - lat1) / 2
    dlng = F.radians(lng2 - lng1) / 2
    a = F.sin(dlat) * F.sin(dlat) + \
        F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.sin(dlng) * F.sin(dlng)
    return F.lit(2.0 * EARTH_RADIUS_M) * F.asin(F.least(F.lit(1.0), F.sqrt(a)))


def geocode_from_url(df: DataFrame, url: str = "url",
                     lat_out: str = "lat", lon_out: str = "lon") -> DataFrame:
    """Deterministic geocode: lat/lon from md5(url) (reproducible across
    cluster sizes; the north rule's hash-derived coordinates).

    Bit-identical to the DuckDB oracle twin in functions/oracle.py.
    """
    h = F.md5(F.col(url))
    h1 = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(h, 9, 8), 16, 10).cast("long")
    return df.withColumns({
        lat_out: (h1 + F.lit(0.5)) / F.lit(4294967296.0) * F.lit(180.0) - F.lit(90.0),
        lon_out: (h2 + F.lit(0.5)) / F.lit(4294967296.0) * F.lit(360.0) - F.lit(180.0),
    })
