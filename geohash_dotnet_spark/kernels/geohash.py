"""Vectorized NumPy geohash kernels.

Semantics match the reference implementation (geohash-dotnet) exactly:

* base-32 alphabet ``0123456789bcdefghjkmnpqrstuvwxyz`` with longitude bit
  first and ``>= mid`` going to the upper half
  (``/root/reference/src/Geohasher.cs:17,76-102``);
* longitude wrapped into ``[-180, 180)``
  (``src/Geohasher.cs:213-219``), latitude clamped to ``[-90, 90]``
  (``src/Geohasher.cs:221-223``);
* decode returns the exact cell center (``src/Geohasher.cs:108-112``);
* neighbors re-encode ``center + (dLat*height, dLng*width)`` so poleward
  neighbors bounce and E/W neighbors wrap (``src/Geohasher.cs:203-210``).

Everything here is pure NumPy, importable without Spark, and vectorized:
one call processes a whole column (no per-row Python in the hot path).

Exactness note: encode uses an integer formulation
``i = floor((x - lo) / step)`` followed by a one-round exact fix-up against
the dyadic cell boundaries.  Cell boundaries ``lo + i*step`` with
``step = 45 * 2^-k`` are exactly representable in binary64, so the fix-up
comparisons are exact and the result provably equals the reference's
midpoint-halving loop (validated against it in tests/test_kernel_geohash.py).
"""

from __future__ import annotations

import numpy as np

BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"
MAX_PRECISION = 12

_B32_BYTES = np.frombuffer(BASE32.encode("ascii"), dtype=np.uint8)

# O(1) reverse lookup, accepts upper+lowercase (src/Geohasher.cs:41-51).
_DECODE_MAP = np.full(256, -1, dtype=np.int8)
for _i, _c in enumerate(BASE32):
    _DECODE_MAP[ord(_c)] = _i
    _DECODE_MAP[ord(_c.upper())] = _i

# (dLat, dLng) offsets in reference direction order N,NE,E,SE,S,SW,W,NW
# (src/Geohasher.cs:22-39).
DIRECTIONS = ("n", "ne", "e", "se", "s", "sw", "w", "nw")
_OFFSETS = {
    "n": (1, 0), "ne": (1, 1), "e": (0, 1), "se": (-1, 1),
    "s": (-1, 0), "sw": (-1, -1), "w": (0, -1), "nw": (1, -1),
}
# Accept the reference Direction enum names too (src/Direction.cs:11-39):
# Neighbor(hash, Direction.NorthEast) callers write "northeast"/"north_east".
_OFFSETS.update({
    "north": _OFFSETS["n"], "northeast": _OFFSETS["ne"],
    "east": _OFFSETS["e"], "southeast": _OFFSETS["se"],
    "south": _OFFSETS["s"], "southwest": _OFFSETS["sw"],
    "west": _OFFSETS["w"], "northwest": _OFFSETS["nw"],
    "north_east": _OFFSETS["ne"], "south_east": _OFFSETS["se"],
    "south_west": _OFFSETS["sw"], "north_west": _OFFSETS["nw"],
})


def normalize_longitude(lng):
    """Wrap longitude into [-180, 180). -185 -> 175, 185 -> -175.

    Mirrors src/Geohasher.cs:213-219 (C# ``%`` is truncating remainder,
    hence the explicit negative fix-up there; ``np.mod`` already flooring).
    """
    lng = np.asarray(lng, dtype=np.float64)
    out = np.mod(lng + 180.0, 360.0)
    # np.mod(x, 360) is in [0, 360); C# logic lands in the same range.
    return out - 180.0


def clamp_latitude(lat):
    """Saturating clamp into [-90, 90] (src/Geohasher.cs:221-223)."""
    return np.clip(np.asarray(lat, dtype=np.float64), -90.0, 90.0)


def lat_lng_steps(precision: int) -> tuple[float, float]:
    """(latStep, lngStep) of the aligned grid at a precision.

    5p total bits; longitude gets the extra bit
    (src/PolygonHasher.cs:81-83, src/RadiusHasher.cs:113-115).
    """
    total_bits = 5 * precision
    lat_step = 180.0 / (1 << (total_bits // 2))
    lng_step = 360.0 / (1 << ((total_bits + 1) // 2))
    return lat_step, lng_step


def _check_precision(precision: int) -> None:
    if not (1 <= int(precision) <= MAX_PRECISION):
        raise ValueError(
            f"Precision must be between 1 and {MAX_PRECISION}, got {precision}."
        )


def _grid_index(x: np.ndarray, lo: float, step: float, n: int) -> np.ndarray:
    """Exact index i such that lo + i*step <= x < lo + (i+1)*step.

    floor-division first, then one exact fix-up round: the boundaries
    lo + i*step are exact dyadic doubles, so the comparisons below are exact
    and correct any off-by-one introduced by rounding in the division.
    Values exactly at the top of the range (x == lo + n*step) clamp to n-1,
    matching the reference where the final interval is closed at the top
    because latitude is clamped / longitude normalized first.
    """
    i = np.floor((x - lo) / step).astype(np.int64)
    np.clip(i, 0, n - 1, out=i)
    # one round of exact fix-up (FP error in the division is << 1 step)
    too_high = x < lo + i * step
    i -= too_high.astype(np.int64)
    too_low = x >= lo + (i + 1) * step
    i += np.where(i < n - 1, too_low.astype(np.int64), 0)
    np.clip(i, 0, n - 1, out=i)
    return i


def _spread_bits_30(x: np.ndarray) -> np.ndarray:
    """Insert a zero between each of the low 30 bits: bit i -> bit 2i."""
    x = x.astype(np.uint64)
    x = (x | (x << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x3333333333333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x5555555555555555)
    return x


def encode_ints(lat, lng, precision: int = 6) -> np.ndarray:
    """Encode to packed uint64 cell ids (the 5p interleaved bits)."""
    _check_precision(precision)
    lat = np.atleast_1d(np.asarray(lat, dtype=np.float64))
    lng = np.atleast_1d(np.asarray(lng, dtype=np.float64))
    if np.isnan(lat).any() or np.isnan(lng).any():
        raise ValueError("Coordinates must not be NaN.")

    lat = clamp_latitude(lat)
    lng = normalize_longitude(lng)

    total_bits = 5 * precision
    n_lat_bits = total_bits // 2
    n_lng_bits = (total_bits + 1) // 2
    lat_step = 180.0 / (1 << n_lat_bits)
    lng_step = 360.0 / (1 << n_lng_bits)

    lat_i = _grid_index(lat, -90.0, lat_step, 1 << n_lat_bits)
    lng_i = _grid_index(lng, -180.0, lng_step, 1 << n_lng_bits)

    lon_s = _spread_bits_30(lng_i.astype(np.uint64))
    lat_s = _spread_bits_30(lat_i.astype(np.uint64))
    if total_bits % 2 == 1:
        # odd: stream ends with a lon bit -> lon bit b at position 2b
        packed = lon_s | (lat_s << np.uint64(1))
    else:
        packed = (lon_s << np.uint64(1)) | lat_s
    return packed


def ints_to_str(packed: np.ndarray, precision: int) -> np.ndarray:
    """Packed uint64 cell ids -> base-32 geohash strings (vectorized)."""
    n = packed.shape[0]
    out = np.empty((n, precision), dtype=np.uint8)
    for c in range(precision):
        shift = np.uint64(5 * (precision - 1 - c))
        out[:, c] = _B32_BYTES[(packed >> shift) & np.uint64(31)]
    return out.reshape(n * precision).view(f"S{precision}").astype(str)


def encode(lat, lng, precision: int = 6) -> np.ndarray:
    """Vectorized geohash encode -> array of strings."""
    return ints_to_str(encode_ints(lat, lng, precision), precision)


def _strs_to_byte_matrix(geohashes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Validate + convert equal-or-ragged string array to (codes, lengths).

    codes is (n, max_len) int8 of base-32 digit values, -1 padded.
    Raises ValueError on invalid input (src/Geohasher.cs:225-238).
    """
    # atleast_1d: a single geohash string (the reference's Decode(string)
    # shape, src/Geohasher.cs:108) arrives as a 0-d object array — treat
    # it as a 1-element batch instead of failing iteration
    gh = np.atleast_1d(np.asarray(geohashes, dtype=object))
    lengths = np.fromiter((len(g) if isinstance(g, str) else 0 for g in gh),
                          dtype=np.int64, count=len(gh))
    if (lengths == 0).any():
        raise ValueError("Geohash must not be null or empty.")
    if (lengths > MAX_PRECISION).any():
        raise ValueError(f"Geohash length cannot exceed {MAX_PRECISION}.")
    max_len = int(lengths.max())
    buf = np.zeros((len(gh), max_len), dtype=np.uint8)
    for i, g in enumerate(gh):
        b = g.encode("ascii", errors="replace")
        buf[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
    codes = _DECODE_MAP[buf]
    valid_mask = codes >= 0
    pad_mask = np.arange(max_len)[None, :] >= lengths[:, None]
    if not (valid_mask | pad_mask).all():
        raise ValueError("Invalid character in geohash.")
    codes = np.where(pad_mask, -1, codes)
    return codes.astype(np.int8), lengths


def bounding_box(geohashes) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Exact cell bounds (min_lat, min_lng, max_lat, max_lng), vectorized.

    Reconstructs the bounds from the integer bit path; the boundaries are
    exact dyadic doubles, identical to the midpoint-halving replay in
    src/Geohasher.cs:115-144.
    """
    codes, lengths = _strs_to_byte_matrix(np.asarray(geohashes, dtype=object))
    n, max_len = codes.shape
    lat_i = np.zeros(n, dtype=np.int64)
    lng_i = np.zeros(n, dtype=np.int64)
    n_lat_bits = np.zeros(n, dtype=np.int64)
    n_lng_bits = np.zeros(n, dtype=np.int64)

    # Per-length group processing keeps everything vectorized.
    for length in np.unique(lengths):
        sel = lengths == length
        c = codes[sel, :length].astype(np.int64)
        total = 5 * int(length)
        nlon = (total + 1) // 2
        nlat = total // 2
        # packed 5p-bit integer
        packed = np.zeros(sel.sum(), dtype=np.uint64)
        for j in range(int(length)):
            packed = (packed << np.uint64(5)) | c[:, j].astype(np.uint64)
        # de-interleave
        if total % 2 == 1:
            lon_bits = _unspread_bits(packed)
            lat_bits = _unspread_bits(packed >> np.uint64(1))
        else:
            lon_bits = _unspread_bits(packed >> np.uint64(1))
            lat_bits = _unspread_bits(packed)
        lat_i[sel] = lat_bits.astype(np.int64)
        lng_i[sel] = lon_bits.astype(np.int64)
        n_lat_bits[sel] = nlat
        n_lng_bits[sel] = nlon

    lat_step = 180.0 / np.power(2.0, n_lat_bits)
    lng_step = 360.0 / np.power(2.0, n_lng_bits)
    min_lat = -90.0 + lat_i * lat_step
    min_lng = -180.0 + lng_i * lng_step
    return min_lat, min_lng, min_lat + lat_step, min_lng + lng_step


def _unspread_bits(x: np.ndarray) -> np.ndarray:
    """Inverse of _spread_bits_30: gather even-position bits."""
    x = x.astype(np.uint64) & np.uint64(0x5555555555555555)
    x = (x | (x >> np.uint64(1))) & np.uint64(0x3333333333333333)
    x = (x | (x >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
    return x


def decode(geohashes) -> tuple[np.ndarray, np.ndarray]:
    """Cell centers (lat, lng) — src/Geohasher.cs:108-112."""
    min_lat, min_lng, max_lat, max_lng = bounding_box(geohashes)
    return (min_lat + max_lat) * 0.5, (min_lng + max_lng) * 0.5


def neighbor(geohashes, direction: str) -> np.ndarray:
    """Neighbor in one direction; pole bounce + antimeridian wrap
    via re-encode (src/Geohasher.cs:203-210)."""
    d_lat, d_lng = _OFFSETS[direction.lower()]
    # atleast_1d: accept a single geohash string like the reference's
    # GetNeighbour(string) (src/Geohasher.cs:203)
    gh = np.atleast_1d(np.asarray(geohashes, dtype=object))
    min_lat, min_lng, max_lat, max_lng = bounding_box(gh)
    height = max_lat - min_lat
    width = max_lng - min_lng
    c_lat = (min_lat + max_lat) * 0.5 + d_lat * height
    c_lng = (min_lng + max_lng) * 0.5 + d_lng * width
    lengths = np.fromiter((len(g) for g in gh), dtype=np.int64, count=len(gh))
    out = np.empty(len(gh), dtype=object)
    for length in np.unique(lengths):
        sel = lengths == length
        out[sel] = encode(c_lat[sel], c_lng[sel], int(length))
    return out


def neighbors(geohashes) -> dict[str, np.ndarray]:
    """All 8 neighbors keyed by direction (src/Geohasher.cs:158-165)."""
    return {d: neighbor(geohashes, d) for d in DIRECTIONS}


def children(geohash: str) -> list[str]:
    """All 32 child cells in base-32 order (src/Geohasher.cs:168-178)."""
    _validate_scalar(geohash)
    if len(geohash) >= MAX_PRECISION:
        raise ValueError(f"Cannot generate subhashes for precision {MAX_PRECISION}.")
    return [geohash + c for c in BASE32]


def parent(geohash: str) -> str:
    """Drop the last char (src/Geohasher.cs:181-187)."""
    _validate_scalar(geohash)
    if len(geohash) <= 1:
        raise ValueError("Cannot get parent of a precision-1 geohash.")
    return geohash[:-1]


def is_valid(geohashes) -> np.ndarray:
    """Length 1-12 and all chars base-32 (case-insensitive)
    (src/Geohasher.cs:190-199)."""
    gh = np.asarray(geohashes, dtype=object)
    out = np.zeros(len(gh), dtype=bool)
    for i, g in enumerate(gh):
        if not isinstance(g, str) or not (1 <= len(g) <= MAX_PRECISION):
            continue
        b = g.encode("ascii", errors="replace")
        codes = _DECODE_MAP[np.frombuffer(b, dtype=np.uint8)]
        out[i] = len(b) == len(g) and (codes >= 0).all()
    return out


def _validate_scalar(geohash: str) -> None:
    if not geohash:
        raise ValueError("Geohash must not be null or empty.")
    if len(geohash) > MAX_PRECISION:
        raise ValueError(f"Geohash length cannot exceed {MAX_PRECISION}.")
    for i, c in enumerate(geohash):
        if ord(c) >= 128 or _DECODE_MAP[ord(c)] < 0:
            raise ValueError(f"Invalid character '{c}' at position {i}.")
