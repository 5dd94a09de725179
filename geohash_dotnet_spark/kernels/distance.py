"""Spherical-Earth distance helpers (vectorized NumPy).

Earth model: sphere, R = 6,371,008.8 m (IUGG mean radius), matching
``/root/reference/src/RadiusHasher.cs:16``.
"""

from __future__ import annotations

import numpy as np

EARTH_RADIUS_M = 6_371_008.8
DEG_TO_RAD = np.pi / 180.0
METERS_PER_DEGREE = EARTH_RADIUS_M * DEG_TO_RAD  # ~111,195 m

MAX_PRECISION = 12


def haversine_term(lat1_rad, cos_lat1, lat2_deg, d_lng_deg):
    """Inner haversine term sin²(Δφ/2) + cosφ1·cosφ2·sin²(Δλ/2).

    Monotonic in distance; periodic in Δλ so unnormalized longitude
    differences are safe (src/RadiusHasher.cs:292-305).
    """
    lat2_rad = np.asarray(lat2_deg, dtype=np.float64) * DEG_TO_RAD
    sin_lat = np.sin((lat2_rad - lat1_rad) * 0.5)
    sin_lng = np.sin(np.asarray(d_lng_deg, dtype=np.float64) * DEG_TO_RAD * 0.5)
    return sin_lat * sin_lat + cos_lat1 * np.cos(lat2_rad) * sin_lng * sin_lng


def haversine_m(lat1, lng1, lat2, lng2):
    """Great-circle distance in meters (src/RadiusHasher.cs:275-280)."""
    lat1 = np.asarray(lat1, dtype=np.float64)
    lat1_rad = lat1 * DEG_TO_RAD
    a = haversine_term(lat1_rad, np.cos(lat1_rad), lat2,
                       np.asarray(lng1, dtype=np.float64) - np.asarray(lng2, dtype=np.float64))
    return 2.0 * EARTH_RADIUS_M * np.arcsin(np.minimum(1.0, np.sqrt(a)))


def cell_size_m(precision: int, latitude: float = 0.0) -> tuple[float, float]:
    """Approximate (width_m, height_m) of a cell at a latitude
    (src/RadiusHasher.cs:259-272)."""
    if not (1 <= precision <= MAX_PRECISION):
        raise ValueError(f"Precision must be between 1 and {MAX_PRECISION}.")
    total_bits = 5 * precision
    lat_step = 180.0 / (1 << (total_bits // 2))
    lng_step = 360.0 / (1 << ((total_bits + 1) // 2))
    height = lat_step * METERS_PER_DEGREE
    width = lng_step * METERS_PER_DEGREE * abs(np.cos(latitude * DEG_TO_RAD))
    return width, height


def precision_for_radius(radius_m: float, latitude: float = 0.0) -> int:
    """Smallest precision whose cell max-dimension <= radius/2
    (src/RadiusHasher.cs:241-253)."""
    if radius_m < 0 or np.isnan(radius_m):
        raise ValueError("radius_m must be non-negative.")
    for p in range(1, MAX_PRECISION + 1):
        width, height = cell_size_m(p, latitude)
        if max(width, height) <= radius_m * 0.5:
            return p
    return MAX_PRECISION
