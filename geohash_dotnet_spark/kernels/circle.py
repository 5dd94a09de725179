"""Circle (point + radius) geohash coverage — vectorized NumPy kernel.

Reproduces the semantics of ``/root/reference/src/RadiusHasher.cs:56-236``:

* spherical Earth, geographic bbox with pole detection and
  Δλ = asin(sin δ / cos φ);
* aligned grid ``cell i spans [i*step, (i+1)*step)``;
* ``intersects``: nearest point of the cell within the radius, using the
  analytic great-circle optimum on each meridian edge
  (tan φ* = tan φ1 / cos Δλ) — plain latitude clamping is wrong near poles;
* ``contains``: all four corners within radius, minus cells containing the
  center's antipode;
* comparisons on the raw haversine *term* vs a precomputed sin²(r/2R)
  threshold — no asin/sqrt in the hot path;
* zero radius: ``intersects`` -> exactly the containing cell,
  ``contains`` -> empty.

The whole candidate grid is evaluated as one meshgrid — no per-cell Python.
"""

from __future__ import annotations

import numpy as np

from .distance import DEG_TO_RAD, EARTH_RADIUS_M, haversine_term, precision_for_radius
from .geohash import MAX_PRECISION, encode, normalize_longitude


def cover_circle(
    lat: float,
    lng: float,
    radius_m: float,
    precision: int | None = None,
    criteria: str = "intersects",
    max_candidate_cells: int = 10_000_000,
) -> np.ndarray:
    """Geohashes of ``precision`` matching the circle. Returns a sorted
    unique string array."""
    if any(np.isnan(v) for v in (lat, lng, radius_m)):
        raise ValueError("Inputs must not be NaN.")
    if not (-90.0 <= lat <= 90.0):
        raise ValueError("Latitude must be between -90 and 90.")
    if radius_m < 0 or np.isinf(radius_m):
        raise ValueError("Radius must be a finite, non-negative number of meters.")
    if precision is None:
        precision = precision_for_radius(radius_m, lat)
    if not (1 <= precision <= MAX_PRECISION):
        raise ValueError(f"Precision must be between 1 and {MAX_PRECISION}.")
    if criteria not in ("intersects", "contains"):
        raise ValueError("criteria must be 'intersects' or 'contains'")

    lng = float(normalize_longitude(lng)[()])

    # --- Geographic bounding box of the circle (src/RadiusHasher.cs:80-110) ---
    angular_radius = radius_m / EARTH_RADIUS_M
    radius_deg = angular_radius / DEG_TO_RAD

    lat_min = lat - radius_deg
    lat_max = lat + radius_deg
    full_lng_range = lat_max >= 90.0 or lat_min <= -90.0

    lng_min, lng_max = -180.0, 180.0
    if not full_lng_range:
        ratio = np.sin(angular_radius) / np.cos(lat * DEG_TO_RAD)
        if ratio >= 1.0:
            full_lng_range = True
        else:
            delta = float(np.arcsin(ratio)) / DEG_TO_RAD
            # deliberately unnormalized; the grid handles wrap, encode
            # normalizes at the end (src/RadiusHasher.cs:100-106)
            lng_min = lng - delta
            lng_max = lng + delta

    lat_min = max(lat_min, -90.0)
    lat_max = min(lat_max, 90.0)

    # --- Grid setup (src/RadiusHasher.cs:112-127) ---
    total_bits = 5 * precision
    lat_step = 180.0 / (1 << (total_bits // 2))
    lng_step = 360.0 / (1 << ((total_bits + 1) // 2))

    lat_start = int(np.floor(lat_min / lat_step))
    lat_end = int(np.ceil(lat_max / lat_step))
    lng_start = int(np.floor(lng_min / lng_step))
    lng_end = int(np.ceil(lng_max / lng_step))

    candidates = (lat_end - lat_start) * (lng_end - lng_start)
    if candidates > max_candidate_cells:
        raise ValueError(
            f"Search would examine {candidates:,} cells (limit "
            f"{max_candidate_cells:,}). Reduce precision (currently "
            f"{precision}) or radius, or raise max_candidate_cells."
        )
    if candidates <= 0:
        return np.array([], dtype=object)

    # --- Vectorized candidate evaluation ---
    s = np.sin(min(angular_radius, np.pi) * 0.5)
    threshold = s * s
    center_lat_rad = lat * DEG_TO_RAD
    cos_center = np.cos(center_lat_rad)
    sin_center = np.sin(center_lat_rad)

    lat_idx = np.arange(lat_start, lat_end, dtype=np.float64)
    lng_idx = np.arange(lng_start, lng_end, dtype=np.float64)
    cell_min_lat = np.maximum(lat_idx * lat_step, -90.0)
    cell_max_lat = np.minimum(cell_min_lat + lat_step, 90.0)
    cell_min_lng = lng_idx * lng_step
    cell_max_lng = cell_min_lng + lng_step

    g_min_lat = cell_min_lat[:, None]          # (R, 1)
    g_max_lat = cell_max_lat[:, None]
    g_min_lng = cell_min_lng[None, :]          # (1, C)
    g_max_lng = cell_max_lng[None, :]

    # shift query lon into the cell's frame (src/RadiusHasher.cs:152-156)
    q_lng = np.full((1, lng_idx.shape[0]), lng)
    q_lng = np.where(q_lng < g_min_lng - 180.0, q_lng + 360.0, q_lng)
    q_lng = np.where(q_lng > g_max_lng + 180.0, q_lng - 360.0, q_lng)

    if criteria == "contains":
        include = (
            (haversine_term(center_lat_rad, cos_center, g_min_lat, q_lng - g_min_lng) <= threshold)
            & (haversine_term(center_lat_rad, cos_center, g_min_lat, q_lng - g_max_lng) <= threshold)
            & (haversine_term(center_lat_rad, cos_center, g_max_lat, q_lng - g_min_lng) <= threshold)
            & (haversine_term(center_lat_rad, cos_center, g_max_lat, q_lng - g_max_lng) <= threshold)
        )
        if threshold < 1.0:
            # antipode exclusion (src/RadiusHasher.cs:171-180)
            a_lng = q_lng + 180.0
            a_lng = np.where(a_lng > g_max_lng + 180.0, a_lng - 360.0, a_lng)
            antipode_in = (
                (-lat >= g_min_lat) & (-lat <= g_max_lat)
                & (a_lng >= g_min_lng) & (a_lng <= g_max_lng)
            )
            include &= ~antipode_in
    else:
        include = _nearest_term(
            center_lat_rad, cos_center, sin_center, lat, q_lng,
            g_min_lat, g_max_lat, g_min_lng, g_max_lng,
        ) <= threshold

    rows, cols = np.nonzero(include)
    if rows.size == 0:
        return np.array([], dtype=object)
    c_lat = cell_min_lat[rows] + lat_step * 0.5
    c_lng = cell_min_lng[cols] + lng_step * 0.5
    return np.unique(encode(c_lat, c_lng, precision)).astype(object)


def _nearest_term(center_lat_rad, cos_center, sin_center, center_lat_deg,
                  q_lng, min_lat, max_lat, min_lng, max_lng):
    """Smallest haversine term between the query point and any point of each
    cell (src/RadiusHasher.cs:211-236)."""
    c_lat = np.clip(center_lat_deg, min_lat, max_lat)
    c_lng = np.clip(q_lng, min_lng, max_lng)
    best = haversine_term(center_lat_rad, cos_center, c_lat, q_lng - c_lng)

    for edge_lng in (min_lng, max_lng):
        d_lng_rad = (q_lng - edge_lng) * DEG_TO_RAD
        optimal_lat = np.arctan2(sin_center, cos_center * np.cos(d_lng_rad)) / DEG_TO_RAD
        lat = np.clip(optimal_lat, min_lat, max_lat)
        best = np.minimum(best, haversine_term(center_lat_rad, cos_center, lat, q_lng - edge_lng))
    return best
