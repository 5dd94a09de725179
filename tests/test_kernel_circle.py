"""Circle-coverage kernel tests — golden/property cases from
/root/reference/tests/RadiusHasherTests.cs (cited per test)."""

import numpy as np
import pytest

from geohash_dotnet_spark.kernels import (
    EARTH_RADIUS_M,
    cell_size_m,
    cover_circle,
    encode,
    haversine_m,
    precision_for_radius,
)


def _destination(lat, lng, bearing_deg, distance_m):
    """Great-circle destination point (test helper, spherical Earth)."""
    d = distance_m / EARTH_RADIUS_M
    b = np.radians(bearing_deg)
    phi1, lam1 = np.radians(lat), np.radians(lng)
    phi2 = np.arcsin(np.sin(phi1) * np.cos(d) + np.cos(phi1) * np.sin(d) * np.cos(b))
    lam2 = lam1 + np.arctan2(np.sin(b) * np.sin(d) * np.cos(phi1),
                             np.cos(d) - np.sin(phi1) * np.sin(phi2))
    return np.degrees(phi2), ((np.degrees(lam2) + 540) % 360) - 180


def test_zero_radius_intersects_returns_containing_cell():
    # tests/RadiusHasherTests.cs:76-85
    result = cover_circle(52.5163, 13.3777, 0, 7, "intersects")
    assert len(result) == 1
    assert result[0] == encode([52.5163], [13.3777], 7)[0]


def test_zero_radius_contains_returns_empty():
    # tests/RadiusHasherTests.cs:87-94
    assert len(cover_circle(52.5163, 13.3777, 0, 7, "contains")) == 0


def test_center_cell_always_included_for_intersects():
    # tests/RadiusHasherTests.cs:96-101
    result = cover_circle(48.8566, 2.3522, 250, 7)
    assert encode([48.8566], [2.3522], 7)[0] in set(result)


def test_contains_subset_of_intersects():
    # tests/RadiusHasherTests.cs:164-184
    rng = np.random.default_rng(42)
    for _ in range(25):
        lat = rng.uniform(-70, 70)
        lng = rng.uniform(-180, 180)
        radius = rng.uniform(100, 20_100)
        p = rng.integers(4, 8)
        c = set(cover_circle(lat, lng, radius, int(p), "contains"))
        i = set(cover_circle(lat, lng, radius, int(p), "intersects"))
        assert c <= i, f"contains not subset of intersects at ({lat},{lng},{radius},{p})"


def test_intersects_complete_every_interior_point_covered():
    # tests/RadiusHasherTests.cs:186-206
    lat, lng, radius, p = 40.7128, -74.0060, 4_000, 7
    cells = set(cover_circle(lat, lng, radius, p))
    rng = np.random.default_rng(1337)
    bearings = rng.uniform(0, 360, 500)
    dists = radius * np.sqrt(rng.uniform(0, 1, 500)) * 0.999
    p_lat, p_lng = _destination(lat, lng, bearings, dists)
    hashes = encode(p_lat, p_lng, p)
    for h in hashes:
        assert h in cells


def test_antimeridian_coverage():
    # tests/RadiusHasherTests.cs:229-238
    lat, lng, radius, p = 10, -179.95, 30_000, 6
    result = set(cover_circle(lat, lng, radius, p))
    p_lat, p_lng = _destination(lat, lng, 270, radius * 0.5)
    assert p_lng > 0  # sanity: wrapped to the eastern hemisphere
    assert encode([p_lat], [p_lng], p)[0] in result


def test_circle_covering_north_pole_spans_all_longitudes():
    # tests/RadiusHasherTests.cs:240-272: 100 km around (89.5, 0) reaches
    # past the pole; the across-the-pole cell "zzz" must be included.
    result = set(cover_circle(89.5, 0, 100_000, 3))
    assert "zzz" in result
    lngs = [-170, -90, 0, 90, 170]
    for lng in lngs:
        assert encode([89.9], [lng], 3)[0] in result


def test_every_intersect_cell_is_actually_within_radius():
    """Independent oracle: every returned cell's true nearest distance must
    be <= radius; every rejected neighbor cell's distance > radius
    (dense-sample analogue of tests/RadiusHasherTests.cs:410-446)."""
    from geohash_dotnet_spark.kernels.geohash import bounding_box

    cases = [(52.5163, 13.3777, 5_000, 6), (-33.86, 151.21, 8_000, 5),
             (64.15, -21.95, 12_000, 5)]
    for lat, lng, radius, p in cases:
        cells = cover_circle(lat, lng, radius, p, "intersects")
        min_lat, min_lng, max_lat, max_lng = bounding_box(cells)
        # dense boundary sampling of each cell
        for i in range(len(cells)):
            lats = np.linspace(min_lat[i], max_lat[i], 21)
            lngs = np.linspace(min_lng[i], max_lng[i], 21)
            grid_lat, grid_lng = np.meshgrid(lats, lngs)
            d = haversine_m(lat, lng, grid_lat.ravel(), grid_lng.ravel())
            assert d.min() <= radius * (1 + 1e-9), f"cell {cells[i]} outside radius"


def test_contains_cells_fully_inside():
    lat, lng, radius, p = 48.8566, 2.3522, 10_000, 6
    from geohash_dotnet_spark.kernels.geohash import bounding_box

    cells = cover_circle(lat, lng, radius, p, "contains")
    assert len(cells) > 0
    min_lat, min_lng, max_lat, max_lng = bounding_box(cells)
    for corners in [(min_lat, min_lng), (min_lat, max_lng),
                    (max_lat, min_lng), (max_lat, max_lng)]:
        d = haversine_m(lat, lng, corners[0], corners[1])
        assert (d <= radius * (1 + 1e-9)).all()


def test_validation_errors():
    with pytest.raises(ValueError):
        cover_circle(np.nan, 0, 100, 5)
    with pytest.raises(ValueError):
        cover_circle(91, 0, 100, 5)
    with pytest.raises(ValueError):
        cover_circle(0, 0, -1, 5)
    with pytest.raises(ValueError):
        cover_circle(0, 0, np.inf, 5)
    with pytest.raises(ValueError):
        cover_circle(0, 0, 100, 13)


def test_candidate_guard():
    # src/RadiusHasher.cs:122-127; tests/RadiusHasherTests.cs:52-60
    with pytest.raises(ValueError, match="cells"):
        cover_circle(0, 0, 500_000, 12)


def test_precision_for_radius_monotonic():
    # tests/RadiusHasherTests.cs:304-327
    prev = 13
    for r in (10, 100, 1_000, 10_000, 100_000, 1_000_000):
        p = precision_for_radius(r)
        assert p <= prev
        prev = p
    assert precision_for_radius(0.0001) == 12


def test_cell_size_shrinks_with_latitude():
    # tests/RadiusHasherTests.cs:343-350
    w0, h0 = cell_size_m(5, 0)
    w60, h60 = cell_size_m(5, 60)
    assert h0 == pytest.approx(h60)
    assert w60 == pytest.approx(w0 * 0.5, rel=1e-9)


def test_distance_meters():
    # 1 deg latitude ~ 111,195 m (tests/RadiusHasherTests.cs:363-367)
    assert haversine_m(0, 0, 1, 0) == pytest.approx(111_195, abs=10)
    # short path across the date line (tests/RadiusHasherTests.cs:377-382)
    d = haversine_m(0, 179.9, 0, -179.9)
    assert d < 50_000
