"""Polygon-coverage kernel tests.

Golden sets extracted from /root/reference/tests/PolygonHasherTests.cs into
tests/golden/ (the ~217k embedded expected geohashes); inline goldens cited
per test.
"""

from pathlib import Path

import numpy as np
import pytest

from geohash_dotnet_spark.kernels import (
    cover_polygon,
    encode,
    parse_wkt,
    split_antimeridian,
)

GOLDEN = Path(__file__).parent / "golden"


def _rect(min_lng, min_lat, max_lng, max_lat):
    return [np.array([
        [min_lng, min_lat], [min_lng, max_lat], [max_lng, max_lat],
        [max_lng, min_lat], [min_lng, min_lat]], dtype=np.float64)]


def _golden(name):
    return sorted((GOLDEN / f"{name}.txt").read_text().split())


def _wkt(name):
    return (GOLDEN / f"{name}.wkt").read_text().strip()


# ---------------------------------------------------------------------------
# Inline goldens
# ---------------------------------------------------------------------------

def test_world_octants_precision1_contains():
    # PolygonHasherTests.cs:318-349: rect (0,0)-(180,90) at p1, contains
    result = sorted(cover_polygon(_rect(0, 0, 180, 90), 1, "contains"))
    assert result == sorted(["s", "t", "w", "y", "z", "u", "x", "v"])


def test_precision2_box_intersects():
    # PolygonHasherTests.cs:352-383: rect (0,0)-(22.5,11.25) at p2, intersects
    expected = sorted(["s2", "s0", "ef", "eb", "s1", "s6", "ec", "s8",
                       "kx", "s4", "sd", "kp", "s9", "s3", "7z", "kr"])
    result = sorted(cover_polygon(_rect(0, 0, 22.5, 11.25), 2, "intersects"))
    assert result == expected


def test_small_paris_polygon_p4_intersects():
    # PolygonHasherTests.cs:232-259: (2.2,48.8)-(2.3,48.9) p4 intersects
    result = sorted(cover_polygon(_rect(2.2, 48.8, 2.3, 48.9), 4, "intersects"))
    assert result == ["u09t", "u09w"]


def test_mexico_city_triangle_p7_contains():
    # PolygonHasherTests.cs:283-315 ("Large_Polygon"): 44 golden cells
    wkt = ("POLYGON((-99.1795917 19.432134, -99.1656847 19.429034,"
           " -99.1776492 19.414236, -99.1795917 19.432134))")
    expected = sorted([
        "9g3qx26", "9g3qx2b", "9g3qx0u", "9g3qrpw", "9g3qx2d", "9g3qx1p",
        "9g3qx2c", "9g3qx2g", "9g3qx0p", "9g3qx0w", "9g3qrpt", "9g3qx0z",
        "9g3qx22", "9g3qrpn", "9g3qx23", "9g3qx0v", "9g3qrr8", "9g3qx0t",
        "9g3qx21", "9g3qx20", "9g3qrpj", "9g3qx1h", "9g3qx28", "9g3qx29",
        "9g3qx1j", "9g3qrpm", "9g3qrpx", "9g3qx0n", "9g3qrpy", "9g3qx0m",
        "9g3qx0q", "9g3qrpr", "9g3qrrb", "9g3qx2f", "9g3qrpq", "9g3qx0y",
        "9g3qx0x", "9g3qrpv", "9g3qx0j", "9g3qx2e", "9g3qx1n", "9g3qrnv",
        "9g3qx0r", "9g3qrpz",
    ])
    assert sorted(cover_polygon(wkt, 7, "contains")) == expected


def test_funky_polygon_p6_intersects_count():
    # PolygonHasherTests.cs:261-281: 3,127 cells
    wkt = ("POLYGON((-105.0567626953125 40.6639728763869,"
           " -105.38360595703125 40.49918094806632,"
           " -104.4854736328125 40.0717663466261,"
           " -104.47448730468749 40.29419163838167,"
           " -104.765625 40.30466538259176,"
           " -104.6392822265625 40.47202439692057,"
           " -104.94415283203125 40.46575594018434,"
           " -105.0567626953125 40.6639728763869))")
    assert len(cover_polygon(wkt, 6, "intersects")) == 3127


def test_world_with_epsilon_overflow_p1():
    # PolygonHasherTests.cs:386-434: polygon exceeding world bounds by 0.1 deg
    # still yields exactly the 32 precision-1 cells, all in-bounds
    result = cover_polygon(_rect(-180.1, -90.1, 180.1, 90.1), 1, "contains")
    assert len(result) == 32


def test_near_north_pole_p7_count():
    # PolygonHasherTests.cs:437-454: 1,048,464 cells
    result = cover_polygon(_rect(-10.0, 89.8, 10.0, 89.9), 7, "contains")
    assert len(result) == 1_048_464


def test_nested_polygon_subset():
    # PolygonHasherTests.cs:211-229
    big = set(cover_polygon(_rect(-45, -45, 45, 45), 5, "contains"))
    small = cover_polygon(_rect(44, 44, 45, 45), 3, "contains")
    for gh in small:
        assert gh in big


# ---------------------------------------------------------------------------
# The three huge golden coverage sets
# ---------------------------------------------------------------------------

def test_california_p5_contains_golden():
    # PolygonHasherTests.cs:20-47: 22,754 cells
    result = sorted(cover_polygon(_wkt("california_p5_contains"), 5, "contains"))
    assert result == _golden("california_p5_contains")


def test_alaska_p5_intersects_golden():
    # PolygonHasherTests.cs:50-77: 185,049 cells
    result = sorted(cover_polygon(_wkt("alaska_p5_intersects"), 5, "intersects"))
    assert result == _golden("alaska_p5_intersects")


def test_boston_p7_contains_golden():
    # PolygonHasherTests.cs:177-208: 8,777 cells
    result = sorted(cover_polygon(_wkt("boston_p7_contains"), 7, "contains"))
    assert result == _golden("boston_p7_contains")


# ---------------------------------------------------------------------------
# Adversarial geometry (PolygonHasher_Generated_Tests.cs patterns)
# ---------------------------------------------------------------------------

def test_donut_hole_excluded():
    # polygon with a hole: cells inside the hole are excluded
    outer = _rect(0, 0, 10, 10)[0]
    inner = _rect(3, 3, 7, 7)[0]
    cells_with_hole = set(cover_polygon([outer, inner], 4, "contains"))
    cells_solid = set(cover_polygon([outer], 4, "contains"))
    hole_interior = set(cover_polygon([_rect(4, 4, 6, 6)[0]], 4, "intersects"))
    assert cells_with_hole < cells_solid
    assert not (cells_with_hole & hole_interior)
    # hole-boundary cells intersect but are not contained
    inter = set(cover_polygon([outer, inner], 4, "intersects"))
    assert hole_interior - cells_with_hole  # hole region missing from contains
    assert cells_with_hole < inter


def test_concave_c_shape():
    # concave "C": the notch must not be covered
    ring = np.array([
        [0, 0], [10, 0], [10, 2], [2, 2], [2, 8], [10, 8],
        [10, 10], [0, 10], [0, 0]], dtype=np.float64)
    cells = cover_polygon([ring], 5, "contains")
    notch_point = encode([5.0], [6.0], 5)[0]  # inside the notch
    arm_point = encode([1.0], [1.0], 5)[0]    # inside the lower arm
    cells_set = set(cells)
    assert notch_point not in cells_set
    assert arm_point in cells_set


def test_contains_subset_of_intersects_polygon():
    wkt = _wkt("california_p5_contains")
    c = set(cover_polygon(wkt, 4, "contains"))
    i = set(cover_polygon(wkt, 4, "intersects"))
    assert c <= i


def test_independent_grid_scan_oracle():
    """3x-oversampled grid-scan oracle vs the hasher
    (PolygonHasher_Generated_Tests.cs:131-169 technique): every covered
    cell must contain at least one polygon point at 3x sampling; every
    'contains' cell must have all its sample points inside."""
    ring = np.array([
        [-3.7, 40.1], [-2.9, 40.6], [-3.1, 41.3], [-4.0, 41.1],
        [-4.2, 40.5], [-3.7, 40.1]], dtype=np.float64)
    from geohash_dotnet_spark.kernels.geohash import bounding_box
    from geohash_dotnet_spark.kernels.polygon import _centers_inside

    for p in (4, 5):
        contains = cover_polygon([ring], p, "contains")
        if len(contains) == 0:
            continue
        min_lat, min_lng, max_lat, max_lng = bounding_box(contains)
        for i in range(len(contains)):
            xs = np.linspace(min_lng[i], max_lng[i], 4)[1:-1]
            ys = np.linspace(min_lat[i], max_lat[i], 4)[1:-1]
            inside = _centers_inside([ring], xs, ys)
            assert inside.all(), f"contains cell {contains[i]} has outside samples"


def test_antimeridian_split_fiji_like():
    # ring crossing the date line (jump > 180 between consecutive points)
    ring = np.array([
        [179.0, -17.0], [-179.5, -17.0], [-179.5, -18.0],
        [179.0, -18.0], [179.0, -17.0]], dtype=np.float64)
    parts = split_antimeridian([ring])
    assert len(parts) == 2
    for part in parts:
        xs = np.concatenate([r[:, 0] for r in part])
        assert xs.min() >= -180.0 and xs.max() <= 180.0
    cells = cover_polygon([ring], 4, "intersects")
    lngs = []
    from geohash_dotnet_spark.kernels import decode
    _, lng = decode(cells)
    assert (lng > 0).any() and (lng < 0).any()  # both sides of the seam


def test_no_jump_passthrough():
    ring = _rect(10, 10, 20, 20)[0]
    parts = split_antimeridian([ring])
    assert len(parts) == 1
    assert np.array_equal(parts[0][0], ring)


def test_empty_polygon_returns_empty():
    degenerate = np.array([[0, 0], [0, 0], [0, 0], [0, 0]], dtype=np.float64)
    assert len(cover_polygon([degenerate], 5, "contains")) == 0


def test_invalid_precision_raises():
    with pytest.raises(ValueError):
        cover_polygon(_rect(0, 0, 1, 1), 0, "contains")
    with pytest.raises(ValueError):
        cover_polygon(_rect(0, 0, 1, 1), 13, "contains")


def test_parse_wkt_polygon_with_hole():
    wkt = "POLYGON((0 0, 10 0, 10 10, 0 10, 0 0), (3 3, 7 3, 7 7, 3 7, 3 3))"
    polys = parse_wkt(wkt)
    assert len(polys) == 1 and len(polys[0]) == 2
    assert polys[0][0].shape[1] == 2


def test_parse_wkt_multipolygon():
    wkt = "MULTIPOLYGON(((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 5)))"
    polys = parse_wkt(wkt)
    assert len(polys) == 2


def test_centers_inside_many_edge_path_parity():
    """_centers_inside switches to a sort/searchsorted parity formulation
    above 256 edges — it must agree exactly with the per-edge broadcast
    path on the same high-vertex ring (noisy star, 1,000 vertices, plus
    a 64-vertex hole)."""
    import numpy as np

    from geohash_dotnet_spark.kernels.polygon import _centers_inside

    rng = np.random.default_rng(11)
    t = np.linspace(0, 2 * np.pi, 1001)
    r = 10 + 2 * np.sin(9 * t) + rng.uniform(-0.5, 0.5, t.shape)
    outer = np.column_stack([r * np.cos(t), r * np.sin(t)])
    outer[-1] = outer[0]
    th = np.linspace(0, 2 * np.pi, 65)
    hole = np.column_stack([3 * np.cos(th), 3 * np.sin(th)])
    hole[-1] = hole[0]
    rings = [outer, hole]

    cx = np.linspace(-13, 13, 173)
    cy = np.linspace(-13, 13, 91)
    got = _centers_inside(rings, cx, cy)

    # independent per-edge xor accumulation (the small-E formulation)
    want = np.zeros((cy.shape[0], cx.shape[0]), dtype=bool)
    for ring in rings:
        x1, y1 = ring[:-1, 0], ring[:-1, 1]
        x2, y2 = ring[1:, 0], ring[1:, 1]
        for e in range(x1.shape[0]):
            ax, ay, bx, by = x1[e], y1[e], x2[e], y2[e]
            if ay == by:
                continue
            crosses = (ay > cy) != (by > cy)
            x_int = ax + (cy - ay) * (bx - ax) / (by - ay)
            want ^= crosses[:, None] & (cx[None, :] < x_int[:, None])
    assert got.sum() > 0
    assert np.array_equal(got, want)


def test_edge_hits_batch_path_parity():
    """The batched Liang-Barsky edge path must agree exactly with a
    straightforward per-edge reference on a randomized high-vertex ring
    (mix of tiny and multi-cell edges, horizontal/vertical segments)."""
    import numpy as np

    from geohash_dotnet_spark.kernels.polygon import _edge_hits

    rng = np.random.default_rng(23)
    t = np.linspace(0, 2 * np.pi, 601)
    r = 5 + rng.uniform(-1.5, 1.5, t.shape)
    ring = np.column_stack([10 + r * np.cos(t), 40 + 0.7 * r * np.sin(t)])
    # inject exact horizontal / vertical segments (dx==0 / dy==0 branches)
    ring[10] = ring[9] + [0.0, 0.3]
    ring[20] = ring[19] + [0.4, 0.0]
    ring[-1] = ring[0]

    lat_step, lng_step = 0.17578125, 0.3515625  # p3-ish steps
    lat0 = int(np.floor(ring[:, 1].min() / lat_step)) - 1
    lng0 = int(np.floor(ring[:, 0].min() / lng_step)) - 1
    n_rows = int(np.ceil(ring[:, 1].max() / lat_step)) + 2 - lat0
    n_cols = int(np.ceil(ring[:, 0].max() / lng_step)) + 2 - lng0
    shape = (n_rows, n_cols)

    got_e, got_i = _edge_hits([ring], lat0, lng0, lat_step, lng_step, shape)

    # naive reference (the pre-batching formulation)
    ref_e = np.zeros(shape, dtype=bool)
    ref_i = np.zeros(shape, dtype=bool)
    p1, p2 = ring[:-1], ring[1:]
    for e in range(p1.shape[0]):
        ax, ay = p1[e]
        bx, by = p2[e]
        c0 = max(int(np.floor(min(ax, bx) / lng_step)) - 1 - lng0, 0)
        c1 = min(int(np.floor(max(ax, bx) / lng_step)) + 1 - lng0, n_cols - 1)
        r0 = max(int(np.floor(min(ay, by) / lat_step)) - 1 - lat0, 0)
        r1 = min(int(np.floor(max(ay, by) / lat_step)) + 1 - lat0, n_rows - 1)
        if c0 > c1 or r0 > r1:
            continue
        cols = np.arange(c0, c1 + 1)
        rows = np.arange(r0, r1 + 1)
        x_lo = (cols + lng0) * lng_step
        x_hi = x_lo + lng_step
        y_lo = (rows + lat0) * lat_step
        y_hi = y_lo + lat_step
        dx, dy = bx - ax, by - ay
        u1 = np.zeros((rows.size, cols.size))
        u2 = np.ones((rows.size, cols.size))
        ok = np.ones((rows.size, cols.size), dtype=bool)
        with np.errstate(divide="ignore", invalid="ignore"):
            if dx != 0.0:
                ta = (x_lo[None, :] - ax) / dx
                tb = (x_hi[None, :] - ax) / dx
                u1 = np.maximum(u1, np.minimum(ta, tb))
                u2 = np.minimum(u2, np.maximum(ta, tb))
            else:
                ok &= (ax >= x_lo[None, :]) & (ax <= x_hi[None, :])
            if dy != 0.0:
                ta = (y_lo[:, None] - ay) / dy
                tb = (y_hi[:, None] - ay) / dy
                u1 = np.maximum(u1, np.minimum(ta, tb))
                u2 = np.minimum(u2, np.maximum(ta, tb))
            else:
                ok &= (ay >= y_lo[:, None]) & (ay <= y_hi[:, None])
        hit = ok & (u1 <= u2)
        if not hit.any():
            continue
        ref_e[r0:r1 + 1, c0:c1 + 1] |= hit
        tm = (u1 + u2) * 0.5
        px = ax + tm * dx
        py = ay + tm * dy
        interior = hit & (px > x_lo[None, :]) & (px < x_hi[None, :]) \
                       & (py > y_lo[:, None]) & (py < y_hi[:, None])
        ref_i[r0:r1 + 1, c0:c1 + 1] |= interior

    assert got_e.sum() > 0 and got_i.sum() > 0
    assert np.array_equal(got_e, ref_e)
    assert np.array_equal(got_i, ref_i)
