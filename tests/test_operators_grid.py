"""Viewport grid enumeration vs the reference playground semantics
(/root/reference/playground/PlaygroundGeo.cs:19-78)."""

import math

import pytest
from pyspark.sql import functions as F

from geohash_dotnet_spark.kernels import encode, lat_lng_steps
from geohash_dotnet_spark.operators import gh_grid, pick_grid_precision


def test_world_p1_is_32_octant_cells(spark):
    rows = gh_grid(spark, -90, -180, 90, 180, 1, 100).collect()
    assert len(rows) == 32
    cells = sorted(r["cell"] for r in rows)
    assert cells == sorted("0123456789bcdefghjkmnpqrstuvwxyz")
    for r in rows:
        assert r["max_lat"] - r["min_lat"] == 45.0
        assert r["max_lng"] - r["min_lng"] == 45.0


def test_grid_cells_match_reference_enumeration(spark):
    """Row-major truncation + center encode, exactly as EnumerateGrid."""
    s, w, n, e, p, max_cells = 40.0, -75.5, 42.0, -72.0, 5, 500
    got = [(r["cell"], r["min_lat"], r["min_lng"], r["max_lat"], r["max_lng"])
           for r in gh_grid(spark, s, w, n, e, p, max_cells)
           .orderBy("min_lat", "min_lng").collect()]

    lat_step, lng_step = lat_lng_steps(p)
    lat_start = math.floor(max(s, -90.0) / lat_step)
    lat_end = math.ceil(min(n, 90.0) / lat_step)
    lng_start = math.floor(w / lng_step)
    lng_end = math.ceil(e / lng_step)
    exp = []
    for li in range(lat_start, lat_end):
        cs = li * lat_step
        cn = cs + lat_step
        if cn <= -90.0 or cs >= 90.0:
            continue
        for gi in range(lng_start, lng_end):
            if len(exp) >= max_cells:
                break
            cw = gi * lng_step
            h = encode([cs + lat_step * 0.5], [cw + lng_step * 0.5], p)[0]
            exp.append((h, cs, cw, cn, cw + lng_step))
    assert got == sorted(exp, key=lambda t: (t[1], t[2]))


def test_truncates_row_major_at_max_cells(spark):
    df = gh_grid(spark, -90, -180, 90, 180, 3, 100)
    rows = df.orderBy("min_lat", "min_lng").collect()
    assert len(rows) == 100
    # row-major: the 100 kept cells are the southernmost rows
    lat_step, _ = lat_lng_steps(3)
    assert all(r["min_lat"] < -90.0 + 2 * lat_step for r in rows)


def test_antimeridian_viewport_wraps_cells(spark):
    """Longitudes > 180 stay on the viewed world copy; hashes normalize."""
    rows = gh_grid(spark, -5, 170, 5, 190, 2, 1000).collect()
    assert any(r["min_lng"] >= 180.0 for r in rows)
    west_of_line = {r["cell"] for r in rows if r["min_lng"] >= 180.0}
    # cells east of +180 re-enter the western hemisphere block of the grid
    assert west_of_line and all(len(c) == 2 for c in west_of_line)


def test_pick_grid_precision_monotone_budget():
    assert pick_grid_precision(-90, -180, 90, 180, 10) == 1
    assert pick_grid_precision(-90, -180, 90, 180, 2000) >= 2
    p_small = pick_grid_precision(40, -75, 41, -74, 100)
    p_big = pick_grid_precision(40, -75, 41, -74, 100_000)
    assert p_big > p_small


def test_no_python_nodes_in_grid_plan(spark):
    plan = (gh_grid(spark, 0, 0, 10, 10, 4, 10_000)
            ._jdf.queryExecution().executedPlan().toString())
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan
