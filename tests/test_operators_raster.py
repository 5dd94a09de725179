"""Raster <-> vector (operators/raster.py: rasterize / hot_regions)."""

import pytest

from geohash_dotnet_spark.operators import hot_regions, rasterize

CELL = 1_000_000  # 1-degree cells: n_rows=180, n_cols=360
N_COLS = 360


def _pts(spark, cells, per_cell=2):
    """per_cell points at the center of each 1-degree (row, col) cell."""
    rows = [(f"u{r}_{c}_{i}", (r + 0.5) - 90.0, (c + 0.5) - 180.0)
            for (r, c) in cells for i in range(per_cell)]
    return spark.createDataFrame(rows, "url string, lat double, lon double")


def cid(r, c):
    return r * N_COLS + c


def test_rasterize_counts_and_edges(spark):
    df = spark.createDataFrame(
        [("a", 10.5, 20.5), ("b", 10.5, 20.5), ("c", 10.9, 20.1),
         ("np", 90.0, 0.5),     # north-pole edge clamps into top row
         ("sp", -90.0, 0.5),    # south edge is row 0
         ("am", 0.5, 180.0),    # lon 180 wraps to col 0
         ("wm", 0.5, -180.0)],  # same column as lon 180
        "url string, lat double, lon double")
    out = {(r["row"], r["col"]): r["n_pages"]
           for r in rasterize(df, cell_udeg=CELL).collect()}
    assert out[(100, 200)] == 3
    assert out[(179, 180)] == 1
    assert out[(0, 180)] == 1
    assert out[(90, 0)] == 2  # both antimeridian points share the cell


def test_hot_regions_l_shape_and_singleton(spark):
    cells = [(100, 50), (100, 51), (101, 50)]      # L-shaped region
    df = _pts(spark, cells, per_cell=2).union(
        _pts(spark, [(100, 52)], per_cell=1)).union(   # below threshold
        _pts(spark, [(150, 200)], per_cell=2))          # isolated hot cell
    out = {r["region_id"]: r.asDict()
           for r in hot_regions(df, cell_udeg=CELL, min_pages=2).collect()}
    assert set(out) == {cid(100, 50), cid(150, 200)}
    a = out[cid(100, 50)]
    assert (a["n_cells"], a["n_pages"]) == (3, 6)
    assert (a["min_row"], a["max_row"], a["min_col"], a["max_col"]) \
        == (100, 101, 50, 51)
    b = out[cid(150, 200)]
    assert (b["n_cells"], b["n_pages"]) == (1, 2)
    assert (b["min_row"], b["max_row"], b["min_col"], b["max_col"]) \
        == (150, 150, 200, 200)


def test_hot_regions_diagonal_not_connected(spark):
    """Rook adjacency: diagonal contact does not merge."""
    df = _pts(spark, [(10, 10), (11, 11)])
    out = hot_regions(df, cell_udeg=CELL, min_pages=2).collect()
    assert sorted(r["region_id"] for r in out) == [cid(10, 10), cid(11, 11)]
    assert all(r["n_cells"] == 1 for r in out)


def test_hot_regions_antimeridian_seam_merges(spark):
    """Last column is modularly adjacent to column 0: a region crossing
    the seam is ONE component with the full-width col range."""
    df = _pts(spark, [(20, 359), (20, 0)])
    out = hot_regions(df, cell_udeg=CELL, min_pages=2).collect()
    assert len(out) == 1
    r = out[0]
    assert r["region_id"] == cid(20, 0)
    assert (r["n_cells"], r["min_col"], r["max_col"]) == (2, 0, 359)


def test_hot_regions_matches_oracle_on_pages(spark, sf_small):
    import duckdb

    from geohash_dotnet_spark.functions.oracle import pages_sql
    from geohash_dotnet_spark.operators.raster import hot_regions_sql
    from geohash_dotnet_spark.sources.pages import pages

    pg = pages(spark, sf_small, replicate=8)
    got = sorted(tuple(r) for r in
                 hot_regions(pg, cell_udeg=10_000_000, min_pages=2).collect())
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf_small}/documents.parquet')")
    want = sorted(tuple(r) for r in con.sql(
        hot_regions_sql(pages_sql(8), cell_udeg=10_000_000,
                        min_pages=2)).fetchall())
    assert got and got == want


def test_raster_plans_jvm_only(spark):
    """Rasterize is one exchange; the whole region pipeline stays
    JVM-side (CC is joins, no Python eval nodes)."""
    df = _pts(spark, [(10, 10), (10, 11)])
    r = rasterize(df, cell_udeg=CELL)
    rp = r._jdf.queryExecution().executedPlan().toString()
    assert rp.split("Initial Plan")[0].count("Exchange hashpartitioning") == 1
    h = hot_regions(df, cell_udeg=CELL, min_pages=2)
    hp = h._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in hp and "ArrowEvalPython" not in hp


def test_raster_validation(spark):
    with pytest.raises(ValueError):
        rasterize(None, cell_udeg=0)
    with pytest.raises(ValueError):
        rasterize(None, cell_udeg=90_000_001)
    with pytest.raises(ValueError):
        hot_regions(None, min_pages=0)
