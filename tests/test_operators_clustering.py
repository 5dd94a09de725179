"""Grid-density spatial clustering (operators/clustering.py)."""

from pyspark.sql import functions as F

from geohash_dotnet_spark.functions.tiles import tile_lat_bounds
from geohash_dotnet_spark.operators import tile_density_clusters


def _tile_center(x, y, z):
    n = 1 << z
    bounds = tile_lat_bounds(z)
    lat = (bounds[y] + bounds[y + 1]) / 2.0
    lon = -180.0 + (x + 0.5) * 360.0 / n
    return lat, lon


def _points_df(spark, z, cells):
    """cells: list of (x, y, count) — count points at the tile center."""
    rows = []
    for x, y, c in cells:
        lat, lon = _tile_center(x, y, z)
        rows += [(lat, lon)] * c
    return spark.createDataFrame(rows, "lat double, lon double")


def _clusters(out):
    """{cluster_id: frozenset of (x, y)}"""
    by = {}
    for r in out:
        by.setdefault(r["cluster_id"], set()).add((r["x"], r["y"]))
    return {k: frozenset(v) for k, v in by.items()}


def test_two_blobs_and_a_singleton(spark):
    """Two separated dense blobs + one isolated dense tile = 3 clusters
    with the expected memberships; a sparse tile is dropped entirely."""
    z = 4
    cells = [
        (1, 1, 5), (2, 1, 7), (2, 2, 5),   # blob A (diagonal touch)
        (8, 8, 5), (8, 9, 6),              # blob B
        (12, 2, 5),                        # singleton
        (5, 5, 2),                         # below min_count: dropped
    ]
    out = tile_density_clusters(_points_df(spark, z, cells), z=z,
                                min_count=5).collect()
    assert {(r["x"], r["y"]) for r in out} == {
        (1, 1), (2, 1), (2, 2), (8, 8), (8, 9), (12, 2)}
    comps = set(_clusters(out).values())
    assert comps == {frozenset({(1, 1), (2, 1), (2, 2)}),
                     frozenset({(8, 8), (8, 9)}),
                     frozenset({(12, 2)})}
    sizes = {(r["x"], r["y"]): r["cluster_size"] for r in out}
    assert sizes[(1, 1)] == 3 and sizes[(8, 8)] == 2 and sizes[(12, 2)] == 1


def test_antimeridian_wrap_joins_edge_tiles(spark):
    """Dense tiles in the first and last columns of the same row are
    8-neighbors across the antimeridian — one cluster."""
    z = 4
    n = 1 << z
    out = tile_density_clusters(
        _points_df(spark, z, [(0, 7, 5), (n - 1, 7, 5)]), z=z,
        min_count=5).collect()
    assert len(out) == 2
    assert len({r["cluster_id"] for r in out}) == 1
    assert all(r["cluster_size"] == 2 for r in out)


def test_sparse_tile_does_not_bridge(spark):
    """A below-threshold tile between two dense tiles must NOT merge
    them (density-reachability, the DBSCAN core rule)."""
    z = 4
    out = tile_density_clusters(
        _points_df(spark, z, [(3, 3, 5), (4, 3, 2), (5, 3, 5)]), z=z,
        min_count=5).collect()
    assert len(out) == 2
    assert len({r["cluster_id"] for r in out}) == 2


def test_long_chain_converges_by_pointer_jumping(spark):
    """A 24-tile snake (graph diameter 23) converges well inside
    max_iter because the jump step squares the pointer per round."""
    z = 6
    cells = [(x, 10, 5) for x in range(4, 28)]
    out = tile_density_clusters(_points_df(spark, z, cells), z=z,
                                min_count=5).collect()
    assert len(out) == 24
    assert len({r["cluster_id"] for r in out}) == 1
    assert all(r["cluster_size"] == 24 for r in out)


def test_layout_independent(spark):
    """Same clusters regardless of input partitioning."""
    z = 4
    cells = [(1, 1, 5), (2, 1, 7), (8, 8, 5), (8, 9, 6), (12, 2, 5)]
    df = _points_df(spark, z, cells)
    a = sorted((r["x"], r["y"], r["cluster_id"], r["cluster_size"])
               for r in tile_density_clusters(df, z=z, min_count=5)
               .collect())
    b = sorted((r["x"], r["y"], r["cluster_id"], r["cluster_size"])
               for r in tile_density_clusters(df.repartition(7), z=z,
                                              min_count=5).collect())
    assert a == b
