"""Hilbert-curve layout (operators/layout.py)."""

import pytest
from pyspark.sql import functions as F

from geohash_dotnet_spark.operators.layout import hilbert_shards, with_hilbert
from geohash_dotnet_spark.sources.pages import pages

SF = "/root/testdata/sf0.001"


def _xy2d(n: int, x: int, y: int) -> int:
    """Pure-Python reference (classic public-domain xy2d)."""
    d, s = 0, n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = n - 1 - x, n - 1 - y
            x, y = y, x
        s //= 2
    return d


def _grid_df(spark, order: int):
    """One point at the center of every 2^order x 2^order grid cell."""
    n = 1 << order
    rows = [(-90.0 + (y + 0.5) * 180.0 / n,
             -180.0 + (x + 0.5) * 360.0 / n, x, y)
            for x in range(n) for y in range(n)]
    return spark.createDataFrame(rows, "lat double, lon double, x int, y int")


def test_matches_reference_and_is_a_bijection(spark):
    order, n = 3, 8
    got = {(r["x"], r["y"]): r["hd"]
           for r in with_hilbert(_grid_df(spark, order), order=order).collect()}
    ref = {(x, y): _xy2d(n, x, y) for x in range(n) for y in range(n)}
    assert got == ref
    assert sorted(got.values()) == list(range(n * n))


def test_consecutive_cells_are_edge_adjacent(spark):
    """The defining Hilbert property: d and d+1 are grid neighbors
    (|dx| + |dy| == 1) — what makes contiguous ranges connected."""
    order, n = 4, 16
    by_d = {r["hd"]: (r["x"], r["y"])
            for r in with_hilbert(_grid_df(spark, order), order=order).collect()}
    for d in range(n * n - 1):
        (x1, y1), (x2, y2) = by_d[d], by_d[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1


def test_hilbert_shards_beat_row_major_locality(spark):
    """Per-shard spatial diameter (L1 bbox extent in grid units) is
    smaller under Hilbert ranges than row-major ranges — the reason to
    lay files out along the curve. Exhaustive order-5 grid, 16 shards:
    Hilbert shards are 8x16 blocks (diameter 22), row-major shards are
    2 full rows (diameter 32+1)."""
    order, n, n_shards = 5, 32, 16
    total = n * n
    df = with_hilbert(_grid_df(spark, order), order=order)
    df = df.withColumn("rm", F.col("y") * n + F.col("x"))

    def mean_diameter(col):
        shard = F.floor(F.col(col) * n_shards / total)
        agg = (df.groupBy(shard.alias("s"))
               .agg((F.max("x") - F.min("x") + F.max("y") - F.min("y"))
                    .alias("diam")))
        return agg.agg(F.avg("diam")).collect()[0][0]

    h, r = mean_diameter("hd"), mean_diameter("rm")
    assert h < r, f"hilbert diameter {h} not below row-major {r}"
    assert h <= 24  # 8x16 block -> 7 + 15 = 22


def test_shards_partition_the_corpus(spark):
    pg = pages(spark, SF)
    out = hilbert_shards(pg, order=8, n_shards=64).collect()
    assert sum(r["n_pages"] for r in out) == pg.count()
    assert all(0 <= r["shard"] < 64 for r in out)
    assert all(r["n_cells"] <= r["n_pages"] for r in out)


def test_validation(spark):
    with pytest.raises(ValueError):
        with_hilbert(None, order=0)
    with pytest.raises(ValueError):
        with_hilbert(None, order=17)
    with pytest.raises(ValueError):
        hilbert_shards(None, n_shards=0)


def test_index_is_python_free_single_scan(spark):
    """The Hilbert index is staged JVM column math: no Python/Arrow
    eval nodes anywhere, one scan, one aggregate exchange."""
    spark.catalog.clearCache()  # cached-pages substitution hides the scan
    out = hilbert_shards(pages(spark, SF), order=8, n_shards=64)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert plan.count("Scan parquet") == 1  # matches "FileScan parquet" too
