"""Getis-Ord Gi* tile hotspots (operators/hotspots.py)."""

import math

import pytest
from pyspark.sql import functions as F

from geohash_dotnet_spark.kernels import geohash as G
from geohash_dotnet_spark.operators import focal_hotspots


def _numpy_gi_star(cells: dict[str, int]) -> dict[str, float]:
    """Independent scalar reference: Gi* with binary queen weights
    (kernel neighbors + self, restricted to occupied cells)."""
    n = len(cells)
    xs = list(cells.values())
    mean = sum(xs) / n
    s = math.sqrt(sum(x * x for x in xs) / n - mean * mean)
    out = {}
    for c, x in cells.items():
        hood = [v[0] for v in G.neighbors(c).values()] + [c]
        occ = [h for h in hood if h in cells]
        w = len(occ)
        wx = sum(cells[h] for h in occ)
        denom = s * math.sqrt((n * w - w * w) / (n - 1))
        z = (wx - mean * w) / denom
        out[c] = math.floor(z * 1e6 + 0.5) / 1e6
    return out


@pytest.fixture(scope="module")
def planted(spark):
    """A 5x5 block of occupied p3 tiles around u33, one dense center."""
    block = ["u33"]
    ring1 = [v[0] for v in G.neighbors("u33").values()]
    ring2 = sorted({v[0] for c in ring1 for v in G.neighbors(c).values()}
                   - set(ring1) - {"u33"})
    # Gi* is a CLUSTER statistic: one extreme tile inflates the global
    # stddev faster than its own neighborhood sum, so the plant is a
    # dense 3x3 block (100 each) against a uniform far ring (10 each)
    cells = {c: 10 for c in ring2}
    cells.update({c: 100 for c in ["u33"] + ring1})
    df = spark.createDataFrame(list(cells.items()), ["gh", "n"])
    return cells, focal_hotspots(df).orderBy("gh").collect()


def test_gi_star_matches_scalar_reference(planted):
    cells, rows = planted
    expect = _numpy_gi_star(cells)
    assert len(rows) == len(cells)
    for r in rows:
        assert r["gi_z"] == pytest.approx(expect[r["gh"]], abs=2e-6), r["gh"]


def test_planted_center_is_the_hotspot(planted):
    cells, rows = planted
    by = {r["gh"]: r for r in rows}
    # the dense tile and only its contiguous neighborhood go hot
    assert by["u33"]["hot"] == 1
    hot = {gh for gh, r in by.items() if r["hot"] == 1}
    hood = {v[0] for v in G.neighbors("u33").values()} | {"u33"}
    assert hot <= hood and "u33" in hot
    # far ring tiles score below: uniform field, negative-or-small z
    ring2 = set(cells) - hood
    assert all(by[gh]["gi_z"] < 2.0 for gh in ring2)


def test_global_moments_are_broadcast(spark):
    """The 1-row global-stats side joins as a broadcast, never a
    cartesian of the tile table."""
    cells = [(f"u3{c}", i + 1) for i, c in enumerate("0123456789bcdefg")]
    df = spark.createDataFrame(cells, ["gh", "n"])
    plan = (focal_hotspots(df)._jdf.queryExecution()
            .executedPlan().toString())
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def _scalar_moran(cells: dict[str, int]):
    n = len(cells)
    mean = sum(cells.values()) / n
    edges = [(a, b[0]) for a in cells for b in G.neighbors(a).values()
             if b[0] in cells and b[0] != a]
    W = len(edges)
    num = sum((cells[a] - mean) * (cells[b] - mean) for a, b in edges)
    den = sum((x - mean) ** 2 for x in cells.values())
    i_val = (n / W) * num / den
    e_val = -1.0 / (n - 1)
    deg = {}
    for a, _ in edges:
        deg[a] = deg.get(a, 0) + 1
    s1, s2 = 2.0 * W, 4.0 * sum(d * d for d in deg.values())
    var_n = ((n * n * s1 - n * s2 + 3.0 * W * W)
             / ((n * n - 1.0) * W * W)) - e_val * e_val
    return i_val, e_val, (i_val - e_val) / math.sqrt(var_n)


def test_moran_matches_scalar_reference_and_detects_cluster(spark, planted):
    from geohash_dotnet_spark.operators import moran_i

    cells, _ = planted
    df = spark.createDataFrame(list(cells.items()), ["gh", "n"])
    row = moran_i(df).collect()[0]
    i_ref, e_ref, z_ref = _scalar_moran(cells)
    assert row["moran_i"] == pytest.approx(i_ref, abs=2e-6)
    assert row["e_i"] == pytest.approx(e_ref, abs=2e-6)
    assert row["z_norm"] == pytest.approx(z_ref, abs=2e-6)
    # a planted dense block against a uniform ring is strong positive
    # spatial autocorrelation
    assert row["moran_i"] > 0.15 and row["z_norm"] > 2.0
