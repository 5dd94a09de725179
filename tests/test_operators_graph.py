"""Host-graph PageRank: hand-checked tiny graphs, invariants, scale
properties (layout independence, dangling handling, mass accounting)."""

import pytest
from pyspark.sql import functions as F

from geohash_dotnet_spark.operators.graph import (
    R0,
    bfs_reach,
    host_edges,
    pagerank,
)


def _ranks(spark, edges, **kw):
    e = spark.createDataFrame(edges, "src string, dst string")
    return {r["node"]: r["rank"]
            for r in pagerank(e, **kw).collect()}


def test_two_node_cycle_is_uniform(spark):
    # a <-> b: perfect symmetry, every iteration keeps ranks equal
    r = _ranks(spark, [("a", "b"), ("b", "a")], n_iter=3)
    assert r["a"] == r["b"]
    # cycle has no dangling nodes and outdeg 1 everywhere: update is
    # teleport + 85% pass-through, so total mass loses only the two
    # per-node floors per iteration
    assert abs(r["a"] - R0) <= 3 * 2  # <= n_iter * (2 floors/node)


def test_star_sink_outranks_leaves(spark):
    # leaves l0..l3 all link to hub; hub links back to l0 only
    edges = [(f"l{i}", "hub") for i in range(4)] + [("hub", "l0")]
    r = _ranks(spark, edges, n_iter=3)
    assert r["hub"] > r["l0"] > r["l1"]
    assert r["l1"] == r["l2"] == r["l3"]


def test_hand_computed_one_iteration(spark):
    # a->b, a->c, b->c; c dangling. n=3, T=3*R0.
    r = _ranks(spark, [("a", "b"), ("a", "c"), ("b", "c")], n_iter=1)
    teleport = (15 * 3 * R0) // (100 * 3)
    dang = (85 * R0) // (100 * 3)  # c held R0
    half_a = (R0 * 85) // (100 * 2)
    full_b = (R0 * 85) // (100 * 1)
    assert r["a"] == teleport + dang
    assert r["b"] == teleport + dang + half_a
    assert r["c"] == teleport + dang + half_a + full_b


def test_mass_approximately_conserved(spark):
    edges = [(f"n{i}", f"n{(i * 7 + 3) % 11}") for i in range(11)]
    r = _ranks(spark, edges, n_iter=4)
    total = sum(r.values())
    n = len(r)
    # floors leak < n*(2 + max outdeg) units per iteration
    assert 0 <= n * R0 - total < 4 * n * 12


def test_layout_independence(spark, sf_med):
    """Same ranks regardless of input partitioning — the cluster-size
    determinism claim."""
    from geohash_dotnet_spark.sources.pages import pages

    pg = pages(spark, sf_med).withColumn(
        "site", F.regexp_extract("url", r"^https?://[^/]+/([^/]+)/", 1))
    e = host_edges(pg, node="site")
    a = pagerank(e, n_iter=2).orderBy("node").collect()
    b = pagerank(e.repartition(17), n_iter=2).orderBy("node").collect()
    assert a == b


def test_duplicate_edges_collapse(spark):
    # the edge set is distinct (src,dst): repeating an edge changes nothing
    once = _ranks(spark, [("a", "b"), ("b", "a")], n_iter=2)
    thrice = _ranks(spark, [("a", "b")] * 3 + [("b", "a")], n_iter=2)
    assert once == thrice


def test_host_edges_deterministic_and_in_universe(spark, sf_med):
    from geohash_dotnet_spark.sources.pages import pages

    pg = pages(spark, sf_med).withColumn(
        "site", F.regexp_extract("url", r"^https?://[^/]+/([^/]+)/", 1))
    e = host_edges(pg, node="site", fanout=2)
    hosts = {r["site"] for r in pg.select("site").distinct().collect()}
    rows = e.collect()
    assert {r["dst"] for r in rows} <= hosts
    assert {r["src"] for r in rows} <= hosts
    # deterministic: a second build is identical
    again = host_edges(pg, node="site", fanout=2).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_overflow_guard_documented():
    """rank*85 must fit in int64 at the documented node bound."""
    n_max = 10 ** 5
    assert n_max * R0 * 85 < 2 ** 63


@pytest.mark.parametrize("fanout", [1, 3])
def test_host_edges_fanout_bound(spark, sf_small, fanout):
    from geohash_dotnet_spark.sources.pages import pages

    pg = pages(spark, sf_small).withColumn(
        "site", F.regexp_extract("url", r"^https?://[^/]+/([^/]+)/", 1))
    n_pages = pg.count()
    e = host_edges(pg, node="site", fanout=fanout)
    assert e.count() <= n_pages * fanout


# ---------------------------------------------------------------------------
# HITS
# ---------------------------------------------------------------------------

def _hits_map(spark, edges, n_iter):
    from geohash_dotnet_spark.operators.graph import hits

    df = spark.createDataFrame(edges, "src string, dst string")
    return {r["node"]: (r["hub"], r["auth"])
            for r in hits(df, n_iter=n_iter).collect()}


def test_hits_hand_iterations(spark):
    """1->3, 2->3, 3->4 replayed by hand for two max-normalized integer
    iterations: 3 is the sole full authority, 1/2 the full hubs."""
    out = _hits_map(spark, [("1", "3"), ("2", "3"), ("3", "4")], 2)
    assert out == {"1": (1000000, 0), "2": (1000000, 0),
                   "3": (250000, 1000000), "4": (0, 250000)}


def test_hits_star(spark):
    """Star: hub center pointing at k leaves — center is the unit hub,
    every leaf an equal unit authority, stable across iterations."""
    edges = [("c", f"l{i}") for i in range(5)]
    for it in (1, 3):
        out = _hits_map(spark, edges, it)
        assert out["c"] == (1000000, 0)
        assert all(out[f"l{i}"] == (0, 1000000) for i in range(5))


def test_hits_duplicate_edges_collapse(spark):
    a = _hits_map(spark, [("1", "3"), ("1", "3"), ("2", "3")], 2)
    b = _hits_map(spark, [("1", "3"), ("2", "3")], 2)
    assert a == b


def test_hits_normalization_invariant(spark):
    """Max hub == max auth == s0 whenever the graph has any edge."""
    edges = [(f"s{i % 4}", f"d{(i * 7) % 6}") for i in range(18)]
    out = _hits_map(spark, edges, 3)
    assert max(h for h, _ in out.values()) == 1000000
    assert max(a for _, a in out.values()) == 1000000


def test_hits_layout_independent(spark):
    from geohash_dotnet_spark.operators.graph import hits

    edges = [(f"s{i % 5}", f"d{(i * 3) % 7}") for i in range(25)]
    df = spark.createDataFrame(edges, "src string, dst string")
    a = sorted(map(tuple, hits(df, n_iter=2).collect()))
    b = sorted(map(tuple, hits(df.repartition(5, "dst"),
                               n_iter=2).collect()))
    assert a == b


def test_hits_validates_n_iter(spark):
    import pytest

    from geohash_dotnet_spark.operators.graph import hits, hits_sql

    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError):
        hits(df, n_iter=0)
    with pytest.raises(ValueError):
        hits_sql("edges", n_iter=0)


def test_hits_enforces_overflow_bound(spark):
    """A too-large s0 for the node count raises instead of silently
    wrapping the rescale multiply (ADVICE r4)."""
    import pytest

    from geohash_dotnet_spark.operators.graph import hits

    df = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string")
    # 3 nodes * s0^2 >= 2^63  =>  s0 >= sqrt(2^63/3) ~ 1.75e9
    with pytest.raises(ValueError, match="overflow bound"):
        hits(df, n_iter=1, s0=2 * 10 ** 9)
    # and the default s0 still works on the same graph
    assert hits(df, n_iter=1).count() == 3


# ---------------------------------------------------------------------------
# bfs_reach
# ---------------------------------------------------------------------------

def _reach(spark, edges, seeds, **kw):
    e = spark.createDataFrame(edges, "src string, dst string")
    s = spark.createDataFrame([(x,) for x in seeds], "node string")
    return {r["node"]: r["hop"]
            for r in bfs_reach(e, s, **kw).collect()}


def test_reach_chain_and_depth_cut(spark):
    chain = [("a", "b"), ("b", "c"), ("c", "d")]
    assert _reach(spark, chain, ["a"], n_hops=3) == {
        "a": 0, "b": 1, "c": 2, "d": 3}
    # depth-2 crawl never discovers d
    assert _reach(spark, chain, ["a"], n_hops=2) == {
        "a": 0, "b": 1, "c": 2}


def test_reach_min_hop_on_diamond(spark):
    # two length-2 paths to d -> d appears once, at hop 2
    edges = [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("d", "e")]
    assert _reach(spark, edges, ["a"], n_hops=3) == {
        "a": 0, "b": 1, "c": 1, "d": 2, "e": 3}


def test_reach_cycle_saturates_and_stops(spark):
    # a <-> b plus an unreachable island x->y: saturation after round 1
    edges = [("a", "b"), ("b", "a"), ("x", "y")]
    assert _reach(spark, edges, ["a"], n_hops=5) == {"a": 0, "b": 1}


def test_reach_multi_seed_takes_minimum(spark):
    chain = [("a", "b"), ("b", "c"), ("c", "d")]
    assert _reach(spark, chain, ["a", "c"], n_hops=3) == {
        "a": 0, "b": 1, "c": 0, "d": 1}


def test_reach_seed_shortcut_beats_longer_path(spark):
    # c is a seed AND reachable from a in 2 — label-setting keeps 0
    edges = [("a", "b"), ("b", "c")]
    assert _reach(spark, edges, ["a", "c"], n_hops=3)["c"] == 0


def test_reach_validates_n_hops(spark):
    with pytest.raises(ValueError):
        _reach(spark, [("a", "b")], ["a"], n_hops=0)


def test_reach_matches_duckdb_twin(spark):
    """Value parity on the pages-derived host graph with hash-chosen
    seeds (the q_host_reach shape) at sf0.001."""
    import duckdb

    from geohash_dotnet_spark.functions.oracle import pages_sql
    from geohash_dotnet_spark.operators.dedup import (md5_60bit,
                                                      md5_60bit_sql)
    from geohash_dotnet_spark.operators.graph import (bfs_reach_sql,
                                                      host_edges_sql)
    from geohash_dotnet_spark.sources.pages import pages

    pg = pages(spark, "/root/testdata/sf0.001")
    sites = (pg.select(F.regexp_extract(
        "url", r"^https?://[^/]+/([^/]+)/", 1).alias("site")).distinct())
    e = host_edges(sites, node="site", key="site", fanout=3)
    seeds = (sites.select(F.col("site").alias("node"))
             .where(F.pmod(md5_60bit(F.col("node")), F.lit(7)) == 0))
    got = sorted((r["node"], r["hop"])
                 for r in bfs_reach(e, seeds, n_hops=3).collect())
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                "'/root/testdata/sf0.001/documents.parquet'")
    sites_sql = (f"SELECT DISTINCT regexp_extract(url, "
                 f"'^https?://[^/]+/([^/]+)/', 1) AS site "
                 f"FROM ({pages_sql(1)})")
    seeds_sql = (f"SELECT site AS node FROM ({sites_sql}) "
                 f"WHERE ({md5_60bit_sql('site')}) % 7 = 0")
    exp = sorted(tuple(r) for r in con.execute(
        bfs_reach_sql(host_edges_sql(sites_sql, node="site", key="site"),
                      seeds_sql, n_hops=3)).fetchall())
    assert got == exp and len(got) > 0


def test_reach_layout_invariant(spark):
    edges = [(f"n{i}", f"n{(i * 7 + 3) % 40}") for i in range(40)]
    e = spark.createDataFrame(edges, "src string, dst string")
    s = spark.createDataFrame([("n0",), ("n13",)], "node string")
    a = sorted(map(tuple, bfs_reach(e, s, n_hops=4).collect()))
    b = sorted(map(tuple, bfs_reach(e.repartition(13), s.coalesce(1),
                                    n_hops=4).collect()))
    assert a == b
