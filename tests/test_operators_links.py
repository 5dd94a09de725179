"""Outlink extraction + host-graph build (operators/links.py)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from geohash_dotnet_spark.functions.oracle import pages_sql
from geohash_dotnet_spark.operators.links import (
    extract_links, link_host_edges, link_host_edges_sql,
    planted_anchors_sql, with_planted_anchors)
from geohash_dotnet_spark.sources.pages import pages

SF = "/root/testdata/sf0.001"


def _html_df(spark, rows):
    return (spark.createDataFrame(rows, "url string, html_s string")
            .withColumn("html", F.encode("html_s", "utf-8"))
            .drop("html_s"))


def test_extract_known_page(spark):
    html = ('<html><body>hello <a href="https://a.example/x">one</a> '
            'mid <a href="/relative/path">two</a> and '
            '<a href="http://b.example/y?q=1">three</a></body></html>')
    out = (extract_links(_html_df(spark, [("u1", html)]))
           .orderBy("pos").collect())
    assert [(r["pos"], r["link"], r["link_host"]) for r in out] == [
        (0, "https://a.example/x", "a.example"),
        (1, "/relative/path", ""),
        (2, "http://b.example/y?q=1", "b.example"),
    ]


def test_extract_no_anchors_emits_nothing(spark):
    out = extract_links(_html_df(spark, [
        ("u1", "<html><body>plain text, no anchors</body></html>"),
        ("u2", '<html><body>an <a name="x">anchor tag</a> without '
               "href</body></html>")])).collect()
    assert out == []


def test_planted_anchor_counts_match_rule(spark):
    """Each page carries md5_60bit(url) % (max_links+1) anchors —
    including genuinely zero-anchor pages."""
    from geohash_dotnet_spark.operators.dedup import md5_60bit

    pg = with_planted_anchors(pages(spark, SF), max_links=3)
    got = (extract_links(pg).groupBy("url")
           .agg(F.count(F.lit(1)).alias("n")))
    exp = pg.select("url", F.pmod(md5_60bit(F.col("url")), F.lit(4))
                    .alias("n_exp"))
    j = exp.join(got, "url", "left").collect()
    assert len(j) == pg.count()
    zero = 0
    for r in j:
        if r["n_exp"] == 0:
            assert r["n"] is None
            zero += 1
        else:
            assert r["n"] == r["n_exp"]
    assert zero > 0  # the zero-anchor branch is genuinely exercised


def test_edges_match_duckdb_twin(spark):
    """Full value parity: Spark binary-html extraction vs the DuckDB
    string replay, src host taken from the url path segment so the
    graph has many sources."""
    src_re = "https?://[^/]+/([^/]+)"
    pg = with_planted_anchors(pages(spark, SF, replicate=2))
    out = (link_host_edges(pg, src_host_re=src_re)
           .orderBy("src_host", "dst_host").toPandas())
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"'{SF}/documents.parquet'")
    o = con.execute(
        link_host_edges_sql(planted_anchors_sql(pages_sql(2)),
                            src_host_re=src_re)
        + " ORDER BY src_host, dst_host").df()
    assert len(out) == len(o) > 50
    assert out.reset_index(drop=True).equals(o.reset_index(drop=True))


def test_edges_plan_shape_no_python(spark):
    """Extraction is a codegen projection: two exchanges total (the
    corpus-scale per-(edge, page) partial aggregate, then the
    host-pair-keyed rollup), the html payload never crosses either,
    and no Python worker anywhere."""
    pg = with_planted_anchors(pages(spark, SF))
    out = link_host_edges(pg)
    out.collect()
    head = (out._jdf.queryExecution().executedPlan().toString()
            .split("Initial Plan")[0])
    assert head.count("Exchange hashpartitioning") == 2
    assert "BatchEvalPython" not in head and "ArrowEvalPython" not in head
    for ln in head.splitlines():
        if "Exchange" in ln:
            assert "html" not in ln


def test_validation():
    with pytest.raises(ValueError):
        with_planted_anchors(None, max_links=0)
    with pytest.raises(ValueError):
        with_planted_anchors(None, n_hosts=0)


# ---------------------------------------------------------------------------
# anchor-text extraction + index
# ---------------------------------------------------------------------------

def test_extract_anchor_texts_known_page(spark):
    from geohash_dotnet_spark.operators.links import extract_anchor_texts

    html = ('<html><body><a href="https://a.example/x">City Maps</a> '
            '<a href="/rel">local</a> '
            '<a href="http://b.example/y"></a>'
            '<a href="https://c.example/z">one  two</a></body></html>')
    out = (extract_anchor_texts(_html_df(spark, [("u1", html)]))
           .orderBy("pos").collect())
    assert [(r["pos"], r["link_host"], r["anchor"]) for r in out] == [
        (0, "a.example", "City Maps"),
        (1, "", "local"),
        (2, "b.example", ""),      # empty anchor text kept at this layer
        (3, "c.example", "one  two"),
    ]


def test_anchor_term_index_hand_counts(spark):
    """Terms lowercase + whitespace-split; empty anchors and relative
    links drop; n_src_hosts counts DISTINCT source hosts (the
    link-farm-resistant count)."""
    from geohash_dotnet_spark.operators.links import anchor_term_index

    a = '<a href="https://t.example/p">City Maps</a>'
    b = '<a href="https://t.example/q">maps</a>'
    rows = [
        ("https://s1.example/a", f"<html><body>{a}</body></html>"),
        ("https://s1.example/b", f"<html><body>{b}</body></html>"),
        ("https://s2.example/c", f"<html><body>{b}{b}</body></html>"),
        ("https://s3.example/d", '<html><body><a href="/rel">maps</a>'
                                 '<a href="https://t.example/r"></a>'
                                 "</body></html>"),
    ]
    out = {(r["dst_host"], r["term"]): (r["n_links"], r["n_src_hosts"])
           for r in anchor_term_index(_html_df(spark, rows)).collect()}
    assert out == {
        ("t.example", "city"): (1, 1),
        ("t.example", "maps"): (4, 2),   # s1: 1+1, s2: 2 -> hosts {s1, s2}
    }


def test_rich_planted_anchor_vocab_and_twin(spark):
    """Rich planting is deterministic and byte-identical to its DuckDB
    twin; the full extract+index pipeline value-matches end-to-end."""
    from geohash_dotnet_spark.operators.links import (
        ANCHOR_VOCAB, anchor_term_index, anchor_term_index_sql,
        planted_rich_anchors_sql, with_planted_rich_anchors)

    pg = with_planted_rich_anchors(pages(spark, SF))
    got = sorted(tuple(r) for r in anchor_term_index(
        pg, src_host_re="https?://[^/]+/([^/]+)").collect())
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF}/documents.parquet')")
    want = sorted(tuple(r) for r in con.sql(anchor_term_index_sql(
        planted_rich_anchors_sql(pages_sql(1)),
        src_host_re="https?://[^/]+/([^/]+)")).fetchall())
    assert got and got == want
    assert {t for _, t, _, _ in got} <= set(ANCHOR_VOCAB)


def test_anchor_index_html_not_through_exchange(spark):
    """The html payload dies in the scan stage: no Exchange row type
    carries the binary column; no Python eval nodes anywhere."""
    from geohash_dotnet_spark.operators.links import (
        anchor_term_index, with_planted_rich_anchors)

    pg = with_planted_rich_anchors(pages(spark, SF))
    out = anchor_term_index(pg, src_host_re="https?://[^/]+/([^/]+)")
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("Initial Plan")[0]
    assert "BatchEvalPython" not in final
    assert "ArrowEvalPython" not in final
    for ln in final.splitlines():
        if "Exchange" in ln:
            assert "html" not in ln, ln


def test_rich_planting_validation(spark):
    from geohash_dotnet_spark.operators.links import (
        with_planted_rich_anchors)

    with pytest.raises(ValueError):
        with_planted_rich_anchors(None, max_links=0)


# ---------------------------------------------------------------------------
# link_locality (geographic link locality)
# ---------------------------------------------------------------------------

def test_link_locality_hand_bands(spark):
    """Two pages 1 degree of latitude apart (~111.2 km): A links to B
    (band 0 under band_m=1e6), B links to itself (distance 0, band 0);
    A also links off-corpus (dropped by the resolve join)."""
    from geohash_dotnet_spark.operators.links import link_locality

    df = (spark.createDataFrame(
        [("https://x/a", 0.0, 0.0,
          '<a href="https://x/b">b</a><a href="https://gone/z">z</a>'),
         ("https://x/b", 1.0, 0.0, '<a href="https://x/b">self</a>')],
        "url string, lat double, lon double, html_s string")
        .withColumn("html", F.encode("html_s", "utf-8")).drop("html_s"))
    out = link_locality(df, band_m=1_000_000, n_bands=5).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["band"], r["n_links"], r["n_src_urls"]) == (0, 2, 2)
    # mean of ~111.195 km and 0 km
    assert 50.0 < r["mean_km"] < 60.0


def test_link_locality_overflow_band(spark):
    """Antipodal-ish pages land in the overflow band n_bands."""
    from geohash_dotnet_spark.operators.links import link_locality

    df = (spark.createDataFrame(
        [("https://x/a", 0.0, 0.0, '<a href="https://x/b">b</a>'),
         ("https://x/b", 0.0, 179.0, "")],
        "url string, lat double, lon double, html_s string")
        .withColumn("html", F.encode("html_s", "utf-8")).drop("html_s"))
    out = link_locality(df, band_m=1_000_000, n_bands=5).collect()
    assert len(out) == 1 and out[0]["band"] == 5


def test_link_locality_matches_duckdb_twin(spark):
    """Full value parity at sf0.001 x2 replicas: Spark binary-html
    extraction + corpus self-join vs the DuckDB string replay with
    two url joins — band counts AND the mm-exact mean_km must hash
    identically (bit-exact doubles)."""
    import pandas as pd

    from geohash_dotnet_spark.operators.links import (
        link_locality, link_locality_sql, planted_local_anchors_sql,
        with_planted_local_anchors)

    rep = 2
    pg = with_planted_local_anchors(pages(spark, SF, replicate=rep),
                                    replicate=rep)
    out = (link_locality(pg, band_m=2_000_000, n_bands=8)
           .orderBy("band").toPandas())
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"'{SF}/documents.parquet'")
    o = con.execute(link_locality_sql(
        planted_local_anchors_sql(pages_sql(rep), replicate=rep),
        pages_sql(rep), band_m=2_000_000, n_bands=8)
        + " ORDER BY band").df()
    assert len(out) > 3
    pd.testing.assert_frame_equal(out.reset_index(drop=True),
                                  o.reset_index(drop=True),
                                  check_dtype=False)


def test_link_locality_all_planted_links_resolve(spark):
    """Every planted absolute href targets a sibling replica that
    exists in the corpus, so the resolve join drops nothing: total
    n_links equals the extracted absolute-link count."""
    from geohash_dotnet_spark.operators.links import (
        extract_links, link_locality, with_planted_local_anchors)

    rep = 3
    pg = with_planted_local_anchors(pages(spark, SF, replicate=rep),
                                    replicate=rep)
    n_ex = (extract_links(pg)
            .where(F.col("link").rlike("^https?://")).count())
    n_in = (link_locality(pg).agg(F.sum("n_links")).collect()[0][0])
    assert n_ex == n_in > 0


def test_link_locality_plan_html_dies_in_scan(spark):
    """The html payload never crosses an Exchange; no Python eval
    nodes; the resolve join is a real equi-join (no BNLJ)."""
    from geohash_dotnet_spark.operators.links import (
        link_locality, with_planted_local_anchors)

    pg = with_planted_local_anchors(pages(spark, SF, replicate=2),
                                    replicate=2)
    out = link_locality(pg)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("Initial Plan")[0]
    assert "BatchEvalPython" not in final
    assert "ArrowEvalPython" not in final
    assert "BroadcastNestedLoopJoin" not in final
    assert "CartesianProduct" not in final
    for ln in final.splitlines():
        if "Exchange" in ln:
            assert "html" not in ln, ln


def test_link_locality_validation(spark):
    from geohash_dotnet_spark.operators.links import (
        link_locality, with_planted_local_anchors)

    with pytest.raises(ValueError):
        link_locality(None, band_m=0)
    with pytest.raises(ValueError):
        link_locality(None, n_bands=0)
    with pytest.raises(ValueError):
        with_planted_local_anchors(None, replicate=0)


# ---------------------------------------------------------------------------
# frontier_hosts (crawl frontier discovery)
# ---------------------------------------------------------------------------

def _pages_with_html(spark, rows):
    df = spark.createDataFrame(rows, "url string, html_s string")
    from pyspark.sql import functions as F
    return df.withColumn("html", F.encode("html_s", "utf-8")).drop("html_s")


def test_frontier_hosts_known_unknown_split(spark):
    """Links to corpus urls are dropped (they are crawled already);
    off-corpus absolute links aggregate by host with distinct-source
    counting; relative links are excluded."""
    from geohash_dotnet_spark.operators.links import frontier_hosts

    rows = [
        ("https://a.example/p/1",
         '<a href="https://a.example/p/2">in</a>'
         '<a href="https://new.example/x">out</a>'
         '<a href="https://new.example/y">out2</a>'
         '<a href="/relative">rel</a>'),
        ("https://a.example/p/2",
         '<a href="https://new.example/x">dup-target</a>'
         '<a href="https://other.example/z">o</a>'),
    ]
    out = {r["host"]: (r["n_links"], r["n_src_urls"], r["sample_url"])
           for r in frontier_hosts(_pages_with_html(spark, rows)).collect()}
    assert out == {
        "new.example": (3, 2, "https://new.example/x"),
        "other.example": (1, 1, "https://other.example/z"),
    }


def test_frontier_hosts_all_resolving_is_empty(spark):
    """A fully self-contained corpus (every link resolves) has an empty
    frontier — the anti-join complement of link_locality's inner join."""
    from geohash_dotnet_spark.operators.links import frontier_hosts

    rows = [
        ("https://a.example/p/1", '<a href="https://a.example/p/2">n</a>'),
        ("https://a.example/p/2", '<a href="https://a.example/p/1">b</a>'),
    ]
    assert frontier_hosts(_pages_with_html(spark, rows)).count() == 0


def test_frontier_hosts_mixed_planting_exercises_both_branches(spark):
    """The mixed-anchor builder plants BOTH resolving and off-corpus
    anchors; frontier hosts must all be ext-*.example and the resolved
    complement must be non-empty (both join branches live)."""
    from pyspark.sql import functions as F

    from geohash_dotnet_spark.operators.links import (
        extract_links, frontier_hosts, with_planted_mixed_anchors)
    from geohash_dotnet_spark.sources.pages import pages

    pg = with_planted_mixed_anchors(
        pages(spark, "/root/testdata/sf0.001", replicate=4), replicate=4)
    fr = frontier_hosts(pg).collect()
    assert fr and all(r["host"].startswith("ext-") for r in fr)
    n_frontier = sum(r["n_links"] for r in fr)
    n_abs = (extract_links(pg).where(F.col("link").rlike("^https?://"))
             .count())
    assert 0 < n_frontier < n_abs  # some links resolved, some didn't


def test_frontier_hosts_html_never_crosses_exchange(spark):
    """Extraction stays in the scan stage: no Exchange in the plan
    carries the html payload, and no Python eval nodes exist."""
    from geohash_dotnet_spark.operators.links import (
        frontier_hosts, with_planted_mixed_anchors)
    from geohash_dotnet_spark.sources.pages import pages

    pg = with_planted_mixed_anchors(
        pages(spark, "/root/testdata/sf0.001", replicate=2), replicate=2)
    plan = (frontier_hosts(pg)
            ._jdf.queryExecution().executedPlan().toString())
    main = plan.split("Initial Plan")[0]
    assert "BatchEvalPython" not in main and "ArrowEvalPython" not in main
    for line in main.splitlines():
        if "Exchange" in line:
            assert "html" not in line, line


def test_mixed_anchor_validation(spark):
    from geohash_dotnet_spark.operators.links import with_planted_mixed_anchors
    from geohash_dotnet_spark.sources.pages import pages

    with pytest.raises(ValueError, match="must be >= 1"):
        with_planted_mixed_anchors(
            pages(spark, "/root/testdata/sf0.001"), replicate=0)
