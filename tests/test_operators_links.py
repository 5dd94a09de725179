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
