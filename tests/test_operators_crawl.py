"""Polite crawl scheduling (operators/crawl.py: crawl_slots)."""

from datetime import datetime, timedelta

import pytest

from geohash_dotnet_spark.operators import crawl_slots


def _frontier(spark, rows):
    return spark.createDataFrame(rows, "url string, warc_ts timestamp")


def test_crawl_slots_orders_by_ts_not_url(spark):
    """35 urls whose lexicographic order is the REVERSE of their fetch
    order: slots must follow (ts, url), so slot 0 holds the 16 earliest
    timestamps (= the 16 largest url ids) and its min-url witness is the
    url of rank 15."""
    base = datetime(2024, 1, 1)
    rows = [(f"https://x.example/siteA/{99 - i:02d}/0",
             base + timedelta(seconds=i)) for i in range(35)]
    out = {r["slot"]: (r["n_urls"], r["first_url"])
           for r in crawl_slots(_frontier(spark, rows), rate=16).collect()}
    assert set(out) == {0, 1, 2}
    assert out[0] == (16, "https://x.example/siteA/84/0")   # ranks 0-15
    assert out[1] == (16, "https://x.example/siteA/68/0")   # ranks 16-31
    assert out[2] == (3, "https://x.example/siteA/65/0")    # ranks 32-34


def test_crawl_slots_ts_tie_breaks_url_asc(spark):
    """Colliding timestamps order by url: with rate=1 each url is its
    own slot, and slot ids follow url order within the tie."""
    t = datetime(2024, 1, 1)
    rows = [(f"https://x.example/s/{u}/0", t) for u in ("b", "a", "c")]
    out = {r["first_url"].split("/")[-2]: r["slot"]
           for r in crawl_slots(_frontier(spark, rows), rate=1).collect()}
    assert out == {"a": 0, "b": 1, "c": 2}


def test_crawl_slots_sites_independent(spark):
    """Each site ranks its own frontier; identical timestamps across
    sites do not interleave."""
    t = datetime(2024, 1, 1)
    rows = [(f"https://x.example/{s}/{i}/0", t + timedelta(seconds=i))
            for s in ("sa", "sb") for i in range(5)]
    out = crawl_slots(_frontier(spark, rows), rate=4).collect()
    by_site = {}
    for r in out:
        by_site.setdefault(r["site"], []).append((r["slot"], r["n_urls"]))
    assert sorted(by_site) == ["sa", "sb"]
    for s in by_site.values():
        assert sorted(s) == [(0, 4), (1, 1)]


def test_crawl_slots_single_site_exchange(spark):
    """ONE site-keyed Exchange: the window rank and the (site, slot)
    aggregation both ride it (group key contains the partition key)."""
    base = datetime(2024, 1, 1)
    rows = [(f"https://x.example/s{i % 3}/{i}/0",
             base + timedelta(seconds=i)) for i in range(30)]
    out = crawl_slots(_frontier(spark, rows), rate=4)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("Initial Plan")[0]
    assert final.count("Exchange hashpartitioning") == 1
    assert "BatchEvalPython" not in final
    assert "ArrowEvalPython" not in final


def test_crawl_slots_validation(spark):
    with pytest.raises(ValueError):
        crawl_slots(None, rate=0)
