"""Crawl-side scheduling over the pages table.

:func:`crawl_slots` — per-site politeness scheduling: order each
site's URLs by fetch timestamp (URL tiebreak — timestamps collide in
any real frontier) and assign each a fetch *slot* of at most ``rate``
URLs, i.e. slot ``s`` holds the s-th batch a polite fetcher may issue
against that site concurrently. This is the frontier-partitioning
step every large crawler runs between "URLs discovered" and "URLs
fetched" (cf. the host-level budgets of `url_host_stats` — this is
the *when*, that is the *how much*).

Scale shape: ONE site-keyed Exchange; the per-site ``row_number`` and
the (site, slot) aggregation both ride it (group key ⊇ partition
key), so Catalyst inserts no second corpus-scale shuffle
(plan-asserted in tests). The within-site rank is inherently
sequential — a site's frontier sorts inside one task. That is the
honest shape of politeness (slots ARE a per-site total order); a
pathological mega-site spills its sort rather than breaking the
semantics, and the site key has no cross-site skew coupling — every
other site proceeds in parallel.

Cross-engine determinism: the ordering key (ts, url) is a total order
(urls are unique), slot ids are exact integer division of the 0-based
rank, and the per-slot witness is ``min(url)`` — no floats anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["crawl_slots", "crawl_slots_sql"]

SITE_RE = r"^https?://[^/]+/([^/]+)/"


def crawl_slots(df: DataFrame, rate: int = 16, url: str = "url",
                ts: str = "warc_ts", site_re: str = SITE_RE) -> DataFrame:
    """-> (site, slot long, n_urls long, first_url): the polite fetch
    schedule. Slot ``s`` of a site holds its URLs ranked
    ``[s*rate, (s+1)*rate)`` in (ts, url) order; ``n_urls`` is the
    slot's fill (== rate except the last slot) and ``first_url`` its
    lexicographically first member (a deterministic witness that the
    ordering, not just the counts, agrees cross-engine).
    """
    if rate < 1:
        raise ValueError(f"rate must be >= 1, got {rate}")
    site = F.regexp_extract(F.col(url), site_re, 1)
    w = Window.partitionBy("site").orderBy(F.col("__t").asc(),
                                           F.col("__u").asc())
    ranked = (df.select(site.alias("site"), F.col(url).alias("__u"),
                        F.col(ts).alias("__t"))
              .withColumn("__rn", F.row_number().over(w) - 1))
    return (ranked
            .withColumn("slot", F.expr(f"__rn div {int(rate)}").cast("long"))
            .groupBy("site", "slot")
            .agg(F.count(F.lit(1)).alias("n_urls"),
                 F.min("__u").alias("first_url")))


def crawl_slots_sql(inner: str, rate: int = 16, url: str = "url",
                    ts: str = "warc_ts", site_re: str = SITE_RE) -> str:
    """DuckDB oracle twin of :func:`crawl_slots`. ``inner`` must expose
    the url and ts columns."""
    if rate < 1:
        raise ValueError(f"rate must be >= 1, got {rate}")
    return f"""
WITH u AS (
  SELECT regexp_extract({url}, '{site_re}', 1) AS site,
         {url} AS __u, {ts} AS __t
  FROM ({inner})
), r AS (
  SELECT site, __u,
         row_number() OVER (PARTITION BY site ORDER BY __t, __u) - 1 AS __rn
  FROM u
)
SELECT site, CAST(__rn // {int(rate)} AS BIGINT) AS slot,
       CAST(count(*) AS BIGINT) AS n_urls, min(__u) AS first_url
FROM r GROUP BY site, slot
"""
