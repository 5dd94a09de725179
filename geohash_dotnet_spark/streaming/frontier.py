"""Streaming crawl-frontier discovery: the live twin of
``operators/links.frontier_hosts``.

As crawled pages arrive, their outlinks are extracted in the scan
projection (same codegen regexp as the batch path — the html payload
never crosses an exchange) and anti-joined against the STATIC table of
already-known urls: what survives is exactly the frontier feed a live
crawler pushes into scheduling (``crawl_slots`` consumes the per-host
expansion downstream).

Structured Streaming shape: a stream-static LEFT ANTI join — stateless,
no watermark, and the static side is re-read per micro-batch, so a
periodically-refreshed known-url snapshot is picked up without
restarting the query (the standard "frontier index lags the crawl by
one compaction" contract). The static side must be broadcast when it
fits (a shuffled stream-static join would re-partition every
micro-batch); at 10^12 known urls the same query runs with the anti
join hash-partitioned instead — the semantics do not change, which is
why the operator takes the static side as a caller-built DataFrame.

Emission is per-link rows (src_url, link, host): aggregation to
per-host counts is deliberately left to the consumer (the batch
``frontier_hosts`` shape) — a streaming groupBy would force
complete/update output and unbounded per-host state for no scheduling
benefit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.links import HOST_RE, HREF_RE


def streaming_frontier(spark: SparkSession, source_dir: str, schema: str,
                       known_urls: DataFrame, html: str = "html",
                       url: str = "url") -> DataFrame:
    """readStream(parquet dir) -> outlink explode -> stream-static
    broadcast LEFT ANTI join against ``known_urls`` (one column: the
    known url set). Emits (src_url, link, host) append rows — the live
    frontier feed."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    links = F.expr(
        f"regexp_extract_all(decode({html}, 'UTF-8'), '{HREF_RE}', 1)")
    src = (stream.select(F.col(url).alias("src_url"),
                         F.explode(links).alias("link"))
           .where(F.col("link").rlike("^https?://")))
    known = F.broadcast(
        known_urls.select(F.col(known_urls.columns[0]).alias("link"))
        .distinct())
    return (src.join(known, "link", "left_anti")
            .withColumn("host", F.regexp_extract("link", HOST_RE, 1)))
