"""Deterministic Common-Crawl-style pages table (the engine's
production-shaped input per BASELINE.json input_hint).

Derived from the driver-provided ``documents`` parquet, deterministically —
no wall-clock, no RNG: url is a bijection of (doc_id, rep), lat/lon derive
from md5(url), and ``text`` passes through byte-identical per url (the
per-row invariant). The DuckDB twin is functions/oracle.pages_sql.

Columns: url string, warc_ts timestamp, html binary, text string,
lang string, doc_id long, rep int, lat double, lon double.

``html`` is a synthetic binary payload that the spatial path must never
read (column-pruning check: it is projected away by Catalyst unless
explicitly selected).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.native import geocode_from_url

URL_PREFIX = "https://crawl.example/"


def pages(spark: SparkSession, sf_dir: str, replicate: int = 1,
          with_html: bool = False) -> DataFrame:
    """Build the pages table at a scale factor directory.

    ``replicate`` fans each document out into N distinct pages (distinct
    urls, same text) — the deterministic scale knob for throughput runs.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if replicate > 1:
        # documents is a single small file -> one input partition; spread it
        # across the cluster BEFORE the fan-out so the replicated table (and
        # everything downstream) is parallel. Repartitioning 5k doc rows is
        # cheap; repartitioning the exploded table would not be. 4 waves of
        # tasks per core: a single straggler then costs ~1/4 of a wave, not
        # a whole one (long tails dominate single-wave schedules).
        n_part = max(4 * spark.sparkContext.defaultParallelism, 8)
        docs = docs.repartition(n_part).withColumn(
            "rep", F.explode(F.sequence(F.lit(0), F.lit(replicate - 1))))
    else:
        docs = docs.withColumn("rep", F.lit(0))

    out = docs.withColumn(
        "url",
        F.concat(F.lit(URL_PREFIX), F.col("source"), F.lit("/"),
                 F.col("doc_id").cast("string"), F.lit("/"),
                 F.col("rep").cast("string")),
    ).withColumn(
        "warc_ts",
        F.to_timestamp(F.lit("2024-01-01 00:00:00"))
        + F.make_dt_interval(days=F.col("doc_id") % 365,
                             hours=F.col("rep") % 24),
    )
    if with_html:
        out = out.withColumn(
            "html",
            F.encode(F.concat(F.lit("<html><body>"), F.col("text"),
                              F.lit("</body></html>")), "utf-8"),
        )
    out = geocode_from_url(out, "url")
    cols = ["url", "warc_ts", "text", "lang", "doc_id", "rep", "lat", "lon"]
    if with_html:
        cols.insert(2, "html")
    return out.select(*cols)
