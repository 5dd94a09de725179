"""Snapshot diff (change-data-capture) between two corpus crawls.

The incremental-ingestion primitive: given the previous snapshot and a
new crawl, classify every document as ``added`` / ``removed`` /
``changed`` / ``unchanged`` by content fingerprint, so downstream
processing (dedup, quality, indexing) touches only added+changed rows
instead of reprocessing 100 TB per crawl.

Scale shape: one co-partitioned FULL OUTER equi-join on the document
id — the optimal plan for a keyed diff (both sides shuffle once on the
same key; with both snapshots bucketed by id on disk, even that
exchange disappears — see plans/bucketing.py). Fingerprints are the
whitespace-normalized md5 from operators/text.py, computed in the scan
projection, so the join payload is (id, 32-byte fp), never the text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import fingerprint_sql_expr, with_fingerprint

__all__ = ["snapshot_diff", "snapshot_diff_sql"]


def snapshot_diff(old: DataFrame, new: DataFrame, id_col: str = "doc_id",
                  text: str = "text") -> DataFrame:
    """One row per document id present in either snapshot:
    (id_col, status, fp) with fp the surviving fingerprint (the new
    one for added/changed/unchanged, the old one for removed)."""
    of = (with_fingerprint(old.select(id_col, text), text)
          .select(F.col(id_col).alias("id"),
                  F.col("fingerprint").alias("fp_old")))
    nf = (with_fingerprint(new.select(id_col, text), text)
          .select(F.col(id_col).alias("id"),
                  F.col("fingerprint").alias("fp_new")))
    j = of.join(nf, "id", "full_outer")
    status = (F.when(F.col("fp_old").isNull(), F.lit("added"))
              .when(F.col("fp_new").isNull(), F.lit("removed"))
              .when(F.col("fp_old") == F.col("fp_new"),
                    F.lit("unchanged"))
              .otherwise(F.lit("changed")))
    return j.select(F.col("id").alias(id_col), status.alias("status"),
                    F.coalesce("fp_new", "fp_old").alias("fp"))


def snapshot_diff_sql(old: str, new: str, id_col: str = "doc_id",
                      text: str = "text") -> str:
    """DuckDB oracle twin of :func:`snapshot_diff`."""
    fp = fingerprint_sql_expr(text)
    return f"""
WITH o AS (SELECT {id_col} AS id, {fp} AS fp_old FROM {old}),
n AS (SELECT {id_col} AS id, {fp} AS fp_new FROM {new})
SELECT COALESCE(o.id, n.id) AS {id_col},
       CASE WHEN o.id IS NULL THEN 'added'
            WHEN n.id IS NULL THEN 'removed'
            WHEN o.fp_old = n.fp_new THEN 'unchanged'
            ELSE 'changed' END AS status,
       COALESCE(n.fp_new, o.fp_old) AS fp
FROM o FULL OUTER JOIN n ON n.id = o.id
"""
