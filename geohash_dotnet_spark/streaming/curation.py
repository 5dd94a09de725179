"""Streaming document curation: the live face of the batch text
pipeline — score, scrub, and budget documents AS THEY ARRIVE.

Like streaming/corridor.py this is deliberately a THIN composition:
`with_quality`, `with_pii_scrubbed`, and `with_token_stats`
(operators/text.py, operators/pipeline.py) are pure projections — no
aggregation, no state, no watermark — so the exact operators the batch
curation pipeline runs apply unchanged to a readStream source. That
identity is the point: a crawl pipeline that filters live with THIS
module and backfills with the batch operators produces byte-identical
decisions (parity-tested), because they are literally the same
expressions.

Per-event cost is the batch per-row cost (single-traversal quality
aggregate + codegen regexp scrub); emissions are append-mode and
immediate. The stateful parts of curation — dedup, mixture sampling —
stay in their dedicated streaming modules (streaming/dedup.py) or in
batch backfill, which is exactly how production systems split them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.pipeline import with_pii_scrubbed
from ..operators.text import with_quality, with_token_stats

__all__ = ["streaming_curation"]


def streaming_curation(spark: SparkSession, source_dir: str, schema: str,
                       text: str = "text",
                       min_quality: float = 0.0) -> DataFrame:
    """readStream(parquet dir with a text column) -> quality score +
    token stats + PII-scrubbed text, filtered to ``quality_score >=
    min_quality``. Stateless append stream; identical expressions to
    the batch operators."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    out = with_token_stats(with_quality(stream, text=text), text=text)
    out = with_pii_scrubbed(out, text=text)
    return out.filter(F.col("quality_score") >= F.lit(float(min_quality)))
