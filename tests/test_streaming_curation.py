"""Streaming curation (availableNow, offline): stateless projection
chain must equal the batch operators byte-for-byte."""

from pyspark.sql import functions as F

from geohash_dotnet_spark.operators.pipeline import with_pii_scrubbed
from geohash_dotnet_spark.operators.text import (
    with_quality,
    with_token_stats,
)
from geohash_dotnet_spark.streaming.curation import streaming_curation

SCHEMA = ("doc_id long, text string, lang string, source string, "
          "n_chars long")

COLS = ["doc_id", "quality_score", "n_tokens", "text_scrubbed"]


def _batch(docs, min_q):
    out = with_pii_scrubbed(with_token_stats(with_quality(docs)))
    return out.filter(F.col("quality_score") >= min_q).select(*COLS)


def test_streaming_curation_matches_batch(spark, sf_small, tmp_path):
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))
    docs.write.parquet(src)

    q = (streaming_curation(spark, src, SCHEMA, min_quality=0.2)
         .select(*COLS)
         .writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination()

    got = sorted(map(tuple, spark.read.parquet(out).collect()))
    want = sorted(map(tuple, _batch(docs, 0.2).collect()))
    assert got == want
    # the threshold genuinely splits the corpus (both sides non-empty)
    assert 0 < len(want) < docs.count()
