"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched mapInPandas.

The image/audio codecs are NOT available in this container, so the decode
step is stubbed: ``decoder='real'`` raises NotImplementedError at the
executor; ``decoder='fake'`` substitutes a deterministic feature extractor
(byte-histogram features) so the Spark-side plumbing — schema, batch shape,
partitioning — is real and tested end-to-end. Swapping in a real decoder
touches ONE function (_decode_real).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = ("url string, media_type string, payload binary, "
                "width int, height int, duration_s double")

FEATURE_DIM = 32


def _decode_real(payload: bytes, media_type: str) -> np.ndarray:
    raise NotImplementedError(
        "No image/audio codecs in this environment — use decoder='fake' "
        "or install codecs and implement _decode_real.")


def _decode_fake(payload: bytes, media_type: str) -> np.ndarray:
    """Deterministic stand-in: normalized 32-bin byte histogram."""
    arr = np.frombuffer(payload or b"\x00", dtype=np.uint8)
    hist, _ = np.histogram(arr, bins=FEATURE_DIM, range=(0, 256))
    total = hist.sum() or 1
    return (hist / total).astype(np.float32)


def extract_features(media_df: DataFrame, decoder: str = "fake",
                     payload_col: str = "payload") -> DataFrame:
    """(… , features array<float>) via Arrow-batched mapInPandas.

    Batches stream through the executor; only ``url``/``payload`` are
    materialized per batch (other columns pass through untouched).
    """
    decode = _decode_fake if decoder == "fake" else _decode_real
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in media_df.schema.fields)
    out_schema = f"{fields}, features array<float>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode(p, m).tolist()
                     for p, m in zip(pdf[payload_col], pdf.get("media_type", ""))]
            pdf = pdf.copy()
            pdf["features"] = feats
            yield pdf

    return media_df.mapInPandas(run, out_schema)


def synthetic_media(pages_df: DataFrame, media_type: str = "image") -> DataFrame:
    """Deterministic fake media table derived from pages (payload = text
    bytes; dims derived from the url hash) — exercises the full binary
    column path without external data."""
    return pages_df.select(
        "url",
        F.lit(media_type).alias("media_type"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        (F.pmod(F.xxhash64("url"), F.lit(1920)) + 1).cast("int").alias("width"),
        (F.pmod(F.xxhash64("url", F.lit(1)), F.lit(1080)) + 1).cast("int").alias("height"),
        F.lit(None).cast("double").alias("duration_s"),
    )


def frame_sample_plan(media_df: DataFrame, fps: float = 1.0) -> DataFrame:
    """Video frame-sampling plan: one row per sampled frame index (the
    decode itself is stubbed). Demonstrates explode-based fan-out sized by
    metadata, not payload bytes."""
    n_frames = F.greatest(
        F.ceil(F.coalesce(F.col("duration_s"), F.lit(1.0)) * F.lit(fps)),
        F.lit(1)).cast("int")
    return media_df.withColumn(
        "frame_idx", F.explode(F.sequence(F.lit(0), n_frames - 1)))
