"""geohash_dotnet_spark — a from-scratch, PySpark-native geohash/spatial-join
and web-text analytics engine with the capabilities of
Postlagerkarte/geohash-dotnet (reference, read-only at /root/reference).

Layers:
    kernels/    pure NumPy (no Spark): encode/decode/coverage/compression
    functions/  gh_* Spark column functions (native exprs + pandas UDFs)
    operators/  dataflow operators: coverage, spatial join, kNN, compress,
                dedup, similarity, text analysis
    sources/    deterministic Common-Crawl-style pages table synthesis
    plans/      per-partition checkpointing / lineage / resume + bucketed layout
    streaming/  Structured Streaming tile counts (windowed + stateful)
    session     recommended SparkSession configuration (apply_recommended)
"""

from .session import apply_recommended, recommended_conf  # noqa: F401

__version__ = "0.2.0"
