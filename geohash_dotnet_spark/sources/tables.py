"""Format-agnostic table access for the pages corpus.

The north rule's production input is an Iceberg table of Common-Crawl-style
pages; this sandbox ships parquet only (no iceberg-spark runtime jar), so
the reader is format-gated: parquet paths work everywhere, catalog tables
(`db.table`) and explicit formats ("iceberg", "delta") are attempted via
the normal DataSourceV2 route and produce an actionable error when the
runtime jar is absent rather than a ClassNotFoundException deep in py4j.

At 100 TB the Iceberg route is the one you want: hidden partitioning on
`bucket(N, gh2)` gives the same zero-Exchange tile rollups as
plans/bucketing.py's Hive bucketing (PLANS.md "Bucketed layout"), plus
snapshot isolation for the resumable checkpoint writes — the engine's
operators are all DataFrame-in/DataFrame-out, so they are storage-agnostic
by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_FORMATS = ("parquet", "iceberg", "delta", "orc")


def read_table(spark: SparkSession, source: str,
               fmt: str = "parquet") -> DataFrame:
    """Read a pages-shaped table from a path or catalog identifier.

    ``source`` is a filesystem path for file formats, or a catalog
    identifier (``catalog.db.table``) when ``fmt`` is "iceberg"/"delta"
    and contains no "/". Raises ValueError with the missing-runtime hint
    when the format's DataSourceV2 provider is not on the classpath.
    """
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {_FORMATS}")
    try:
        if fmt in ("iceberg", "delta") and "/" not in source:
            return spark.read.table(source)
        return spark.read.format(fmt).load(source)
    except Exception as exc:  # noqa: BLE001 — py4j raises raw Py4JJavaError
        msg = str(exc)
        if "Failed to find" in msg or "ClassNotFound" in msg \
                or "data source" in msg.lower():
            raise ValueError(
                f"format {fmt!r} needs its Spark runtime jar on the "
                f"classpath (e.g. iceberg-spark-runtime for Iceberg); "
                f"this environment has parquet/orc only") from exc
        if fmt in ("iceberg", "delta") and (
                "NAMESPACE" in msg or "TABLE_OR_VIEW_NOT_FOUND" in msg
                or "Catalog" in msg):
            raise ValueError(
                f"catalog identifier {source!r} needs a configured {fmt} "
                f"catalog (spark.sql.catalog.<name> = "
                f"org.apache.iceberg.spark.SparkCatalog + its runtime "
                f"jar); this environment has the builtin spark_catalog "
                f"only") from exc
        raise
