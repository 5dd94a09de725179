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


def iceberg_catalog_conf(name: str = "ice", warehouse: str = "/tmp/warehouse",
                         impl: str = "hadoop") -> dict[str, str]:
    """Spark conf entries that register an Iceberg catalog ``name``.

    Pure function (no jars needed to compute it) so the plumbing is
    unit-testable in this parquet-only sandbox; feed the dict to
    ``SparkSession.builder.config(map=...)`` on a cluster that ships
    ``iceberg-spark-runtime``. ``impl`` is "hadoop" (filesystem
    warehouse), "hive", or "rest" (set ``uri`` separately for rest).
    """
    conf = {
        f"spark.sql.catalog.{name}":
            "org.apache.iceberg.spark.SparkCatalog",
        f"spark.sql.catalog.{name}.type": impl,
    }
    if impl in ("hadoop",):
        conf[f"spark.sql.catalog.{name}.warehouse"] = warehouse
    return conf


def _iceberg_read_options(snapshot_id: int | None = None,
                          as_of_ms: int | None = None) -> dict[str, str]:
    """Map time-travel args to Iceberg's DataSourceV2 read option names.

    Iceberg rejects both together (a snapshot IS a point in time); we
    fail fast here with a clearer message than the Java-side one.
    """
    if snapshot_id is not None and as_of_ms is not None:
        raise ValueError("pass snapshot_id OR as_of_ms, not both")
    opts: dict[str, str] = {}
    if snapshot_id is not None:
        opts["snapshot-id"] = str(int(snapshot_id))
    if as_of_ms is not None:
        opts["as-of-timestamp"] = str(int(as_of_ms))
    return opts


def read_table(spark: SparkSession, source: str,
               fmt: str = "parquet", options: dict[str, str] | None = None,
               snapshot_id: int | None = None,
               as_of_ms: int | None = None) -> DataFrame:
    """Read a pages-shaped table from a path or catalog identifier.

    ``source`` is a filesystem path for file formats, or a catalog
    identifier (``catalog.db.table``) when ``fmt`` is "iceberg"/"delta"
    and contains no "/". ``options`` pass straight to the reader
    (format-specific); ``snapshot_id``/``as_of_ms`` are Iceberg
    time-travel shortcuts (mapped to ``snapshot-id`` /
    ``as-of-timestamp``). Raises ValueError with the missing-runtime
    hint when the format's DataSourceV2 provider is not on the
    classpath.
    """
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {_FORMATS}")
    opts = dict(options or {})
    opts.update(_iceberg_read_options(snapshot_id, as_of_ms))
    try:
        if fmt in ("iceberg", "delta") and "/" not in source:
            return spark.read.options(**opts).table(source)
        return spark.read.format(fmt).options(**opts).load(source)
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


def write_table(df: DataFrame, dest: str, fmt: str = "parquet",
                mode: str = "append",
                partition_by: list[str] | None = None) -> None:
    """Write a pages-shaped table to a path or catalog identifier,
    behind the same format gate as :func:`read_table`.

    For Iceberg catalog identifiers this is `writeTo(...).append()` /
    `createOrReplace()` (DataSourceV2, atomic snapshot commit — what
    makes the checkpointed pipeline writes in plans/checkpoint.py
    resumable WITHOUT the _staging dance at 100 TB); for file formats
    it is the classic `write.format(...)`. ``partition_by`` becomes
    `partitionedBy` on v2 (use identity columns here; bucket/truncate
    transforms need SQL DDL) or `partitionBy` on v1.
    """
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {_FORMATS}")
    try:
        if fmt in ("iceberg", "delta") and "/" not in dest:
            w = df.writeTo(dest)
            if mode == "overwrite":
                if partition_by:
                    from pyspark.sql import functions as F
                    w = w.partitionedBy(*[F.col(c) for c in partition_by])
                w.createOrReplace()
            else:
                w.append()
            return
        w = df.write.format(fmt).mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.save(dest)
    except Exception as exc:  # noqa: BLE001
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
                f"catalog identifier {dest!r} needs a configured {fmt} "
                f"catalog; this environment has the builtin "
                f"spark_catalog only") from exc
        raise
