"""Physical-layout and resumability plans.

* checkpoint — per-partition resumable writes with lineage manifests;
* bucketing  — geohash-prefix bucketBy layout for exchange-free tile
  aggregation and co-located joins.

Compose them: checkpoint-write the dataset (crash-safe, resumable),
then persist the validated result bucketed so every later query reads
pre-clustered buckets (see checkpoint_then_bucket).
"""

from .bucketing import (  # noqa: F401
    bucketed_tile_stats,
    persist_bucketed,
    with_prefix,
)
from .checkpoint import (  # noqa: F401
    checkpointed_write,
    input_fingerprint,
    read_checkpointed,
    run_lineage,
)


def checkpoint_then_bucket(df, ckpt_dir: str, table_name: str,
                           table_path: str, bucket_col: str = "gh2",
                           buckets: list[str] | None = None,
                           n_buckets: int = 32):
    """The end-to-end layout pipeline: resumable checkpointed write of
    ``df`` sliced by ``bucket_col`` (independent atomic commits +
    manifests — a crash between slices loses nothing, a re-run skips
    completed slices), then one bucketed persist of the validated
    dataset so downstream tile aggregations and cell-keyed joins run
    exchange-free.

    Returns (summary, bucketed_table_df).
    """
    from pyspark.sql import functions as F

    if buckets is None:
        buckets = [r[0] for r in
                   df.select(bucket_col).distinct().orderBy(bucket_col).collect()]
    summary = checkpointed_write(df, ckpt_dir, bucket_col, buckets,
                                 fingerprint_col=bucket_col)
    validated = read_checkpointed(df.sparkSession, ckpt_dir) \
        .withColumn(bucket_col, F.col(bucket_col).cast("string"))
    table = persist_bucketed(validated, table_name, table_path,
                             bucket_col=bucket_col, n_buckets=n_buckets)
    return summary, table
