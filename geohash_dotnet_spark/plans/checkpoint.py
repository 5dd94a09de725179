"""Resumable per-partition checkpointing with lineage + metrics
(the north rule's resumability requirement).

A *checkpointed run* writes a dataset partitioned by a bucket key in
independent parquet slices, one manifest JSON sidecar per bucket:

    <out>/bucket=<k>/part-*.parquet
    <out>/_manifests/bucket-<k>.json   {bucket, rows, cells?, input_fingerprint,
                                        app_id, wall_s}

Re-running the same job against the same input skips buckets whose manifest
exists AND matches the input fingerprint — idempotent resume after
mid-job failure. Buckets are geohash prefixes (or any column), mirroring
the reference's latitude-row partitioning of work
(/root/reference/src/PolygonHasher.cs:132-173) at dataset granularity.

All driver-side bookkeeping is plain JSON files — no external services.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifests")


def _manifest_path(out_dir: str, bucket: str) -> str:
    return os.path.join(_manifest_dir(out_dir), f"bucket-{bucket}.json")


def input_fingerprint(df: DataFrame, key_col: str) -> str:
    """Cheap deterministic fingerprint of the input slice: row count +
    xor-of-hashes. Order-insensitive, computed distributed."""
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(F.xxhash64(key_col)).alias("h"),  # overflow-free, order-insensitive
    ).collect()[0]
    return f"{row['n']}:{row['h']}"


def checkpointed_write(df: DataFrame, out_dir: str, bucket_col: str,
                       buckets: list[str], fingerprint_col: str,
                       metric_cols: dict[str, str] | None = None) -> dict:
    """Write ``df`` bucket-by-bucket with resume.

    Returns a summary dict {written: [...], skipped: [...], metrics: {...}}.
    Manifests commit atomically per bucket — a crash loses at most the
    in-flight batch (no committed bucket is ever re-written), and a
    re-run skips committed buckets whose input fingerprint is unchanged.

    Scale shape: the source is scanned O(1) times per run, independent
    of bucket count — ONE grouped aggregation pre-pass computes every
    bucket's fingerprint and manifest metrics, ONE dynamic-partition
    ``partitionBy`` write materializes all pending buckets, and ONE
    read-back aggregation verifies per-bucket row counts against the
    pre-pass (raising on any mismatch). The round-2 form filtered and
    wrote bucket-by-bucket: N source scans + N read-back jobs.

    Bucket keys are compared through ``str()`` on both sides so an int
    bucket column matched against a string bucket list (or vice versa —
    the ``isin`` filter coerces either way) can never silently degrade a
    fingerprint to the empty "0:None" form and skip real data on resume.
    """
    os.makedirs(_manifest_dir(out_dir), exist_ok=True)
    spark = df.sparkSession
    written, skipped, metrics = [], [], {}

    aggs = [F.count(F.lit(1)).alias("__ck_n"),
            F.bit_xor(F.xxhash64(fingerprint_col)).alias("__ck_h")]
    if metric_cols:
        aggs += [F.expr(expr).alias(name) for name, expr in metric_cols.items()]
    stats = {str(row[bucket_col]): row
             for row in df.groupBy(bucket_col).agg(*aggs).collect()}

    def _fp(srow):
        return f"{srow['__ck_n']}:{srow['__ck_h']}" if srow is not None \
            else "0:None"

    pending: list = []
    for bucket in buckets:
        srow = stats.get(str(bucket))
        mpath = _manifest_path(out_dir, bucket)
        if os.path.exists(mpath):
            with open(mpath) as f:
                manifest = json.load(f)
            if manifest.get("input_fingerprint") == _fp(srow):
                skipped.append(bucket)
                metrics[bucket] = manifest
                continue
        pending.append(bucket)

    t0 = time.time()
    nonempty = [b for b in pending
                if stats.get(str(b)) is not None
                and stats[str(b)]["__ck_n"] > 0]
    counts: dict[str, int] = {}
    if nonempty:
        sub = df.filter(F.col(bucket_col).isin(list(nonempty)))
        if bucket_col != "bucket":
            # partition dir layout stays bucket=<k>; the original column
            # remains a data column inside the files
            sub = sub.withColumn("bucket", F.col(bucket_col).cast("string"))
        (sub.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")  # only pending dirs
            .partitionBy("bucket").parquet(out_dir))
        back = spark.read.option("basePath", out_dir).parquet(
            *[os.path.join(out_dir, f"bucket={b}") for b in nonempty])
        counts = {str(r["bucket"]): r["__n"] for r in
                  back.groupBy("bucket").agg(
                      F.count(F.lit(1)).alias("__n")).collect()}
    # a pending bucket with no input rows must not leave stale data from
    # an earlier run behind (dynamic overwrite only touches written dirs)
    for b in pending:
        if b not in nonempty:
            import shutil
            shutil.rmtree(os.path.join(out_dir, f"bucket={b}"),
                          ignore_errors=True)
    wall = round(time.time() - t0, 3)

    for bucket in pending:
        srow = stats.get(str(bucket))
        expected = int(srow["__ck_n"]) if srow is not None else 0
        rows = int(counts.get(str(bucket), 0))
        if rows != expected:
            raise RuntimeError(
                f"checkpointed_write integrity failure for bucket "
                f"{bucket!r}: read-back counted {rows} rows but the "
                f"stats pre-pass saw {expected} — bucket key/type "
                f"mismatch or concurrent writer")
        extra = {name: srow[name] for name in (metric_cols or {})} \
            if srow is not None else {name: None for name in (metric_cols or {})}
        manifest = {
            "bucket": bucket,
            "rows": rows,
            "input_fingerprint": _fp(srow),
            "app_id": spark.sparkContext.applicationId,
            # wall_s is the shared batch-write wall time for this run
            "wall_s": wall,
            **extra,
        }
        mpath = _manifest_path(out_dir, bucket)
        tmp = mpath + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, mpath)  # atomic commit of the bucket
        written.append(bucket)
        metrics[bucket] = manifest

    return {"written": written, "skipped": skipped, "metrics": metrics}


def run_lineage(out_dir: str) -> list[dict]:
    """All committed bucket manifests (the per-partition lineage record)."""
    mdir = _manifest_dir(out_dir)
    if not os.path.isdir(mdir):
        return []
    out = []
    for name in sorted(os.listdir(mdir)):
        if name.endswith(".json"):
            with open(os.path.join(mdir, name)) as f:
                out.append(json.load(f))
    return out


def read_checkpointed(spark: SparkSession, out_dir: str) -> DataFrame:
    """Read back a checkpointed dataset (bucket partition column included)."""
    return spark.read.option("basePath", out_dir).parquet(
        os.path.join(out_dir, "bucket=*"))
