"""Hypertable-style continuous rollup: one time-series aggregated at a
ladder of granularities (minute -> hour -> day), each coarser level
computed FROM the next finer level, never from the raw events.

The TimescaleDB continuous-aggregate idea expressed as DataFrame
algebra: the minute aggregate is the only operator that touches the
corpus; the hour level re-aggregates |minutes| rows and the day level
|hours| rows. Catalyst's exchange-reuse then makes the sharing
physical: the three union branches contain an identical minute-level
Exchange subtree, so the executed plan scans the source ONCE and wires
the coarser aggregations off a ReusedExchange (plan-asserted in
tests). At 100 TB the raw scan happens once; everything above it is
kilobytes-to-megabytes of bucket rows.

Portability: value sums are fixed-point micros (``floor(v*1e6+0.5)``
summed as BIGINT) — exact, order-independent, and re-aggregable, so
"day from hours" is bit-identical to "day from raw events", which is
exactly what the DuckDB twin (direct GROUP BY per level from the raw
table) verifies.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["time_rollup"]


def time_rollup(df: DataFrame, ts: str = "ts", value: str = "value",
                levels: Sequence[str] = ("minute", "hour", "day"),
                ) -> DataFrame:
    """Rollup ladder -> (level, bucket, n, sum_value_us) with each
    coarser level aggregated from the finer one. ``levels`` must be
    ordered finest-first and each must be a valid ``date_trunc`` unit
    that nests into the next (minute ⊂ hour ⊂ day ⊂ ...)."""
    vfp = F.floor(F.col(value) * F.lit(1e6) + F.lit(0.5)).cast("long")
    cur = (df.groupBy(F.date_trunc(levels[0], F.col(ts)).alias("bucket"))
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum(vfp).alias("sum_value_us")))
    out = cur.select(F.lit(levels[0]).alias("level"), "bucket", "n",
                     "sum_value_us")
    for lv in levels[1:]:
        cur = (cur.groupBy(F.date_trunc(lv, F.col("bucket")).alias("bucket"))
               .agg(F.sum("n").alias("n"),
                    F.sum("sum_value_us").alias("sum_value_us")))
        out = out.unionByName(
            cur.select(F.lit(lv).alias("level"), "bucket", "n",
                       "sum_value_us"))
    return out


def time_rollup_sql(inner: str, ts: str = "ts", value: str = "value",
                    levels: Sequence[str] = ("minute", "hour", "day"),
                    ) -> str:
    """DuckDB twin: each level aggregated DIRECTLY from the raw rows —
    verifying that rollup-from-finer-level equals rollup-from-raw."""
    vfp = f"CAST(floor({value} * 1000000.0 + 0.5) AS BIGINT)"
    parts = [
        (f"SELECT '{lv}' AS level, date_trunc('{lv}', {ts}) AS bucket, "
         f"CAST(count(*) AS BIGINT) AS n, "
         f"CAST(sum({vfp}) AS BIGINT) AS sum_value_us "
         f"FROM ({inner}) GROUP BY 2")
        for lv in levels
    ]
    return " UNION ALL ".join(parts)
