"""As-of (temporal) join: attach the most recent right-side row at or
before each left row's timestamp, per key.

The canonical time-series enrichment Spark has no built-in operator for
(attach the last price to each trade, the last profile update to each
event). Implemented Spark-first as the union+window formulation — NOT a
range join:

  * tag left rows 1 and right rows 0, union them;
  * one window per key ordered by (ts, tag) — right rows sort BEFORE
    left rows at equal timestamps, giving the standard ``>=`` as-of
    semantics;
  * ``last(value, ignorenulls=True)`` over the unbounded-preceding
    frame carries each right value forward to every later left row;
  * keep the left rows.

Plan shape (100 TB): ONE hash exchange on the key + a per-key sort —
there is no join node at all, so there is no range-explosion risk and
no build side to size. Skewed keys cost what any per-key window costs;
both inputs shuffle once and stream through the window operator.
DuckDB's native ``ASOF LEFT JOIN`` is the oracle twin — a genuinely
independent algorithm (sorted interpolation join) validating the
window formulation's semantics, including ties at equal timestamps
and left rows with no prior right row.

Requirements: right side unique per (key, right_ts) — dedupe first
(e.g. keep the max event id per timestamp) or matches are ambiguous.
``tolerance_s`` nulls matches older than the tolerance (attach-then-
filter: the LATEST right row is matched first, then aged out — same as
the twin's post-filter on the ASOF match, not "latest within
tolerance").
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "interval_join"]


def asof_join(left: DataFrame, right: DataFrame, key: str,
              left_ts: str = "ts", right_ts: str = "ts",
              values: Sequence[str] = ("value",),
              tolerance_s: float | None = None,
              out_prefix: str = "asof_") -> DataFrame:
    """Left as-of join; returns all left columns plus, per value column
    ``v``, ``{out_prefix}{v}`` and the matched ``{out_prefix}ts``
    (null when no right row at-or-before, or beyond tolerance)."""
    lcols = left.columns
    l = (left.withColumn("__ats", F.col(left_ts))
         .withColumn("__side", F.lit(1)))
    rsel = [F.col(key), F.col(right_ts).alias("__ats"),
            F.lit(0).alias("__side"), F.col(right_ts).alias("__rts")]
    rsel += [F.col(v).alias(f"__rv_{v}") for v in values]
    u = l.unionByName(right.select(*rsel), allowMissingColumns=True)

    w = (Window.partitionBy(key).orderBy("__ats", "__side")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    u = u.withColumn("__mts", F.last("__rts", ignorenulls=True).over(w))
    for v in values:
        u = u.withColumn(f"__mv_{v}",
                         F.last(f"__rv_{v}", ignorenulls=True).over(w))

    res = u.filter(F.col("__side") == 1)
    ok = F.col("__mts").isNotNull()
    if tolerance_s is not None:
        # interval arithmetic works for TIMESTAMP and TIMESTAMP_NTZ
        # alike (unix_micros rejects NTZ) and never consults the
        # session timezone; make_dt_interval instead of an INTERVAL
        # literal because %g-formatted floats go scientific below 1e-4
        # (rejected by the parser) and truncate to 6 significant digits
        tol = F.make_dt_interval(secs=F.lit(float(tolerance_s)))
        ok = ok & ((F.col(left_ts) - F.col("__mts")) <= tol)
    out = [F.col(c) for c in lcols]
    out += [F.when(ok, F.col(f"__mv_{v}")).alias(f"{out_prefix}{v}")
            for v in values]
    out.append(F.when(ok, F.col("__mts")).alias(f"{out_prefix}ts"))
    return res.select(*out)


def interval_join(events: DataFrame, intervals: DataFrame, key: str,
                  ts: str = "ts", start: str = "start_ts",
                  end: str = "end_ts", unit: str = "hour") -> DataFrame:
    """Range (interval-containment) join: each event row matched to
    EVERY interval of the same key with ``start <= ts < end``.

    Spark plans a raw inequality join as a broadcast-nested-loop or a
    cartesian — O(|events| x |intervals|) per key. This is the bucketed
    formulation instead, the temporal analogue of the geohash covering
    join: truncate the event timestamp to a ``unit`` bucket, explode
    each interval into the buckets it overlaps, EQUI-join on
    (key, bucket), then refine with the exact containment predicate.
    Each (event, interval) pair meets in exactly one bucket — the
    event's own — so no post-join dedup is needed.

    Plan shape (100 TB): one shuffle keyed (key, bucket) feeding a hash
    or sort-merge EQUI join; interval blowup is bounded by
    duration/unit buckets per interval (pick ``unit`` near the typical
    interval length). No nested-loop node at any input size
    (plan-asserted in tests). Timestamp math is date_trunc/interval
    arithmetic — works for TIMESTAMP and TIMESTAMP_NTZ, no session-
    timezone dependence. The DuckDB twin is the plain inequality join,
    an independent algorithm validating the bucketed decomposition.
    """
    e = events.withColumn("__b", F.date_trunc(unit, F.col(ts)))
    iv = intervals.withColumn("__b", F.explode(F.sequence(
        F.date_trunc(unit, F.col(start)),
        F.date_trunc(unit, F.col(end)),
        F.expr(f"interval 1 {unit}"))))
    return (e.join(iv, on=[key, "__b"], how="inner")
            .filter((F.col(ts) >= F.col(start)) & (F.col(ts) < F.col(end)))
            .drop("__b"))


def asof_join_sql(left_cte: str, right_cte: str, key: str,
                  left_cols: str, values: Sequence[str] = ("value",),
                  left_ts: str = "ts", right_ts: str = "ts",
                  tolerance_s: float | None = None,
                  out_prefix: str = "asof_") -> str:
    """DuckDB oracle twin using the native ASOF LEFT JOIN."""
    cond = (f"l.{key} = r.{key} AND l.{left_ts} >= r.{right_ts}")
    if tolerance_s is None:
        ok = f"r.{right_ts} IS NOT NULL"
    else:
        tol_us = int(tolerance_s * 1_000_000)
        ok = (f"r.{right_ts} IS NOT NULL AND "
              f"epoch_us(l.{left_ts}) - epoch_us(r.{right_ts}) "
              f"<= {tol_us}")
    vals = ", ".join(
        f"CASE WHEN {ok} THEN r.{v} END AS {out_prefix}{v}"
        for v in values)
    return f"""
WITH l AS ({left_cte}), r AS ({right_cte})
SELECT {left_cols}, {vals},
       CASE WHEN {ok} THEN r.{right_ts} END AS {out_prefix}ts
FROM l ASOF LEFT JOIN r ON {cond}
"""


def interval_join_sql(events_cte: str, intervals_cte: str, key: str,
                      out_cols: str, ts: str = "ts",
                      start: str = "start_ts",
                      end: str = "end_ts") -> str:
    """DuckDB oracle twin of interval_join: the plain inequality join
    (safe at oracle scale, independent of the bucketed plan)."""
    return f"""
WITH e AS ({events_cte}), iv AS ({intervals_cte})
SELECT {out_cols}
FROM e JOIN iv ON e.{key} = iv.{key}
 AND e.{ts} >= iv.{start} AND e.{ts} < iv.{end}
"""
