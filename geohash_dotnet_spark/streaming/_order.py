"""Shared (event-time, tiebreak) ordering support for stateful streams.

The stateful streaming twins (flows, stays) repair in-batch disorder by
sorting on (ts, tiebreak) and gate late rows across batches by comparing
against the saved (ts, tiebreak) position.  Both uses must apply the SAME
total order as the batch operator's window ``ORDER BY ts, tiebreak`` —
which compares the tiebreak column in its NATIVE type.  Casting an
integer event id to string would order '10' before '9', segmenting
same-timestamp events differently from the batch twin and, worse,
dropping a genuinely-new row as late when its id is lexicographically
smaller than the saved one.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, Column
from pyspark.sql import functions as F
from pyspark.sql.types import (ByteType, DoubleType, FloatType, IntegerType,
                               LongType, ShortType, StringType)

_INTEGRAL = (ByteType, ShortType, IntegerType, LongType)
_FRACTIONAL = (FloatType, DoubleType)


def tiebreak_projection(
        df: DataFrame, tiebreak: str) -> tuple[Column, str, Callable]:
    """Return ``(column, state_type, to_python)`` for projecting
    ``tiebreak`` into a stateful stream: integral columns stay integers
    (widened to long), float/double stay doubles, strings stay strings
    ordered lexicographically — in every supported case the comparison
    semantics match the batch window's native-type ORDER BY.
    ``state_type`` is the type name to splice into the state struct
    schema; ``to_python`` converts a pandas cell to the plain Python
    value stored in state (so the saved position compares in the same
    domain).  Any other type (decimal, timestamp, ...) raises: its
    string rendering does NOT order like the native type, and silently
    falling back would drop genuinely-new same-timestamp rows as late —
    cast the tiebreak to long/double/string upstream instead."""
    dt = df.schema[tiebreak].dataType
    if isinstance(dt, _INTEGRAL):
        return F.col(tiebreak).cast("long").alias("tb"), "long", int
    if isinstance(dt, _FRACTIONAL):
        return F.col(tiebreak).cast("double").alias("tb"), "double", float
    if isinstance(dt, StringType):
        return F.col(tiebreak).alias("tb"), "string", str
    raise TypeError(
        f"tiebreak column {tiebreak!r} has type {dt.simpleString()}: "
        "lexicographic string ordering diverges from the native ORDER BY "
        "for this type; cast it to long, double, or string upstream")


def drop_unorderable(proj: DataFrame, tb_type: str) -> DataFrame:
    """Drop rows whose position under the (ts_us, tb) total order is
    undefined: NULL event time, NULL tiebreak, or NaN double tiebreak.

    A NULL integral tiebreak would reach pandas as NaN (Arrow promotes
    the column to float64) and crash ``state.update`` on ``int(NaN)``;
    a NaN double tiebreak never satisfies ``tb > saved_tb`` and would
    silently gate a genuinely-new row as late. Neither row can be
    ordered against the batch window's ``ORDER BY ts, tiebreak``
    either, so the stream's contract is explicit: unorderable rows are
    dropped JVM-side before they reach state. Assign non-null ids
    upstream if every event must count."""
    cond = F.col("ts_us").isNotNull() & F.col("tb").isNotNull()
    if tb_type == "double":
        cond = cond & ~F.isnan(F.col("tb"))
    return proj.filter(cond)


def sort_and_gate(pdf, saved_pos):
    """The shared in-UDF half of the ordering contract: sort one
    micro-batch's pandas rows by (ts_us, tb) — a stable mergesort, the
    same total order as the batch window's ORDER BY — and drop rows at
    or before ``saved_pos`` (the per-key saved ``(ts_us, tb)``
    position) as LATE. Every stateful streaming module routes its
    batch through here so a gate fix lands in one place."""
    pdf = pdf.sort_values(["ts_us", "tb"], kind="mergesort")
    if saved_pos is not None:
        s_ts, s_tb = saved_pos
        keep = (pdf["ts_us"].to_numpy() > s_ts) | (
            (pdf["ts_us"].to_numpy() == s_ts)
            & (pdf["tb"].to_numpy(dtype=object) > s_tb))
        pdf = pdf[keep]
    return pdf
