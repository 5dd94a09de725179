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

from pyspark.sql import DataFrame, Column
from pyspark.sql import functions as F
from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

_INTEGRAL = (ByteType, ShortType, IntegerType, LongType)


def tiebreak_projection(df: DataFrame, tiebreak: str) -> tuple[Column, str]:
    """Return ``(column, state_type)`` for projecting ``tiebreak`` into a
    stateful stream: integral columns stay integers (widened to long);
    everything else becomes a string ordered lexicographically — in both
    cases the comparison semantics match the batch window's native-type
    ORDER BY.  ``state_type`` is the type name to splice into the state
    struct schema."""
    dt = df.schema[tiebreak].dataType
    if isinstance(dt, _INTEGRAL):
        return F.col(tiebreak).cast("long").alias("tb"), "long"
    return F.col(tiebreak).cast("string").alias("tb"), "string"
