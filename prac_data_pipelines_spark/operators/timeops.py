"""Timestamp representation contract.

The harness's ``events.ts`` column has shipped in two physical forms so far
(int64 epoch-nanoseconds; parquet ``timestamp[us]`` with no zone → Spark
``TIMESTAMP_NTZ``). The engine pins ONE logical contract — ``ts`` is a
session-zoned ``TIMESTAMP`` and the session zone is UTC (``session.py``) —
and funnels every representation through two helpers so the next upstream
change is a one-line fix here, not an eight-site hunt:

- ``normalize_ts``  — schema-inspecting, applied once at the source seam
  (``sources/registry.load_table`` and ``streaming.events.read_event_stream``).
- ``epoch_sec``     — the only sanctioned way to get epoch seconds from a
  time column in query code (never a raw ``col.cast("long")``, which fails
  analysis on TIMESTAMP_NTZ and silently mis-scales on raw int64 input).

With the session zone pinned UTC, ``TIMESTAMP_NTZ → TIMESTAMP`` reinterprets
the wall-clock value as UTC — the same instant DuckDB's ``epoch_us`` yields,
so oracle parity holds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType, TimestampType


def normalize_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize a time column to the engine's UTC TIMESTAMP contract,
    branching on the column's actual type (no-op when already normalized)."""
    dtype = df.schema[col].dataType
    if isinstance(dtype, LongType):
        # int64 epoch-NANOseconds (read via spark.sql.legacy.parquet.nanosAsLong).
        # Integer `div` — `/` goes through double, whose ulp at epoch-ns
        # magnitude is 256 ns → up to 1 µs drift vs exact truncation.
        return df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    if isinstance(dtype, TimestampNTZType):
        # Wall-clock micros, no zone: session zone is pinned UTC, so this
        # cast attaches UTC without shifting the stored value.
        return df.withColumn(col, F.col(col).cast(TimestampType()))
    return df


def epoch_sec(col: Column | str) -> Column:
    """Epoch seconds (LongType) from a normalized TIMESTAMP column.

    Casting through ``timestamp`` first makes this total over both zoned and
    NTZ inputs (a bare ``cast("long")`` on TIMESTAMP_NTZ is an analysis
    error) — cheap insurance against a representation change leaking past
    the source seam.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(TimestampType()).cast("long")
