"""As-of (most-recent-at-or-before) join — an operator Spark lacks natively,
composed from built-ins with ONE shuffle.

Naive form: equi-join on the key with a ``right.time <= left.time`` range
predicate, then keep the max — a fan-out join that explodes on hot keys.
Scalable form (implemented here): union both sides tagged, one partitioned
window pass carries the latest right-side attributes forward
(``last(..., ignoreNulls)`` over key ordered by time), then keep the left
rows. Cost: one shuffle on the key, no fan-out, skew-tolerant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, key: str,
              left_time: str, right_time: str,
              payload_cols: list[str]) -> DataFrame:
    """For each ``left`` row, attach ``payload_cols`` from the most recent
    ``right`` row with the same ``key`` and ``right_time <= left_time``
    (inner as-of semantics: unmatched left rows are dropped).

    Right rows must be unique per (key, right_time) — pre-deduplicate for
    deterministic results, as with any ASOF engine.

    Tie order: a right row at exactly the left row's time IS visible
    (side tag sorts the right row first), matching ``>=`` ASOF semantics.
    """
    left_cols = [c for c in left.columns if c != key]
    right_types = dict(right.dtypes)
    left_types = dict(left.dtypes)

    tagged_left = left.select(
        F.col(key),
        F.col(left_time).cast("timestamp").alias("_t"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in left_cols],
        *[F.lit(None).cast(right_types[c]).alias(c) for c in payload_cols],
    )
    tagged_right = right.select(
        F.col(key),
        F.col(right_time).cast("timestamp").alias("_t"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left_types[c]).alias(c) for c in left_cols],
        *[F.col(c) for c in payload_cols],
    )
    union = tagged_left.unionByName(tagged_right)
    w = (Window.partitionBy(key)
         .orderBy(F.col("_t").asc(), F.col("_side").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = union.select(
        key, "_side", *left_cols,
        *[F.last(F.col(c), ignorenulls=True).over(w).alias(c) for c in payload_cols],
    )
    matched = F.lit(False)
    for c in payload_cols:
        matched = matched | F.col(c).isNotNull()
    return carried.filter((F.col("_side") == 1) & matched).drop("_side")
