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
    left_types = dict(left.dtypes)
    # Payloads travel as ONE struct: the struct itself is non-null for every
    # right row even when all its fields are null, so (a) a match with null
    # payload values is still a match, and (b) a newer all-null right row
    # correctly shadows an older one (per-column last(ignorenulls) would
    # leak the stale value forward).
    payload_struct = F.struct(*[F.col(c) for c in payload_cols])
    struct_type = right.select(payload_struct.alias("_p")).schema["_p"].dataType

    tagged_left = left.select(
        F.col(key),
        F.col(left_time).cast("timestamp").alias("_t"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in left_cols],
        F.lit(None).cast(struct_type).alias("_p"),
    )
    tagged_right = right.select(
        F.col(key),
        F.col(right_time).cast("timestamp").alias("_t"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left_types[c]).alias(c) for c in left_cols],
        payload_struct.alias("_p"),
    )
    union = tagged_left.unionByName(tagged_right)
    w = (Window.partitionBy(key)
         .orderBy(F.col("_t").asc(), F.col("_side").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = union.select(
        key, "_side", *left_cols,
        F.last(F.col("_p"), ignorenulls=True).over(w).alias("_p"),
    )
    return (carried.filter((F.col("_side") == 1) & F.col("_p").isNotNull())
            .select(key, *left_cols,
                    *[F.col("_p").getField(c).alias(c) for c in payload_cols]))
