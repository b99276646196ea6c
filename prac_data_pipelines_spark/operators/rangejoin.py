"""Bounded-interval (range) join — the "every right row within a time
window of each left row" companion to the as-of operator (``asof.py``,
which keeps only the most recent one).

Naive form: equi-join on the key with the range as a post-join filter.
Correct, but the join itself pairs EVERY (left, right) row of a key before
filtering — a hot key (one user with 1M events) does quadratic work inside
one task, and at 100 TB that single task is the job.

Scalable form (implemented here): time-bucket both sides with bucket width
= window length W. A left row's window ``[l+lower, l+upper]`` has length W,
so it intersects AT MOST TWO buckets — the left side is duplicated into
those (<=2) bucket keys, the right side keyed by its own bucket, and the
join becomes an equi-join on ``(key, bucket)`` with the exact range check
as a filter. The shuffle key carries the time bucket, so a hot key's rows
spread across its active time range instead of landing in one task; pair
work per task is bounded by (key, W-window) density, which is the
theoretical minimum candidate set for a window join.

No counterpart in the reference (its joins are all equi — SURVEY §2.3);
this is forward-looking surface for the event/time-series family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucketed_range_join(left: DataFrame, right: DataFrame, key: str,
                        left_sec: str, right_sec: str,
                        lower: int, upper: int) -> DataFrame:
    """Pair each ``left`` row with every ``right`` row sharing ``key`` whose
    ``right_sec`` lies in ``[left_sec + lower, left_sec + upper]`` (both
    bounds inclusive; strict bounds are one extra ``filter`` on the result).

    ``left_sec`` / ``right_sec`` are integer epoch-seconds columns (use
    ``operators.timeops.epoch_sec`` upstream). Columns of both inputs are
    preserved; name collisions other than ``key`` must be resolved by the
    caller (select/alias before joining), as with any raw join.
    """
    if upper < lower:
        raise ValueError(f"empty range join window: [{lower}, {upper}]")
    # upper == lower is the valid zero-width window ("rows at exactly
    # offset L", both bounds inclusive) — same domain as the naive form;
    # bucket width clamps to 1 so the <=2-bucket probe argument holds.
    width = max(1, upper - lower)
    lo_bkt = F.floor((F.col(left_sec) + F.lit(lower)) / F.lit(width))
    hi_bkt = F.floor((F.col(left_sec) + F.lit(upper)) / F.lit(width))
    probes = left.withColumn(
        "_bkt", F.explode(F.array_distinct(F.array(lo_bkt, hi_bkt))))
    build = right.withColumn(
        "_bkt", F.floor(F.col(right_sec) / F.lit(width)))
    matched = probes.join(build, [key, "_bkt"]).filter(
        F.col(right_sec).between(F.col(left_sec) + F.lit(lower),
                                 F.col(left_sec) + F.lit(upper)))
    # A right row matches a given left row through exactly one bucket (its
    # own), so the probe-side duplication never duplicates result pairs —
    # no dedup pass is needed.
    return matched.drop("_bkt")


def naive_range_join(left: DataFrame, right: DataFrame, key: str,
                     left_sec: str, right_sec: str,
                     lower: int, upper: int) -> DataFrame:
    """Reference form: key equi-join + range filter. Same semantics, hot-key
    quadratic — exists for the property tests and as the honest baseline."""
    if upper < lower:
        raise ValueError(f"empty range join window: [{lower}, {upper}]")
    return left.join(right, key).filter(
        F.col(right_sec).between(F.col(left_sec) + F.lit(lower),
                                 F.col(left_sec) + F.lit(upper)))
