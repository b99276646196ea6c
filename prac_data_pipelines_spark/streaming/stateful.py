"""Custom stateful streaming operator via ``applyInPandasWithState``.

Built-in windowed/sessionized aggregations cover most streaming needs
(see ``streaming/events.py``); this is the escape hatch for semantics they
can't express — here, a per-user running anomaly monitor that maintains
(count, mean, M2) Welford state across micro-batches and emits one row per
batch with the updated running statistics and how many events in the batch
exceeded the running z-threshold.

State is keyed by user → shards across executors; each group's state is a
few floats, so 10⁹ keys remain cheap. Timeouts are not used (the monitor
is cumulative); production deployments would set a TTL to expire idle keys.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("n_total", LongType()),
    StructField("media", DoubleType()),
    StructField("varianza", DoubleType()),
    StructField("n_batch", LongType()),
    StructField("n_anomalos_batch", LongType()),
])

STATE_SCHEMA = StructType([
    StructField("n", LongType()),
    StructField("mean", DoubleType()),
    StructField("m2", DoubleType()),
])

Z_THRESHOLD = 3.0


def _update(key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
            state: GroupState) -> Iterator[pd.DataFrame]:
    n, mean, m2 = state.get if state.exists else (0, 0.0, 0.0)
    n_batch = 0
    n_anom = 0
    for pdf in pdfs:
        for v in pdf["value"].astype(float):
            # anomaly check against the PRIOR running stats (cold start: never)
            if n >= 3:
                var = m2 / (n - 1)
                if var > 0 and abs(v - mean) / var ** 0.5 >= Z_THRESHOLD:
                    n_anom += 1
            # Welford update
            n += 1
            delta = v - mean
            mean += delta / n
            m2 += delta * (v - mean)
            n_batch += 1
    state.update((n, mean, m2))
    yield pd.DataFrame({
        "user_id": [key[0]],
        "n_total": [n],
        "media": [mean],
        "varianza": [m2 / (n - 1) if n > 1 else 0.0],
        "n_batch": [n_batch],
        "n_anomalos_batch": [n_anom],
    })


def stream_anomaly_monitor(events: DataFrame) -> DataFrame:
    """Per-user running anomaly monitor over a streaming events frame."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# --------------------------------------------------------------------------
# stream_bot_detection — streaming twin of queries/events.py's
# events_bot_detection: the per-user PEAK sliding-window rate maintained
# across micro-batches. State per user is (running peak, n_total, the
# event-seconds still inside the trailing window span) — the buffer is
# pruned to [max_seen - (W-1), max_seen] after every batch, so state
# stays O(peak) per key regardless of history length. Exact equality
# with the batch range-frame window holds under event-time-ordered
# delivery (the file-replay contract the other twins document); ties at
# a batch boundary are re-anchored by the later tie, which sees the
# full group in its retained buffer.
# --------------------------------------------------------------------------

BOT_OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("n_total", LongType()),
    StructField("pico", LongType()),
    StructField("n_batch", LongType()),
])

BOT_STATE_SCHEMA = StructType([
    StructField("peak", LongType()),
    StructField("n_total", LongType()),
    StructField("recent", ArrayType(LongType())),
])


def _bot_update(key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
                state: GroupState) -> Iterator[pd.DataFrame]:
    import bisect

    from ..queries.events import BOT_WINDOW_SEC

    peak, n_total, recent = (state.get if state.exists else (0, 0, []))
    buf = list(recent)
    secs: list[int] = []
    for pdf in pdfs:
        secs.extend(int(s) for s in pdf["sec"])
    secs.sort()
    for t in secs:
        bisect.insort(buf, t)
    for t in secs:
        lo = bisect.bisect_left(buf, t - (BOT_WINDOW_SEC - 1))
        hi = bisect.bisect_right(buf, t)
        peak = max(peak, hi - lo)
    n_total += len(secs)
    if buf:
        cutoff = buf[-1] - (BOT_WINDOW_SEC - 1)
        buf = [t for t in buf if t >= cutoff]
    state.update((peak, n_total, buf))
    yield pd.DataFrame({
        "user_id": [key[0]],
        "n_total": [n_total],
        "pico": [peak],
        "n_batch": [len(secs)],
    })


def stream_bot_detection(events: DataFrame) -> DataFrame:
    """Per-user running peak sliding-window rate over a streaming events
    frame (one row per user per micro-batch; ``pico`` is monotone, so
    the max across emitted rows is the final peak)."""
    from ..operators.timeops import epoch_sec

    return (
        events.select("user_id", epoch_sec("ts").alias("sec"))
        .groupBy("user_id")
        .applyInPandasWithState(
            _bot_update,
            outputStructType=BOT_OUTPUT_SCHEMA,
            stateStructType=BOT_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# --------------------------------------------------------------------------
# stream_interarrival — streaming twin of queries/events.py's
# events_interarrival: the per-user inter-arrival log2-bucket histogram
# maintained across micro-batches. State per user is just the LAST
# (sec, event_id) seen — O(1) per key regardless of history — so the
# first event of a new micro-batch forms its gap against the previous
# batch's tail (the real cross-batch merge the replay test pins). Each
# batch emits that user's (event_type, cubo) partial counts; summing
# emitted partials equals the batch histogram under event-time-ordered
# delivery (the file-replay contract the other twins document).
# --------------------------------------------------------------------------

IA_OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("event_type", StringType()),
    StructField("cubo", LongType()),
    StructField("n", LongType()),
])

IA_STATE_SCHEMA = StructType([
    StructField("last_sec", LongType()),
    StructField("last_id", LongType()),
])


def _ia_update(key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
    from collections import Counter

    prev = state.get if state.exists else None
    rows: list[tuple[int, int, str]] = []
    for pdf in pdfs:
        rows.extend(zip((int(s) for s in pdf["sec"]),
                        (int(i) for i in pdf["event_id"]),
                        pdf["event_type"]))
    rows.sort(key=lambda r: (r[0], r[1]))
    hist: Counter = Counter()
    for sec, eid, etype in rows:
        if prev is not None:
            hist[(etype, (sec - prev[0] + 1).bit_length() - 1)] += 1
        prev = (sec, eid)
    if prev is not None:
        state.update((prev[0], prev[1]))
    if hist:
        yield pd.DataFrame({
            "user_id": [key[0]] * len(hist),
            "event_type": [t for t, _ in hist],
            "cubo": [b for _, b in hist],
            "n": list(hist.values()),
        })


def stream_interarrival(events: DataFrame) -> DataFrame:
    """Per-user inter-arrival bucket partials over a streaming events
    frame (sum the emitted ``n`` per (event_type, cubo) to reproduce the
    batch histogram)."""
    from ..operators.timeops import epoch_sec

    return (
        events.select("user_id", "event_id", "event_type",
                      epoch_sec("ts").alias("sec"))
        .groupBy("user_id")
        .applyInPandasWithState(
            _ia_update,
            outputStructType=IA_OUTPUT_SCHEMA,
            stateStructType=IA_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
