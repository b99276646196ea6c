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
    DoubleType,
    LongType,
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
