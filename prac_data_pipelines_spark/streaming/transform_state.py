"""Custom stateful operator on the Spark 4 ``transformWithStateInPandas``
API (the successor of ``applyInPandasWithState`` — explicit named state
variables, TTL support, timers, and RocksDB-backed state).

The operator: a per-user running top-K purchase tracker. State is one
ValueState holding (top values desc, total count); each micro-batch folds
its rows into the state and emits the refreshed top-K as (user_id, rango,
valor, n_total) rows. ``n_total`` is monotone per user, so readers of an
update-mode sink can select each user's latest emission without a batch
id. State is keyed by user and a few doubles wide — it shards across
executors and stays cheap at 10⁹ keys; a production deployment would add
``ttl_duration_ms`` at ``getValueState`` to expire idle users.

Requires the RocksDB state store provider (see ``topk_purchases_stream``),
which is bundled with Spark 4, and ``google.protobuf`` on the driver (the
transformWithState worker protocol runs over protobuf; environments
without it should use ``streaming.stateful`` — the
``applyInPandasWithState`` twin has no such dependency).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

TOP_K = 3

OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("rango", LongType()),
    StructField("valor", DoubleType()),
    StructField("n_total", LongType()),
])

_STATE_SCHEMA = StructType([
    StructField("top", ArrayType(DoubleType())),
    StructField("n", LongType()),
])


class TopPurchasesProcessor(StatefulProcessor):
    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("top_purchases", _STATE_SCHEMA)

    def handleInputRows(self, key: tuple, rows: Iterator[pd.DataFrame],
                        timerValues) -> Iterator[pd.DataFrame]:
        if self._state.exists():
            top, n = self._state.get()
            top = list(top)
        else:
            top, n = [], 0
        for pdf in rows:
            vals = pdf["value"].astype(float)
            n += len(vals)
            # merge batch-local top-K, then clip — never holds more than
            # 2K floats regardless of batch size
            top = sorted(top + sorted(vals, reverse=True)[:TOP_K],
                         reverse=True)[:TOP_K]
        self._state.update((top, n))
        yield pd.DataFrame({
            "user_id": pd.Series([key[0]] * len(top), dtype="int64"),
            "rango": pd.Series(range(1, len(top) + 1), dtype="int64"),
            "valor": pd.Series(top, dtype="float64"),
            "n_total": pd.Series([n] * len(top), dtype="int64"),
        })

    def close(self) -> None:
        pass


def topk_purchases_stream(events: DataFrame) -> DataFrame:
    """Per-user running top-K purchase values over a streaming events frame.

    The session must run the RocksDB state store provider::

        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider")
    """
    purchases = events.filter(events.event_type == "purchase")
    return (
        purchases.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            TopPurchasesProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
