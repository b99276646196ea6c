"""applyInPandasWithState: the running per-user statistics maintained across
micro-batches must agree with a batch computation over the same events."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def stream_dir(sf_dir):
    d = tempfile.mkdtemp(prefix="events_state_")
    shutil.copy(f"{sf_dir}/events.parquet", f"{d}/part-0.parquet")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_stateful_monitor_matches_batch_stats(spark, stream_dir, sf_dir):
    from prac_data_pipelines_spark.sources import load_table
    from prac_data_pipelines_spark.streaming.events import read_event_stream
    from prac_data_pipelines_spark.streaming.stateful import stream_anomaly_monitor

    stream = stream_anomaly_monitor(read_event_stream(spark, stream_dir))
    q = (stream.writeStream.format("memory").queryName("monitor_test")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination()

    got = {r["user_id"]: r for r in spark.table("monitor_test").collect()}
    want = {
        r["user_id"]: r
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("value").alias("n"),
             F.avg("value").alias("media"),
             F.var_samp("value").alias("varianza"))
        .collect()
    }
    assert set(got) == set(want)
    for uid, w in want.items():
        g = got[uid]
        assert g["n_total"] == w["n"]
        assert abs(g["media"] - w["media"]) < 1e-9
        assert abs(g["varianza"] - w["varianza"]) < 1e-6
