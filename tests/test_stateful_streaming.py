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


def test_stream_bot_detection_matches_batch_peak(spark, sf_dir):
    """The stateful sliding peak (buffer pruned to the trailing window
    span) must equal the batch range-frame peak per user when the same
    events replay as THREE time-ordered micro-batches — window spans
    crossing every batch boundary included."""
    from pyspark.sql import Window

    from prac_data_pipelines_spark.operators.timeops import epoch_sec
    from prac_data_pipelines_spark.queries.events import BOT_WINDOW_SEC
    from prac_data_pipelines_spark.sources import load_table
    from prac_data_pipelines_spark.streaming.stateful import (
        stream_bot_detection,
    )

    import glob

    ev = load_table(spark, sf_dir, "events")
    d = tempfile.mkdtemp(prefix="events_bot_stream_")
    try:
        # three time-ordered source files -> three micro-batches
        n = ev.count()
        ranked = ev.select("user_id", "ts").orderBy("ts").collect()
        for part in range(3):
            rows = ranked[part * n // 3:(part + 1) * n // 3]
            (spark.createDataFrame(rows, "user_id long, ts timestamp")
             .coalesce(1).write.parquet(f"{d}/b{part}"))
            src = glob.glob(f"{d}/b{part}/part-*.parquet")[0]
            shutil.move(src, f"{d}/part-{part}.parquet")
            shutil.rmtree(f"{d}/b{part}", ignore_errors=True)

        raw = (spark.readStream.format("parquet")
               .schema("user_id long, ts timestamp")
               .option("path", d)
               .option("maxFilesPerTrigger", "1")
               .load())
        q = (stream_bot_detection(raw)
             .writeStream.format("memory").queryName("bot_test")
             .outputMode("update")
             .trigger(availableNow=True).start())
        q.awaitTermination()
        assert q.lastProgress["batchId"] >= 2  # state crossed >= 3 batches

        got = {r["user_id"]: (r["pico"], r["n_total"])
               for r in spark.table("bot_test")
               .groupBy("user_id")
               .agg(F.max("pico").alias("pico"),
                    F.max("n_total").alias("n_total"))
               .collect()}

        w = (Window.partitionBy("user_id").orderBy("_es")
             .rangeBetween(-(BOT_WINDOW_SEC - 1), 0))
        want = {r["user_id"]: (r["pico"], r["n"])
                for r in ev.select("user_id", epoch_sec("ts").alias("_es"))
                .withColumn("_r", F.count(F.lit(1)).over(w))
                .groupBy("user_id")
                .agg(F.max("_r").alias("pico"),
                     F.count(F.lit(1)).alias("n"))
                .collect()}
        assert got == want
    finally:
        shutil.rmtree(d, ignore_errors=True)
