"""transformWithStateInPandas: the running top-K tracker must agree with a
batch top-K over the same events, with state carried across MULTIPLE
micro-batches (maxFilesPerTrigger=1 over two source files)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

# the transformWithState worker protocol runs over protobuf; without it the
# driver worker cannot start (container lacks google.protobuf — the
# operator itself is exercised wherever the dependency exists)
protobuf = pytest.importorskip(
    "google.protobuf", reason="transformWithState needs google.protobuf")


@pytest.fixture(scope="module")
def split_stream_dir(spark, sf_dir):
    """Events split into two parquet files so the stream runs two batches."""
    from prac_data_pipelines_spark.sources import load_table

    d = tempfile.mkdtemp(prefix="events_tws_")
    ev = load_table(spark, sf_dir, "events")
    # split by event_id parity; write with the raw LONG ts the stream
    # reader expects (mirror of the driver feed's physical schema)
    raw = ev.withColumn("ts", (F.col("ts").cast("long") * 1_000_000_000))
    raw.filter("event_id % 2 = 0").coalesce(1).write.parquet(f"{d}/b0")
    raw.filter("event_id % 2 = 1").coalesce(1).write.parquet(f"{d}/b1")
    for i in (0, 1):
        import glob
        src = glob.glob(f"{d}/b{i}/part-*.parquet")[0]
        shutil.move(src, f"{d}/part-{i}.parquet")
        shutil.rmtree(f"{d}/b{i}")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_topk_state_survives_micro_batches(spark, split_stream_dir, sf_dir):
    from prac_data_pipelines_spark.sources import load_table
    from prac_data_pipelines_spark.streaming.events import EVENTS_SCHEMA
    from prac_data_pipelines_spark.streaming.transform_state import (
        TOP_K,
        topk_purchases_stream,
    )

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider")
    try:
        raw = (spark.readStream.format("parquet")
               .schema(EVENTS_SCHEMA)
               .option("path", split_stream_dir)
               .option("maxFilesPerTrigger", "1")
               .load()
               .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000"))))
        q = (topk_purchases_stream(raw)
             .writeStream.format("memory").queryName("topk_test")
             .outputMode("update").trigger(availableNow=True).start())
        q.awaitTermination()
        assert q.lastProgress["batchId"] >= 1  # state crossed >=2 batches

        rows = spark.table("topk_test").collect()
        # latest emission per user = rows carrying the max n_total
        latest: dict[int, dict[int, float]] = {}
        seen_n: dict[int, int] = {}
        for r in rows:
            u = r["user_id"]
            if u not in seen_n or r["n_total"] > seen_n[u]:
                seen_n[u] = r["n_total"]
                latest[u] = {}
            if r["n_total"] == seen_n[u]:
                latest[u][r["rango"]] = r["valor"]

        w = (load_table(spark, sf_dir, "events")
             .filter("event_type = 'purchase'"))
        want_n = {r["user_id"]: r["n"] for r in
                  w.groupBy("user_id").agg(F.count("*").alias("n")).collect()}
        from pyspark.sql import Window
        win = (Window.partitionBy("user_id")
               .orderBy(F.col("value").desc(), F.col("event_id").asc()))
        want_top = {}
        for r in (w.withColumn("rk", F.row_number().over(win))
                  .filter(F.col("rk") <= TOP_K).collect()):
            want_top.setdefault(r["user_id"], {})[r["rk"]] = r["value"]

        assert set(latest) == set(want_top)
        for u in want_top:
            assert seen_n[u] == want_n[u]
            got_vals = [latest[u][k] for k in sorted(latest[u])]
            want_vals = [want_top[u][k] for k in sorted(want_top[u])]
            assert got_vals == pytest.approx(want_vals)
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
