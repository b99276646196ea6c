"""Timestamp representation contract (operators/timeops.py): every physical
``ts`` form the harness has shipped must normalize to the same UTC instant,
and ``epoch_sec`` must be total over all of them — the round-3 bench/gate
outage was exactly this seam breaking on a representation change."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampNTZType,
    TimestampType,
)

EPOCH_SEC = 1704067200  # 2024-01-01 00:00:00 UTC
WALL = dt.datetime(2024, 1, 1, 0, 0, 0)


def _normalized(spark, df):
    from prac_data_pipelines_spark.operators.timeops import normalize_ts

    out = normalize_ts(df, "ts")
    assert isinstance(out.schema["ts"].dataType, TimestampType)
    return out.select(F.col("ts").cast("long").alias("sec")).first()["sec"]


def test_long_nanos_normalizes(spark):
    df = spark.createDataFrame(
        [(EPOCH_SEC * 1_000_000_000 + 123_456_789,)],
        StructType([StructField("ts", LongType())]))
    # nanos truncate to whole microseconds; cast-to-long floors to seconds
    assert _normalized(spark, df) == EPOCH_SEC


def test_timestamp_ntz_normalizes_as_utc(spark):
    df = spark.createDataFrame(
        [(WALL,)], StructType([StructField("ts", TimestampNTZType())]))
    # session tz is pinned UTC (session.py), so the wall-clock value IS the
    # UTC instant — this equality is the oracle-parity contract
    assert _normalized(spark, df) == EPOCH_SEC


def test_timestamp_already_normalized_is_noop(spark):
    from prac_data_pipelines_spark.operators.timeops import normalize_ts

    df = spark.createDataFrame(
        [(WALL,)], StructType([StructField("ts", TimestampType())]))
    out = normalize_ts(df, "ts")
    assert out is df  # no plan change at all


def test_epoch_sec_total_over_zoned_and_ntz(spark):
    from prac_data_pipelines_spark.operators.timeops import epoch_sec

    for dtype in (TimestampType(), TimestampNTZType()):
        df = spark.createDataFrame(
            [(WALL,)], StructType([StructField("ts", dtype)]))
        got = df.select(epoch_sec("ts").alias("s")).first()["s"]
        assert got == EPOCH_SEC, dtype


def test_loaded_events_meet_contract(spark, sf_dir):
    from prac_data_pipelines_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events")
    assert isinstance(ev.schema["ts"].dataType, TimestampType)
    # sane modern dates — the corrupt-normalization failure mode is 1970
    years = ev.select(F.min(F.year("ts")).alias("lo"),
                      F.max(F.year("ts")).alias("hi")).first()
    assert years["lo"] >= 2000, "ts decoded into the epoch era"
    assert years["hi"] <= 2100
