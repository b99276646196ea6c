"""MERGE-style incremental upsert: only touched partitions are rewritten,
keys are last-write-wins, and the streaming foreachBatch path drains into
the same snapshot."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def target_dir():
    d = tempfile.mkdtemp(prefix="upsert_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _snapshot(spark, rows):
    return spark.createDataFrame(rows, "clave INT, valor STRING, dia STRING")


def test_merge_upsert_updates_and_inserts(spark, target_dir):
    from prac_data_pipelines_spark.streaming.upsert import merge_upsert

    base = _snapshot(spark, [(1, "a", "d1"), (2, "b", "d1"), (3, "c", "d2")])
    merge_upsert(base, target_dir, ["clave"], "dia")
    batch = _snapshot(spark, [(2, "B2", "d1"), (4, "d", "d3")])
    merge_upsert(batch, target_dir, ["clave"], "dia")

    got = {(r.clave, r.valor, r.dia)
           for r in spark.read.parquet(target_dir).collect()}
    assert got == {(1, "a", "d1"), (2, "B2", "d1"), (3, "c", "d2"),
                   (4, "d", "d3")}


def test_merge_upsert_leaves_untouched_partitions_alone(spark, target_dir):
    from prac_data_pipelines_spark.streaming.upsert import merge_upsert

    base = _snapshot(spark, [(1, "a", "d1"), (3, "c", "d2")])
    merge_upsert(base, target_dir, ["clave"], "dia")
    before = sorted(glob.glob(f"{target_dir}/dia=d2/*.parquet"))
    mtimes = [os.path.getmtime(p) for p in before]

    merge_upsert(_snapshot(spark, [(1, "A1", "d1")]), target_dir,
                 ["clave"], "dia")
    after = sorted(glob.glob(f"{target_dir}/dia=d2/*.parquet"))
    assert after == before
    assert [os.path.getmtime(p) for p in after] == mtimes  # files untouched
    assert spark.read.parquet(target_dir).filter("clave = 1") \
        .collect()[0].valor == "A1"


def test_streaming_merge_upsert_drains_batches(spark, target_dir):
    from prac_data_pipelines_spark.streaming.upsert import (
        merge_upsert,
        run_merge_upsert,
    )

    merge_upsert(_snapshot(spark, [(1, "a", "d1"), (2, "b", "d2")]),
                 target_dir, ["clave"], "dia")

    src = tempfile.mkdtemp(prefix="upsert_src_")
    ckpt = tempfile.mkdtemp(prefix="upsert_ckpt_")
    try:
        updates = _snapshot(spark, [(2, "B9", "d2"), (5, "e", "d1")])
        updates.write.mode("overwrite").parquet(src)
        stream = (spark.readStream.schema("clave INT, valor STRING, dia STRING")
                  .parquet(src))
        run_merge_upsert(stream, target_dir, ckpt, ["clave"], "dia")
        got = {(r.clave, r.valor) for r in
               spark.read.parquet(target_dir).collect()}
        assert got == {(1, "a"), (2, "B9"), (5, "e")}
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
