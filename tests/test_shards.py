"""Deterministic training-shard writer (sinks/shards.py): manifest is
repartition-invariant, written shards reproduce the manifest exactly,
row order inside each shard is the deterministic (skey, doc_id) order,
and shard sizes are balanced."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from prac_data_pipelines_spark.sinks.shards import (
    _SKEY,
    assign_shards,
    shard_manifest,
    write_training_shards,
)
from prac_data_pipelines_spark.sources import load_table


def _manifest_rows(df):
    return [tuple(r) for r in df.collect()]


def test_manifest_invariant_under_parallelism(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    base = _manifest_rows(shard_manifest(docs))
    assert _manifest_rows(shard_manifest(docs.repartition(7))) == base
    assert _manifest_rows(shard_manifest(docs.coalesce(1))) == base
    # and invariant to input row order
    assert _manifest_rows(
        shard_manifest(docs.orderBy(F.desc("doc_id")))) == base


def test_written_shards_match_manifest(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "shards")
    manifest = _manifest_rows(write_training_shards(docs, out, 8))

    # exactly one data file per shard (repartition(N, shard) maps each
    # shard value to a single task)
    for shard, *_ in manifest:
        files = glob.glob(f"{out}/data/shard={shard}/*.parquet")
        assert len(files) == 1, (shard, files)

    written = spark.read.parquet(f"{out}/data")
    # loader-side verification: re-aggregating the written shards
    # reproduces the manifest bit-for-bit
    from prac_data_pipelines_spark.sinks.shards import _CKTERM

    re_agg = (written.groupBy("shard")
              .agg(F.count(F.lit(1)).cast("long").alias("docs"),
                   F.sum(F.length("text")).cast("long").alias("bytes"),
                   F.sum(F.expr(_CKTERM)).cast("long").alias("checksum"))
              .orderBy("shard"))
    assert _manifest_rows(re_agg) == manifest

    # nothing lost, nothing duplicated
    assert (written.select("doc_id").distinct().count()
            == docs.count() == written.count())

    # persisted manifest equals the returned one
    stored = spark.read.parquet(f"{out}/manifest").orderBy("shard")
    assert _manifest_rows(stored) == manifest

    # balance: expectation-balanced hash assignment — no shard more than
    # 2x the mean on this corpus
    counts = [r[1] for r in manifest]
    assert max(counts) <= 2 * (sum(counts) / len(counts))


def test_shard_file_row_order_is_deterministic(spark, sf_dir, tmp_path):
    """Within each written file, rows appear in (skey, doc_id) order —
    the pseudo-random global order a loader streams without shuffling."""
    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "shards")
    write_training_shards(docs, out, 4)
    for path in glob.glob(f"{out}/data/shard=*/"):
        rows = (spark.read.parquet(path)
                .withColumn("_skey", F.expr(_SKEY))
                .select("_skey", "doc_id").collect())
        keys = [(r["_skey"], r["doc_id"]) for r in rows]
        assert keys == sorted(keys)


def test_verify_shards_detects_tampering(spark, sf_dir, tmp_path):
    """verify_shards: all-ok on an intact shard set; a corrupted shard
    flips exactly its own row."""
    import os

    from prac_data_pipelines_spark.sinks.shards import verify_shards

    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "shards")
    write_training_shards(docs, out, 4)
    report = verify_shards(spark, out).collect()
    assert [r["ok"] for r in report] == [True] * 4

    # tamper: drop shard 2's data file
    victim = glob.glob(f"{out}/data/shard=2/*.parquet")[0]
    os.remove(victim)
    report2 = {r["shard"]: r["ok"] for r in verify_shards(spark, out).collect()}
    assert report2[2] is not True  # False (empty scan) or null (missing)
    assert report2[0] and report2[1] and report2[3]


def test_rewrite_is_idempotent(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").limit(200)
    out = str(tmp_path / "shards")
    m1 = _manifest_rows(write_training_shards(docs, out, 4))
    m2 = _manifest_rows(write_training_shards(docs, out, 4))
    assert m1 == m2


def test_assignment_is_content_keyed(spark):
    """A doc's shard depends only on its text — corpus growth or id
    renumbering never migrates existing docs between shards."""
    a = spark.createDataFrame(
        [(1, "alpha document body"), (2, "beta document body")],
        "doc_id long, text string")
    b = spark.createDataFrame(
        [(99, "alpha document body"), (7, "gamma new arrival"),
         (3, "beta document body")],
        "doc_id long, text string")
    sa = {r["text"]: r["shard"] for r in assign_shards(a).collect()}
    sb = {r["text"]: r["shard"] for r in assign_shards(b).collect()}
    for text, shard in sa.items():
        assert sb[text] == shard
