"""Deterministic training-shard writer — the output stage every
training-data pipeline ends with: the curated corpus, globally
pseudo-randomly ordered, split into N balanced shards, with a manifest
(rows / bytes / checksum per shard) that any downstream loader can
verify before training starts.

Design (100 TB shapes):

- **Pseudo-random global order, hash-keyed.** Each doc gets a shuffle
  key from the engine's portable-hash convention (md5-prefix — the same
  Spark/DuckDB-bit-equal idiom as ``doc_train_split``), salted so
  different epochs/cuts reorder independently. Content-keyed, so the
  order is a pure function of the corpus — stable across runs, engines,
  and physical parallelism. No global sort is ever executed: the ORDER
  is (skey, doc_id) lexicographic, realized per-shard.
- **Balanced shards without a coordinator.** ``shard = skey mod N`` —
  balanced in expectation (multinomial: relative imbalance ~
  1/sqrt(rows/shard), <1% at 10k docs/shard), assigned per-row with no
  shuffle, no ntile-style single-partition window, no driver pass.
- **One file per shard, rows in deterministic order.**
  ``repartition(N, shard)`` maps each shard value to exactly one task
  (hash of the value — collisions merge tasks, never split a shard);
  ``sortWithinPartitions(shard, skey, doc_id)`` fixes the row order;
  ``partitionBy(shard)`` writes each shard's rows as one run. Write
  parallelism = N, which is the natural parallelism of the stage.
- **Manifest = the verifiable contract.** Per shard: doc count, byte
  count, and a content checksum (salted portable-hash sum, independent
  of the shuffle salt). The checksum is order-insensitive by
  construction BUT the row order is itself a pure function of the
  checksummed content, so set-integrity + key-derived order covers the
  file byte-for-byte in every way that matters. All three stats are
  plain aggregates — repartition-invariant, oracle-checkable.

Reference has no counterpart (SURVEY §2 — its sinks are report files);
this is forward-looking surface for the corpus family
(``queries/corpus.py``), consuming ``doc_pack_sequences``' upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_N_SHARDS = 8
SHARD_SALT = "shards-v1"
_CK_SALT = "shard-ck-v1"

# 15 md5 hex digits -> 60-bit non-negative bigint, bit-equal in DuckDB as
# ('0x' || substr(md5(..), 1, 15))::BIGINT (queries/text.py _h convention).
_SKEY = ("cast(conv(substring(md5(concat(text, '" + SHARD_SALT
         + "')), 1, 15), 16, 10) as bigint)")
# checksum term is reduced mod 2^31 so a per-shard SUM stays far from
# bigint overflow at any realistic shard size (2^31 * 2^31 < 2^63).
_CKTERM = ("cast(conv(substring(md5(concat(text, '" + _CK_SALT
           + "')), 1, 8), 16, 10) as bigint) % 2147483648")

SQL_SKEY = ("('0x' || substr(md5(text || '" + SHARD_SALT
            + "'), 1, 15))::BIGINT")
SQL_CKTERM = ("('0x' || substr(md5(text || '" + _CK_SALT
              + "'), 1, 8))::BIGINT % 2147483648")


def assign_shards(docs: DataFrame, n_shards: int = DEFAULT_N_SHARDS
                  ) -> DataFrame:
    """Add (shard, _skey) to a document frame. Pure per-row projection —
    no shuffle; every engine/partitioning computes the same assignment."""
    skey = F.expr(_SKEY)
    return (docs.withColumn("_skey", skey)
            .withColumn("shard", F.pmod("_skey", F.lit(n_shards))
                        .cast("int")))


def shard_manifest(docs: DataFrame, n_shards: int = DEFAULT_N_SHARDS
                   ) -> DataFrame:
    """(shard, docs, bytes, checksum) — one partial-aggregated shuffle of
    N output rows; the loader-side verification contract."""
    return (assign_shards(docs, n_shards)
            .groupBy("shard")
            .agg(F.count(F.lit(1)).cast("long").alias("docs"),
                 # octet_length, not length: the manifest labels this
                 # "bytes", so it must be UTF-8 octets (what a loader
                 # checks file sizes against), not characters (ADVICE r5)
                 F.sum(F.octet_length("text")).cast("long").alias("bytes"),
                 F.sum(F.expr(_CKTERM)).cast("long").alias("checksum"))
            .orderBy("shard"))


def write_training_shards(docs: DataFrame, out_dir: str,
                          n_shards: int = DEFAULT_N_SHARDS) -> DataFrame:
    """Write ``<out_dir>/data/shard=K/`` (one parquet file per shard,
    rows in the deterministic (skey, doc_id) order) plus
    ``<out_dir>/manifest/`` — and return the manifest frame.

    The manifest is computed from the SAME assignment expression the
    writer uses, so a loader that re-aggregates the written shards must
    reproduce it exactly (asserted in tests/test_shards.py)."""
    sharded = assign_shards(docs, n_shards)
    (sharded
     .repartition(n_shards, "shard")
     .sortWithinPartitions("shard", "_skey", "doc_id")
     .drop("_skey")
     .write.mode("overwrite").partitionBy("shard")
     .parquet(f"{out_dir}/data"))
    manifest = shard_manifest(docs, n_shards)
    (manifest.coalesce(1).write.mode("overwrite")
     .parquet(f"{out_dir}/manifest"))
    return manifest


def verify_shards(spark, out_dir: str) -> DataFrame:
    """Loader-side verification: re-aggregate the WRITTEN shards and
    compare each row to the stored manifest. Returns (shard, docs,
    bytes, checksum, ok) — a training job runs this before trusting a
    shard set (cost: one narrow scan of the data it is about to read
    anyway). ``ok`` is null for shards present on only one side."""
    stored = spark.read.parquet(f"{out_dir}/manifest")
    actual = (spark.read.parquet(f"{out_dir}/data")
              .groupBy("shard")
              .agg(F.count(F.lit(1)).cast("long").alias("_docs"),
                   F.sum(F.octet_length("text")).cast("long").alias("_bytes"),
                   F.sum(F.expr(_CKTERM)).cast("long").alias("_checksum")))
    return (stored.join(actual, "shard", "full_outer")
            .select("shard", "docs", "bytes", "checksum",
                    ((F.col("docs") == F.col("_docs"))
                     & (F.col("bytes") == F.col("_bytes"))
                     & (F.col("checksum") == F.col("_checksum"))).alias("ok"))
            .orderBy("shard"))
