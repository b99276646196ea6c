"""Incremental near-duplicate state: dedup a NEW batch of documents against
an already-ingested corpus WITHOUT re-processing the corpus.

The batch queries (``queries/text.py``) re-derive MinHash signatures from
text on every run — right for one-shot jobs, wrong for a pipeline that
ingests daily increments into a 100 TB corpus: tokenize+hash of the whole
history would dominate every run. This module persists the signature/band
state once per document, ever:

    <state_dir>/bands/bkt=<i>/   (doc_id, banda, sigs) parquet,
                                 directory-partitioned by a 64-way hash
                                 bucket of the band key

Per increment, work is proportional to the BATCH plus the state rows in
touched buckets: the new side is banded from its own text only, the old
side is read with a ``bkt IN (...)`` partition filter (tiny batches touch
few buckets and prune the rest at the filesystem level), and the candidate
join is the same banded-LSH equi-join as the batch operator — never
all-pairs, never a corpus re-scan of text.

Drop rule (same convention as ``q_doc_curation``'s loser set): a new doc
is dropped when it matches an EXISTING doc at/above the threshold, or when
it is the higher-id side of a new-x-new match. Dropped docs do NOT enter
the state — duplicates never pollute later probes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.rounding import r4
from .queries import text as _text
from .queries.text import MINHASH_K, N_BANDS, minhash_signatures

N_STATE_BUCKETS = 64
DEFAULT_THRESHOLD = 0.5

_BAND_EXPR = (
    f"explode(transform(sequence(0, {N_BANDS - 1}), b -> "
    f"concat(b, ':', element_at(sigs, 2*b+1), ':', element_at(sigs, 2*b+2)))) "
    f"AS banda")


def _bands(docs: DataFrame) -> DataFrame:
    """(doc_id, banda, sigs, bkt) for a document frame with a text column."""
    return (minhash_signatures(docs)
            .selectExpr("doc_id", "sigs", _BAND_EXPR)
            .withColumn("bkt", F.pmod(F.hash("banda"),
                                      F.lit(N_STATE_BUCKETS))))


def _guard_hot_bands(bands: DataFrame) -> DataFrame:
    """Drop bands shared by more than ``queries.text.MAX_BAND_DOCS`` docs —
    the same recall/cost trade as the batch operator's band guard: members
    of a mega-band (corpus-wide boilerplate minimizers) stay reachable
    through their other, discriminative bands, and without the guard one
    hot band makes every probe of it scan thousands of state rows."""
    from pyspark.sql import Window

    w = Window.partitionBy("banda")
    return (bands.withColumn("_n", F.count(F.lit(1)).over(w))
            .filter(F.col("_n") <= _text.MAX_BAND_DOCS).drop("_n"))


def init_dedup_state(docs: DataFrame, state_dir: str) -> None:
    """Build the signature/band state from an initial corpus (hot-band
    guard applied — the bulk build sees global band populations)."""
    (_guard_hot_bands(_bands(docs)).write.mode("overwrite").partitionBy("bkt")
     .parquet(f"{state_dir}/bands"))


def incremental_dedup(spark: SparkSession, new_docs: DataFrame,
                      state_dir: str,
                      threshold: float = DEFAULT_THRESHOLD) -> DataFrame:
    """Keep/drop verdict for every doc in ``new_docs`` against the state
    (and the batch itself), appending the kept docs' bands to the state.

    Returns (doc_id, mantener, dup_de): ``dup_de`` is the lowest-id match
    (existing corpus or lower-id batch doc) for dropped docs, null for
    kept. New doc_ids must not collide with state doc_ids — use
    content-hash or monotonic ids upstream (``ingest_text_dir`` does).
    """
    import os

    new_bands = _bands(new_docs).cache()
    if os.path.isdir(f"{state_dir}/bands"):
        # driver-side literal IN over <=64 bucket ids -> static partition
        # pruning on the state scan; the collect is bucket-cardinality,
        # never data-sized.
        touched = sorted({r["bkt"] for r in
                          new_bands.select("bkt").distinct().collect()})
        old_bands = (spark.read.parquet(f"{state_dir}/bands")
                     .filter(F.col("bkt").isin(touched)))
    else:
        # first increment bootstraps the state: no old side, the batch
        # dedups against itself only
        old_bands = new_bands.limit(0)

    est = F.expr(
        f"size(filter(zip_with(s1, s2, (x, y) -> x = y), v -> v)) "
        f"/ cast({MINHASH_K} as double)")

    def matches(left: DataFrame, right: DataFrame,
                self_join: bool) -> DataFrame:
        """Above-threshold (d1 <- loser, d2 <- kept-candidate) pairs.

        The batch side (left) is broadcast: the state side then streams
        map-side through the join — the corpus is never shuffled, so the
        only state cost per increment is the (bucket-pruned, narrow)
        band scan. An increment too big to broadcast should be split,
        not shuffled against the whole state.

        ``self_join`` excludes d1 == d2 pairs — required for the batch's
        join with ITSELF, but must NOT apply to the state probe: under
        at-least-once replay a re-probed doc carries the same
        content-hash doc_id as the state rows its first attempt wrote,
        and that self-match (dup_de == doc_id) is exactly what makes the
        replay drop it instead of publishing and banding it twice."""
        pairs = F.broadcast(
            left.select(F.col("doc_id").alias("d1"),
                        F.col("sigs").alias("s1"), "banda")
        ).join(right.select(F.col("doc_id").alias("d2"),
                            F.col("sigs").alias("s2"), "banda"),
               "banda")
        if self_join:
            pairs = pairs.filter(F.col("d1") != F.col("d2"))
        return (pairs.select("d1", "d2", r4(est).alias("je"))
                .filter(F.col("je") >= threshold)
                .select("d1", "d2").dropDuplicates(["d1", "d2"]))

    vs_old = matches(new_bands, old_bands, self_join=False)
    vs_new = (matches(new_bands, new_bands, self_join=True)
              .filter(F.col("d2") < F.col("d1")))
    losers = (vs_old.unionByName(vs_new)
              .groupBy(F.col("d1").alias("doc_id"))
              .agg(F.min("d2").alias("dup_de")))
    # localCheckpoint (not cache) pins one consistent verdict for both the
    # state append below and the caller's reads, WITHOUT leaking a cached
    # frame per call: checkpoint blocks are reclaimed by the ContextCleaner
    # once the frame is garbage-collected, whereas a .cache() held across
    # the return boundary lives for the session (one leak per micro-batch
    # in the streaming foreachBatch path).
    verdict = (new_docs.select("doc_id")
               .join(losers, "doc_id", "left")
               .select(F.col("doc_id").cast("long").alias("doc_id"),
                       F.col("dup_de").isNull().alias("mantener"),
                       F.col("dup_de").cast("long").alias("dup_de"))
               .localCheckpoint())
    kept_bands = new_bands.join(
        verdict.filter("mantener").select("doc_id"), "doc_id", "left_semi")
    (kept_bands.write.mode("append").partitionBy("bkt")
     .parquet(f"{state_dir}/bands"))
    new_bands.unpersist()
    return verdict.orderBy("doc_id")


def incremental_dedup_chunked(spark: SparkSession, new_docs: DataFrame,
                              state_dir: str, chunk_docs: int = 100_000,
                              threshold: float = DEFAULT_THRESHOLD
                              ) -> DataFrame:
    """``incremental_dedup`` for increments too big to broadcast whole:
    split the batch into doc_id-ORDERED chunks and probe them
    sequentially, each chunk against the state (which by then includes
    the kept docs of earlier chunks).

    Ordered chunking preserves the one-shot semantics EXACTLY (property
    test): the drop rule is lower-id-wins, so for a cross-chunk dup the
    lower id sits in the earlier chunk, is kept there, enters the state,
    and the later higher-id side drops against it with the same
    ``dup_de`` the within-batch join would have produced. Broadcast size
    is bounded by one chunk's band set; the state-side cost stays
    bucket-pruned per chunk. Chunk edges come from one
    ``approx_percentile`` pass over doc_id (a fixed-size sketch — never
    an id collect, which would itself be data-sized at 100 TB)."""
    import math

    n = new_docs.count()
    n_chunks = math.ceil(n / chunk_docs) if n else 1
    if n_chunks <= 1:
        return incremental_dedup(spark, new_docs, state_dir, threshold)
    qs = ", ".join(str(i / n_chunks) for i in range(1, n_chunks))
    edges = new_docs.agg(F.expr(
        f"approx_percentile(doc_id, array({qs}), 10000)")).first()[0]
    lows = [None, *edges]
    highs = [*edges, None]
    verdicts = []
    for lo, hi in zip(lows, highs):
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (F.col("doc_id") > lo)
        if hi is not None:
            cond = cond & (F.col("doc_id") <= hi)
        chunk = new_docs.filter(cond)
        if not chunk.head(1):  # duplicate sketch edges -> empty range
            continue
        verdicts.append(incremental_dedup(spark, chunk, state_dir,
                                          threshold))
    out = verdicts[0]
    for v in verdicts[1:]:
        out = out.unionByName(v)
    return out.orderBy("doc_id")


def compact_dedup_state(spark: SparkSession, state_dir: str,
                        target_file_mb: int = 128) -> dict:
    """Standing maintenance for the band state: every increment appends up
    to ``N_STATE_BUCKETS`` small files, so a daily pipeline accretes
    thousands of KB-files per bucket over time — the probe scan then pays
    one task per tiny file. Delegates to the lake compactor
    (``sinks.lake.compact_partitions``: stage + atomic swap, per-bucket
    rewrite), preserving the ``bkt`` directory layout the probe's
    partition pruning depends on, and RE-APPLIES the hot-band guard:
    appends cannot see global band populations, so a band crossing the
    threshold between compactions is pruned here — compaction is the
    state's maintenance point for both file count and band health.
    Returns before/after file counts."""
    from .sinks.lake import compact_partitions

    return compact_partitions(spark, f"{state_dir}/bands",
                              target_file_mb=target_file_mb,
                              partition_cols=["bkt"],
                              transform=_guard_hot_bands)
