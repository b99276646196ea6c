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

Replay identity (streaming, at-least-once): state rows carry the
``batch_id`` that appended them (-1 for the batch path). With
content-hash doc_ids a pure self-match is ambiguous — it is EITHER a
replayed doc meeting its own first-attempt rows (must be re-kept) OR a
first-delivery doc whose text exactly duplicates one published in an
EARLIER batch (must drop). The state's batch_id disambiguates: only a
self-match whose state row was written by the CURRENT batch is replay;
every other self-match is a genuine cross-batch exact duplicate
(ADVICE r5). Replayed kept docs come back ``mantener=true`` and are
excluded from the append, so verdicts are idempotent and state never
double-bands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.rounding import r4
from .queries import text as _text
from .queries.text import MINHASH_K, N_BANDS, minhash_signatures

N_STATE_BUCKETS = 64
DEFAULT_THRESHOLD = 0.5
# batch_id sentinel for state rows written outside a streaming batch
# (init bulk build, batch-mode increments): never equal to a real Spark
# streaming batch_id (those are >= 0), so batch-path rows can never be
# mistaken for the current attempt's own rows.
NO_BATCH = -1

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
    (_guard_hot_bands(_bands(docs))
     .withColumn("batch_id", F.lit(NO_BATCH).cast("long"))
     .write.mode("overwrite").partitionBy("bkt")
     .parquet(f"{state_dir}/bands"))


def _read_state_bands(spark: SparkSession, state_dir: str) -> DataFrame:
    """State scan that tolerates pre-batch_id states: mergeSchema keeps
    the column visible when old and new files coexist (footer-merge cost
    is bounded because compaction keeps the file count down), and states
    written before the column existed read as all-NO_BATCH."""
    st = (spark.read.option("mergeSchema", "true")
          .parquet(f"{state_dir}/bands"))
    if "batch_id" not in st.columns:
        st = st.withColumn("batch_id", F.lit(NO_BATCH).cast("long"))
    return st.withColumn("batch_id",
                         F.coalesce("batch_id", F.lit(NO_BATCH)))


def incremental_dedup(spark: SparkSession, new_docs: DataFrame,
                      state_dir: str,
                      threshold: float = DEFAULT_THRESHOLD,
                      batch_id: int | None = None,
                      extra_probe_bands: DataFrame | None = None
                      ) -> DataFrame:
    """Keep/drop verdict for every doc in ``new_docs`` against the state
    (and the batch itself), appending the kept docs' bands to the state.

    Returns (doc_id, mantener, dup_de): ``dup_de`` is the lowest-id match
    (existing corpus or lower-id batch doc) for dropped docs, null for
    kept. New doc_ids must not collide with state doc_ids — use
    content-hash or monotonic ids upstream (``ingest_text_dir`` does).

    ``batch_id`` (streaming) gives the append a replay identity: state
    rows this batch already wrote are recognized on replay — the doc is
    re-KEPT (idempotent verdict) and not re-appended — while a
    self-match against an OLDER batch's row stays a genuine cross-batch
    exact-duplicate drop (see module docstring). Without a batch_id
    (batch path), every self-match drops — a batch re-run of the same
    increment is a dedup, not a replay.

    ``extra_probe_bands`` is a transient (doc_id, banda, sigs, bkt) set
    joined as additional probe candidates but never appended — the
    chunked path threads earlier chunks' DROPPED docs through it so
    drop-chains behave exactly as in the one-shot join.
    """
    import os

    bid = NO_BATCH if batch_id is None else int(batch_id)
    new_bands = _bands(new_docs).cache()
    if os.path.isdir(f"{state_dir}/bands"):
        # driver-side literal IN over <=64 bucket ids -> static partition
        # pruning on the state scan; the collect is bucket-cardinality,
        # never data-sized.
        touched = sorted({r["bkt"] for r in
                          new_bands.select("bkt").distinct().collect()})
        old_bands = (_read_state_bands(spark, state_dir)
                     .filter(F.col("bkt").isin(touched)))
    else:
        # first increment bootstraps the state: no old side, the batch
        # dedups against itself only
        old_bands = (new_bands.limit(0)
                     .withColumn("batch_id", F.lit(NO_BATCH).cast("long")))
    if extra_probe_bands is not None:
        old_bands = old_bands.unionByName(
            extra_probe_bands.select("doc_id", "banda", "sigs", "bkt")
            .withColumn("batch_id", F.lit(NO_BATCH).cast("long")))

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
        join with ITSELF. On the state probe, self-pairs are kept UNLESS
        the state row carries the CURRENT batch_id: that row is the
        replayed doc's own first attempt (re-keep), whereas a self-match
        against any other batch's row is a first-delivery doc whose text
        exactly duplicates an earlier-published one — same content-hash
        id, genuine drop (ADVICE r5)."""
        rbatch = (F.col("batch_id") if "batch_id" in right.columns
                  else F.lit(NO_BATCH))
        pairs = F.broadcast(
            left.select(F.col("doc_id").alias("d1"),
                        F.col("sigs").alias("s1"), "banda")
        ).join(right.select(F.col("doc_id").alias("d2"),
                            F.col("sigs").alias("s2"), "banda",
                            rbatch.alias("_b2")),
               "banda")
        if self_join:
            pairs = pairs.filter(F.col("d1") != F.col("d2"))
        elif bid != NO_BATCH:
            pairs = pairs.filter((F.col("d1") != F.col("d2"))
                                 | (F.col("_b2") != bid))
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
    kept_ids = verdict.filter("mantener").select("doc_id")
    if bid != NO_BATCH:
        # replayed docs are already banded (their first attempt wrote the
        # rows that identified the replay) — appending again would
        # double-band the state
        own_ids = (old_bands.filter(F.col("batch_id") == bid)
                   .select("doc_id").distinct())
        kept_ids = kept_ids.join(own_ids, "doc_id", "left_anti")
    kept_bands = new_bands.join(kept_ids, "doc_id", "left_semi")
    (kept_bands.withColumn("batch_id", F.lit(bid).cast("long"))
     .write.mode("append").partitionBy("bkt")
     .parquet(f"{state_dir}/bands"))
    new_bands.unpersist()
    return verdict.orderBy("doc_id")


def incremental_dedup_chunked(spark: SparkSession, new_docs: DataFrame,
                              state_dir: str, chunk_docs: int = 100_000,
                              threshold: float = DEFAULT_THRESHOLD,
                              batch_id: int | None = None) -> DataFrame:
    """``incremental_dedup`` for increments too big to broadcast whole:
    split the batch into doc_id-ORDERED chunks and probe them
    sequentially, each chunk against the state (which by then includes
    the kept docs of earlier chunks).

    Ordered chunking preserves the one-shot semantics EXACTLY: the drop
    rule is lower-id-wins, so for a cross-chunk dup the lower id sits in
    the earlier chunk and the later higher-id side must see it as a
    candidate. Kept earlier docs are in the state by then; DROPPED
    earlier docs are NOT (dropped docs never enter the state), yet the
    one-shot within-batch join still matches against them — MinHash
    similarity is not transitive, so a doc can match a dropped doc
    without matching that doc's own ``dup_de`` (ADVICE r5). Earlier
    chunks' dropped docs therefore ride along in a TRANSIENT probe set
    (``extra_probe_bands`` — joined, never appended), and ``dup_de`` is
    the min across state, transient, and within-chunk matches, exactly
    as the one-shot join computes it (equivalence property test includes
    a non-transitive chain).

    Broadcast size is bounded by one chunk's band set; the state-side
    cost stays bucket-pruned per chunk; the transient set is bounded by
    the increment's dropped docs. Chunk edges come from one
    ``approx_percentile`` pass over doc_id (a fixed-size sketch — never
    an id collect, which would itself be data-sized at 100 TB)."""
    import math

    n = new_docs.count()
    n_chunks = math.ceil(n / chunk_docs) if n else 1
    if n_chunks <= 1:
        return incremental_dedup(spark, new_docs, state_dir, threshold,
                                 batch_id=batch_id)
    qs = ", ".join(str(i / n_chunks) for i in range(1, n_chunks))
    edges = new_docs.agg(F.expr(
        f"approx_percentile(doc_id, array({qs}), 10000)")).first()[0]
    lows = [None, *edges]
    highs = [*edges, None]
    verdicts = []
    dropped_bands: DataFrame | None = None
    for lo, hi in zip(lows, highs):
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (F.col("doc_id") > lo)
        if hi is not None:
            cond = cond & (F.col("doc_id") <= hi)
        chunk = new_docs.filter(cond)
        if not chunk.head(1):  # duplicate sketch edges -> empty range
            continue
        v = incremental_dedup(spark, chunk, state_dir, threshold,
                              batch_id=batch_id,
                              extra_probe_bands=dropped_bands)
        verdicts.append(v)
        dropped = chunk.join(v.filter("NOT mantener").select("doc_id"),
                             "doc_id", "left_semi")
        if dropped.head(1):
            # re-band only the chunk's dropped docs (bounded, determin-
            # istic re-hash); localCheckpoint materializes the small set
            # so later chunks don't re-derive the whole lineage
            db = _bands(dropped).localCheckpoint()
            dropped_bands = (db if dropped_bands is None
                             else dropped_bands.unionByName(db))
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

    def guard_and_tag(df: DataFrame) -> DataFrame:
        # pre-batch_id states compact to the current schema
        if "batch_id" not in df.columns:
            df = df.withColumn("batch_id", F.lit(NO_BATCH).cast("long"))
        return _guard_hot_bands(df).withColumn(
            "batch_id", F.coalesce("batch_id", F.lit(NO_BATCH)))

    return compact_partitions(spark, f"{state_dir}/bands",
                              target_file_mb=target_file_mb,
                              partition_cols=["bkt"],
                              transform=guard_and_tag,
                              read_options={"mergeSchema": "true"})
