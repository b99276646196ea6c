"""Streaming corpus ingestion with stateful near-dup filtering.

Composes the file-source stream with the persisted dedup state
(``incremental.py``): each micro-batch is banded from its own text only,
probed against the state, and only novel documents are published — the
continuous form of ``corpus_pipeline --dedup-state``. The dedup state
lives OUTSIDE the streaming checkpoint (it is a queryable table, shared
with the batch path), so batch backfills and the stream can feed the same
corpus; the checkpoint only tracks which input files were consumed.

At-least-once note: if a batch fails between the state append and the
checkpoint commit, its files replay. Two mechanisms make the replay safe
WITHOUT a transactional sink:

- state: band rows carry the ``batch_id`` that appended them, so a
  re-probed doc RECOGNIZES the rows its first attempt wrote (self-match
  tagged with the current batch_id) — its verdict comes back
  ``mantener=true`` again and the append skips it (no double-banding).
  A self-match against an EARLIER batch's row is NOT replay: with
  content-hash doc_ids it is a first-delivery doc whose text exactly
  duplicates one already published, and it drops (ADVICE r5 — the old
  ``dup_de == doc_id`` re-publish rule would have re-published it,
  landing duplicate text in the corpus);
- publish: output goes to a DETERMINISTIC per-batch directory
  (``batch_id=N``, overwrite), and because verdicts are replay-
  idempotent the ``mantener`` set IS the first attempt's kept set — the
  replay rewrites exactly the same files, and a crash between state
  append and publish cannot lose the doc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_content_dedup(docs: DataFrame,
                         watermark: str = "1 hour") -> DataFrame:
    """Watermarked streaming EXACT dedup on content hash — the streaming
    twin of ``doc_exact_dedup``'s hash-group batch plan. State holds one
    entry per distinct ``md5(text)`` inside the watermark horizon (later
    same-content arrivals drop; hashes older than the watermark are
    evicted, so state is O(content-per-window), not O(stream)). This is
    the cheap first gate in front of ``stream_ingest_dedup``'s near-dup
    state: exact clones never reach the MinHash probe. ``docs`` needs
    (doc_id, text, ts)."""
    return (docs.withColumn("text_hash", F.md5("text"))
            .withWatermark("ts", watermark)
            .dropDuplicatesWithinWatermark(["text_hash"]))


def stream_curation_gate(docs: DataFrame, min_clf_score: float = 0.0,
                         watermark: str = "1 hour") -> DataFrame:
    """Streaming twin of the batch curation gate chain: the hashed-bigram
    quality classifier (``corpus_pipeline --min-clf-score``) as a
    STATELESS per-micro-batch filter, feeding survivors through the
    watermarked exact-dedup state (``stream_content_dedup``).

    The classifier is a pure per-row fold (``queries.corpus
    .with_clf_score`` — the exact expression the batch pipeline gates
    with), so verdicts are independent of micro-batch boundaries; the
    only state in the chain is the dedup's content-hash horizon. That
    makes the composition batch-equivalent by construction: score-filter
    then distinct-content == the batch pipeline's clf gate then exact
    dedup (equality pinned on a 3-micro-batch replay in
    tests/test_streaming.py). ``docs`` needs (doc_id, text, ts)."""
    from ..queries.corpus import with_clf_score

    gated = (with_clf_score(docs)
             .filter(F.col("_score") >= min_clf_score)
             .drop("_gi", "_si", "_score"))
    return stream_content_dedup(gated, watermark=watermark)


def stream_phash_dedup(docs: DataFrame,
                       watermark: str = "1 hour") -> DataFrame:
    """Streaming perceptual-hash dedup — the multimodal face of
    ``stream_content_dedup``: each micro-batch's payloads are dHashed in
    the stateless Arrow stage (``operators.multimodal.phash_stub``, the
    same hash the batch pair/cluster family keys on), then the first
    arrival per exact perceptual hash inside the watermark horizon wins.
    Hamming-0 collisions are the dedup core the banded batch pairs
    extend to hamming<=3; the streaming state holds one entry per
    distinct phash per horizon — O(content-per-window), not O(stream).
    ``docs`` needs (doc_id, text, ts)."""
    import pandas as pd
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    from ..operators.multimodal import phash_stub

    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("ts", TimestampType()),
        StructField("phash", LongType()),
    ])

    def batches(it):
        for pdf in it:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "text": pdf["text"],
                "ts": pdf["ts"],
                "phash": pd.Series(
                    [phash_stub(t.encode("utf-8")) for t in pdf["text"]],
                    dtype="int64"),
            })

    hashed = docs.select("doc_id", "text", "ts").mapInPandas(
        batches, schema=schema)
    return (hashed.withWatermark("ts", watermark)
            .dropDuplicatesWithinWatermark(["phash"]))


def stream_ingest_dedup(docs_stream: DataFrame, state_dir: str,
                        out_dir: str, checkpoint_dir: str) -> None:
    """Drain available document batches through the dedup state: novel
    docs append to ``<out_dir>/corpus``, every verdict appends to
    ``<out_dir>/verdicts`` (the audit trail of what was dropped and why).
    ``docs_stream`` is any streaming frame with (doc_id, text, ...).

    Oversized micro-batches (backlog drains, backfills) route through
    ``incremental_dedup_chunked`` — the batch side must broadcast, so it
    is split into id-ordered chunks above 100k docs; small batches take
    the one-shot path inside the same call."""
    from ..incremental import incremental_dedup_chunked

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return
        spark = batch_df.sparkSession
        batch_df = batch_df.dropDuplicates(["doc_id"]).localCheckpoint()
        verdicts = incremental_dedup_chunked(
            spark, batch_df.select("doc_id", "text"), state_dir,
            batch_id=batch_id)
        # deterministic per-batch paths + overwrite = idempotent publish
        # under replay (see module docstring); verdicts are replay-
        # idempotent given batch_id, so mantener alone selects the first
        # attempt's kept set.
        (verdicts.write.mode("overwrite")
         .parquet(f"{out_dir}/verdicts/batch_id={batch_id}"))
        kept = batch_df.join(
            verdicts.filter("mantener").select("doc_id"),
            "doc_id", "left_semi")
        (kept.write.mode("overwrite")
         .parquet(f"{out_dir}/corpus/batch_id={batch_id}"))

    q = (docs_stream.writeStream.foreachBatch(ingest)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()


def stream_eval_contamination(docs: DataFrame,
                              eval_grams: DataFrame) -> DataFrame:
    """Streaming twin of the batch eval-contamination audit
    (``queries/corpus.py q_doc_eval_contamination``): train documents
    arrive as a stream, the fixed eval slice is a STATIC frame
    (``eval_slice_grams`` of the reference corpus), and per-eval-doc
    state holds the set of its grams seen so far in the train stream —
    continuous contamination monitoring during corpus ingestion.

    State is bounded by each eval doc's own distinct-gram count (the
    eval slice is fixed at any corpus scale — the same reason the batch
    broadcast is sound); the stream-static inner join discards every
    train gram outside the eval vocabulary before it reaches the state
    store. Emits ``(eval_doc, matched)`` after each micro-batch that
    ADDS grams to the doc's matched set (duplicate-only batches update
    nothing and emit nothing) — monotone non-decreasing, the latest row
    per doc is the current contamination numerator, ready to divide by
    the static per-doc totals (``eval_contamination_per_doc``)."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )
    from pyspark.sql.types import (
        ArrayType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from ..queries.corpus import train_grams

    out_schema = StructType([
        StructField("eval_doc", LongType()),
        StructField("matched", LongType()),
    ])
    state_schema = StructType([
        StructField("seen", ArrayType(StringType())),
    ])

    def update(key: tuple, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        seen = set(state.get[0]) if state.exists else set()
        before = len(seen)
        for pdf in pdfs:
            seen.update(pdf["grama"])
        # write state + emit only when this batch actually added grams:
        # skips the O(n log n) re-sort, the redundant state write, and a
        # no-news output row (ADVICE-r8); the sink still sees a monotone
        # latest-matched per doc
        if len(seen) > before or not state.exists:
            state.update((sorted(seen),))
            yield pd.DataFrame({"eval_doc": [key[0]],
                                "matched": [len(seen)]})

    hits = train_grams(docs).join(eval_grams, "grama")  # stream-static
    return (hits.groupBy("eval_doc")
            .applyInPandasWithState(
                update,
                outputStructType=out_schema,
                stateStructType=state_schema,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout,
            ))
