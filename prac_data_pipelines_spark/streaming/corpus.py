"""Streaming corpus ingestion with stateful near-dup filtering.

Composes the file-source stream with the persisted dedup state
(``incremental.py``): each micro-batch is banded from its own text only,
probed against the state, and only novel documents are published — the
continuous form of ``corpus_pipeline --dedup-state``. The dedup state
lives OUTSIDE the streaming checkpoint (it is a queryable table, shared
with the batch path), so batch backfills and the stream can feed the same
corpus; the checkpoint only tracks which input files were consumed.

At-least-once note: if a batch fails between the state append and the
checkpoint commit, its files replay — re-probed docs then match the
state rows their first attempt wrote and drop as duplicates, so the
published corpus stays unique without a transactional sink (content-hash
doc_ids make the replayed rows identical).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def stream_ingest_dedup(docs_stream: DataFrame, state_dir: str,
                        out_dir: str, checkpoint_dir: str) -> None:
    """Drain available document batches through the dedup state: novel
    docs append to ``<out_dir>/corpus``, every verdict appends to
    ``<out_dir>/verdicts`` (the audit trail of what was dropped and why).
    ``docs_stream`` is any streaming frame with (doc_id, text, ...)."""
    from ..incremental import incremental_dedup

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return
        spark = batch_df.sparkSession
        batch_df = batch_df.dropDuplicates(["doc_id"]).localCheckpoint()
        verdicts = incremental_dedup(
            spark, batch_df.select("doc_id", "text"), state_dir)
        verdicts.write.mode("append").parquet(f"{out_dir}/verdicts")
        kept = batch_df.join(verdicts.filter("mantener").select("doc_id"),
                             "doc_id", "left_semi")
        kept.write.mode("append").parquet(f"{out_dir}/corpus")

    q = (docs_stream.writeStream.foreachBatch(ingest)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
