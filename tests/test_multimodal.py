"""Multimodal plumbing: batch shapes of the Arrow stages — per-row
features, aspect-preserving resize, and the frame-sampling fan-out."""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark, sf_dir):
    from prac_data_pipelines_spark.operators.multimodal import attach_payload
    from prac_data_pipelines_spark.sources import load_table

    return attach_payload(load_table(spark, sf_dir, "documents"))


def test_resize_fits_target_and_preserves_row_count(spark, sf_dir):
    from prac_data_pipelines_spark.operators.multimodal import resize_images

    docs = _docs(spark, sf_dir)
    out = resize_images(docs, target=224)
    n_docs = docs.count()
    assert out.count() == n_docs
    bad = out.filter((F.col("res_ancho") > 224) | (F.col("res_alto") > 224)
                     | (F.col("res_ancho") < 0) | (F.col("res_alto") < 0))
    assert bad.count() == 0
    # the longer side always lands exactly on the target
    short = out.filter(F.greatest("res_ancho", "res_alto") != 224)
    assert short.count() == 0


def test_frame_sampling_fans_out_and_reassembles(spark, sf_dir):
    from prac_data_pipelines_spark.operators.multimodal import sample_frames

    docs = _docs(spark, sf_dir)
    out = sample_frames(docs, max_frames=8).cache()
    per_doc = out.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"), F.sum("frame_bytes").alias("sampled"))
    # fan-out bounded by max_frames, at least one frame per doc
    assert per_doc.filter((F.col("n") < 1) | (F.col("n") > 8)).count() == 0
    # when every frame is sampled (n_frames <= 8), the slices must
    # reassemble to the full payload byte count exactly
    full = (docs.select("doc_id", F.octet_length("payload").alias("n_bytes"))
            .withColumn("n_frames", F.col("n_bytes") % 30 + 1)
            .filter(F.col("n_frames") <= 8)
            .join(per_doc, "doc_id"))
    assert full.count() > 0
    assert full.filter(F.col("sampled") != F.col("n_bytes")).count() == 0
    out.unpersist()
