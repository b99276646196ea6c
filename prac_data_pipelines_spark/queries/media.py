"""Multimodal pipeline query: binary payload + Pandas-UDF feature
extraction, aggregated per source. The decode is a deterministic stub
(see ``operators/multimodal.py``), so the oracle mirrors its arithmetic
from the byte length — proving the mapInPandas plumbing end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import (
    attach_payload,
    extract_features,
    resize_images,
    sample_frames,
)
from ..sources import load_table
from . import register


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    feats = extract_features(attach_payload(docs))
    joined = feats.join(docs.select("doc_id", "source"), "doc_id")
    return (
        joined.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_bytes").cast("long").alias("total_bytes"),
            F.sum("ancho").cast("long").alias("suma_ancho"),
            F.sum("alto").cast("long").alias("suma_alto"),
            F.max("n_frames").cast("long").alias("max_frames"),
        )
        .orderBy("source")
    )


SQL_MULTIMODAL_FEATURES = """
WITH feats AS (
  SELECT doc_id, source,
         octet_length(encode(text)) AS n_bytes,
         octet_length(encode(text)) % 640 AS ancho,
         (octet_length(encode(text)) * 7) % 480 AS alto,
         octet_length(encode(text)) % 30 + 1 AS n_frames
  FROM documents
)
SELECT source, count(*)::BIGINT AS n_docs,
       sum(n_bytes)::BIGINT AS total_bytes,
       sum(ancho)::BIGINT AS suma_ancho,
       sum(alto)::BIGINT AS suma_alto,
       max(n_frames)::BIGINT AS max_frames
FROM feats GROUP BY source ORDER BY source
"""

register("multimodal_features", q_multimodal_features, SQL_MULTIMODAL_FEATURES)


def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving 224-fit resize per document (image stand-in):
    the Arrow stage decodes dims and computes the integer-fit target."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        resize_images(attach_payload(docs), target=224)
        .orderBy("doc_id")
    )


SQL_MULTIMODAL_RESIZE = """
WITH dims AS (
  SELECT doc_id,
         greatest(octet_length(encode(text)) % 640, 1) AS w,
         greatest((octet_length(encode(text)) * 7) % 480, 1) AS h,
         octet_length(encode(text)) % 640 AS ancho,
         (octet_length(encode(text)) * 7) % 480 AS alto
  FROM documents
)
SELECT doc_id, ancho::BIGINT AS ancho, alto::BIGINT AS alto,
       ((w * 224) // greatest(w, h))::BIGINT AS res_ancho,
       ((h * 224) // greatest(w, h))::BIGINT AS res_alto
FROM dims ORDER BY doc_id
"""

register("multimodal_resize", q_multimodal_resize, SQL_MULTIMODAL_RESIZE)


def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over the video stand-in: one output row per sampled
    frame (fan-out mapInPandas), every ceil(n_frames/8)-th frame."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        sample_frames(attach_payload(docs), max_frames=8)
        .orderBy("doc_id", "frame_idx")
    )


SQL_MULTIMODAL_FRAMES = """
WITH base AS (
  SELECT doc_id, octet_length(encode(text)) AS n_bytes,
         octet_length(encode(text)) % 30 + 1 AS n_frames
  FROM documents
), params AS (
  SELECT *, (n_frames + 7) // 8 AS stride, n_bytes // n_frames AS flen
  FROM base
), frames AS (
  SELECT doc_id, unnest(range(0, n_frames, stride)) AS frame_idx,
         n_bytes, n_frames, flen
  FROM params
)
SELECT doc_id, frame_idx::BIGINT AS frame_idx,
       (CASE WHEN frame_idx = n_frames - 1 THEN n_bytes - frame_idx * flen
             ELSE flen END)::BIGINT AS frame_bytes
FROM frames ORDER BY doc_id, frame_idx
"""

register("multimodal_frames", q_multimodal_frames, SQL_MULTIMODAL_FRAMES)
