"""Multimodal pipeline query: binary payload + Pandas-UDF feature
extraction, aggregated per source. The decode is a deterministic stub
(see ``operators/multimodal.py``), so the oracle mirrors its arithmetic
from the byte length — proving the mapInPandas plumbing end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import attach_payload, extract_features
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
