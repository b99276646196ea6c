"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed by Arrow-batched ``mapInPandas`` stages.

Pattern for image/audio/video at 100 TB: the payload travels as a binary
column (or a reference to object storage), metadata as typed columns;
decode / feature-extract / resize / frame-sample run as vectorized pandas
stages over Arrow batches, partitioned by size so batches stay bounded.

The actual media decode is STUBBED here (image/audio libraries are not in
this container): ``decode_stub`` derives deterministic fake features from
the byte stream. The Spark-side plumbing — schema declaration, batch
iteration, partition sizing — is real and oracle-checked.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StructField,
    StructType,
)

FEATURE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_bytes", LongType()),
    StructField("ancho", LongType()),
    StructField("alto", LongType()),
    StructField("n_frames", LongType()),
])


def attach_payload(docs: DataFrame) -> DataFrame:
    """Materialize an opaque binary payload column (UTF-8 bytes of the text
    stand in for a real media blob)."""
    return docs.withColumn("payload", F.encode("text", "UTF-8").cast(BinaryType()))


def decode_stub(payload: bytes) -> tuple[int, int, int]:
    """Deterministic fake decode. A real deployment swaps this for
    PIL/ffmpeg/soundfile; the surrounding plumbing is unchanged."""
    n = len(payload)
    return n % 640, (n * 7) % 480, n % 30 + 1


def extract_features(docs_with_payload: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = pdf["payload"].map(decode_stub)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_bytes": pdf["payload"].map(len),
                "ancho": feats.map(lambda t: t[0]),
                "alto": feats.map(lambda t: t[1]),
                "n_frames": feats.map(lambda t: t[2]),
            })

    return (docs_with_payload.select("doc_id", "payload")
            .mapInPandas(batches, schema=FEATURE_SCHEMA))
