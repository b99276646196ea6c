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


RESIZE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("ancho", LongType()),
    StructField("alto", LongType()),
    StructField("res_ancho", LongType()),
    StructField("res_alto", LongType()),
])


def resize_stub(w: int, h: int, target: int) -> tuple[int, int]:
    """Integer aspect-preserving fit into target x target. A real deployment
    swaps this for PIL's ``Image.resize`` over the decoded payload; integer
    arithmetic keeps the oracle exactly mirrorable."""
    w, h = max(w, 1), max(h, 1)
    m = max(w, h)
    return (w * target) // m, (h * target) // m


def resize_images(docs_with_payload: DataFrame, target: int = 224) -> DataFrame:
    """Arrow-batched resize stage: decode dims, fit into ``target``^2."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = pdf["payload"].map(decode_stub)
            dims = feats.map(lambda t: resize_stub(t[0], t[1], target))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "ancho": feats.map(lambda t: t[0]),
                "alto": feats.map(lambda t: t[1]),
                "res_ancho": dims.map(lambda t: t[0]),
                "res_alto": dims.map(lambda t: t[1]),
            })

    return (docs_with_payload.select("doc_id", "payload")
            .mapInPandas(batches, schema=RESIZE_SCHEMA))


FRAME_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("frame_idx", LongType()),
    StructField("frame_bytes", LongType()),
])


def sample_frames(docs_with_payload: DataFrame, max_frames: int = 8) -> DataFrame:
    """Arrow-batched frame sampling — the row-fan-out mapInPandas shape.

    Treats the payload as a video of ``n_frames`` equal-length frames and
    emits every ``ceil(n_frames / max_frames)``-th frame as its own row.
    The stage genuinely slices the payload bytes per frame (a real decoder
    would hand each slice to ffmpeg); the emitted length is the slice's.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids: list[int] = []
            idxs: list[int] = []
            sizes: list[int] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                n_frames = n % 30 + 1
                stride = (n_frames + max_frames - 1) // max_frames
                flen = n // n_frames
                for idx in range(0, n_frames, stride):
                    start = idx * flen
                    end = n if idx == n_frames - 1 else (idx + 1) * flen
                    frame = payload[start:end]
                    ids.append(doc_id)
                    idxs.append(idx)
                    sizes.append(len(frame))
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int64"),
                "frame_bytes": pd.Series(sizes, dtype="int64"),
            })

    return (docs_with_payload.select("doc_id", "payload")
            .mapInPandas(batches, schema=FRAME_SCHEMA))


# --------------------------------------------------------------------------
# Perceptual hashing (dHash) — the image-dedup fingerprint. A real
# deployment decodes the payload with PIL, average-pools the grayscale
# image to a PHASH_ROWS x PHASH_COLS grid, and compares horizontally
# adjacent cells (Krawetz's difference hash). Here the decode is the
# deterministic stub consistent with decode_stub: the grid cells are
# average-pool stand-ins computed from equal byte slices of the payload,
# so near-identical payloads of similar length produce Hamming-close
# hashes — the locality property the banded dedup downstream relies on.
# PHASH_ROWS x (PHASH_COLS - 1) = 63 bits, so the packed hash always fits
# a non-negative signed int64 (and DuckDB can mirror it bit-for-bit).
# --------------------------------------------------------------------------

PHASH_ROWS = 9
PHASH_COLS = 8
PHASH_BITS = PHASH_ROWS * (PHASH_COLS - 1)  # 63

PHASH_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("phash", LongType()),
])


def phash_stub(payload: bytes) -> int:
    """dHash over the stub-decoded grid: cell k = sum of the k-th of 72
    equal byte slices mod 256 (average-pool stand-in), bit (r, c) = 1 iff
    cell[r, c+1] > cell[r, c], packed LSB-first in row-major order."""
    import numpy as np

    n = len(payload)
    cells_n = PHASH_ROWS * PHASH_COLS
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
    cs = np.concatenate([[0], np.cumsum(arr)])
    bounds = (n * np.arange(cells_n + 1)) // cells_n
    cells = ((cs[bounds[1:]] - cs[bounds[:-1]]) % 256).reshape(
        PHASH_ROWS, PHASH_COLS)
    bits = (cells[:, 1:] > cells[:, :-1]).flatten()
    return int((bits.astype(np.int64) << np.arange(PHASH_BITS)).sum())


def dhash_images(docs_with_payload: DataFrame) -> DataFrame:
    """Arrow-batched perceptual-hash stage over the binary column."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "phash": pd.Series([phash_stub(p) for p in pdf["payload"]],
                                   dtype="int64"),
            })

    return (docs_with_payload.select("doc_id", "payload")
            .mapInPandas(batches, schema=PHASH_SCHEMA))


HASHED_FRAME_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("frame_idx", LongType()),
    StructField("frame_bytes", LongType()),
    StructField("frame_hash", LongType()),
])


def frame_hash_stub(frame: bytes) -> int:
    """28-bit content fingerprint of one frame: md5 of the frame's
    UPPERCASE hex string (not the raw bytes) so the DuckDB oracle can
    reproduce it bit-for-bit from ``substr(hex(encode(text)), ...)`` —
    the byte-level-parity trick that keeps mapInPandas stages fully
    value-checked. A real deployment hashes the decoded frame tensor."""
    import hashlib

    return int(hashlib.md5(frame.hex().upper().encode("ascii"))
               .hexdigest()[:7], 16)


def sample_frames_hashed(docs_with_payload: DataFrame,
                         max_frames: int = 8) -> DataFrame:
    """``sample_frames`` + per-frame content fingerprint in the same
    Arrow pass (one payload scan; the dedup downstream never touches the
    binary column again)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids: list[int] = []
            idxs: list[int] = []
            sizes: list[int] = []
            hashes: list[int] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                n_frames = n % 30 + 1
                stride = (n_frames + max_frames - 1) // max_frames
                flen = n // n_frames
                for idx in range(0, n_frames, stride):
                    start = idx * flen
                    end = n if idx == n_frames - 1 else (idx + 1) * flen
                    frame = payload[start:end]
                    ids.append(doc_id)
                    idxs.append(idx)
                    sizes.append(len(frame))
                    hashes.append(frame_hash_stub(frame))
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int64"),
                "frame_bytes": pd.Series(sizes, dtype="int64"),
                "frame_hash": pd.Series(hashes, dtype="int64"),
            })

    return (docs_with_payload.select("doc_id", "payload")
            .mapInPandas(batches, schema=HASHED_FRAME_SCHEMA))
