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


def test_phash_stub_matches_brute_force_and_fits_int64():
    """phash_stub's vectorized cumsum/pooling must equal a straight
    Python rendering of the spec (72 equal byte slices -> mod-256 sums ->
    row-major adjacent comparisons, LSB-first), and the 63-bit pack must
    stay non-negative for any payload."""
    from prac_data_pipelines_spark.operators.multimodal import (
        PHASH_BITS,
        PHASH_COLS,
        PHASH_ROWS,
        phash_stub,
    )

    def brute(payload: bytes) -> int:
        n, cells_n = len(payload), PHASH_ROWS * PHASH_COLS
        cells = [sum(payload[(n * k) // cells_n:(n * (k + 1)) // cells_n])
                 % 256 for k in range(cells_n)]
        h = 0
        for r in range(PHASH_ROWS):
            for c in range(PHASH_COLS - 1):
                if cells[r * PHASH_COLS + c + 1] > cells[r * PHASH_COLS + c]:
                    h |= 1 << (r * (PHASH_COLS - 1) + c)
        return h

    import random

    rng = random.Random(7)
    payloads = [b"", b"x", bytes(range(256)), b"\xff" * 500,
                "héllo ñ world".encode() * 9]
    payloads += [bytes(rng.randrange(256) for _ in range(rng.randrange(400)))
                 for _ in range(40)]
    for p in payloads:
        got = phash_stub(p)
        assert got == brute(p), p[:40]
        assert 0 <= got < (1 << PHASH_BITS)


def test_phash_locality_near_identical_payloads_hamming_close(spark, sf_dir):
    """The dedup contract: a small in-place edit touches few pooling
    cells, so the perceptual hashes of near-identical payloads must stay
    within the banded-capture threshold, while unrelated payloads do not
    collide to 0 distance."""
    from prac_data_pipelines_spark.operators.multimodal import phash_stub

    base = bytes(range(256)) * 4
    edited = bytearray(base)
    edited[100] = 0  # one-byte in-place edit
    ham = bin(phash_stub(base) ^ phash_stub(bytes(edited))).count("1")
    assert ham <= 3, ham
    other = bytes(reversed(base))
    assert bin(phash_stub(base) ^ phash_stub(other)).count("1") > 3


def test_phash_clusters_consistent_with_pairs(spark, sf_dir):
    """Every banded Hamming pair must land in one cluster, cluster sizes
    must sum to the labeled-node count, and every label must be the
    smallest doc_id of its component (min-label semantics)."""
    from prac_data_pipelines_spark.queries.media import (
        q_multimodal_phash_clusters,
        q_multimodal_phash_pairs,
    )

    labels = {r["doc_id"]: r["cluster_id"]
              for r in q_multimodal_phash_clusters(spark, sf_dir).collect()}
    pairs = [(r["d1"], r["d2"])
             for r in q_multimodal_phash_pairs(spark, sf_dir).collect()]
    assert pairs, "fixture corpus should contain phash dup pairs"
    for d1, d2 in pairs:
        assert labels[d1] == labels[d2], (d1, d2)
    # min-label: each cluster id is the smallest member
    by_cluster: dict[int, list[int]] = {}
    for doc, c in labels.items():
        by_cluster.setdefault(c, []).append(doc)
    for c, members in by_cluster.items():
        assert c == min(members)


def test_phash_keep_best_one_winner_per_cluster(spark, sf_dir):
    """Exactly one mantener=true per cluster; singletons always keep;
    the winner has the cluster's largest payload (smallest id on tie)."""
    from prac_data_pipelines_spark.queries.media import (
        q_multimodal_phash_keep_best,
    )

    rows = q_multimodal_phash_keep_best(spark, sf_dir).collect()
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    assert any(len(m) > 1 for m in by_cluster.values())  # real clusters
    for members in by_cluster.values():
        winners = [r for r in members if r["mantener"]]
        assert len(winners) == 1
        best = min(members, key=lambda r: (-r["n_bytes"], r["doc_id"]))
        assert winners[0]["doc_id"] == best["doc_id"]
