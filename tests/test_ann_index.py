"""Persisted IVF index: the probe over the partitioned layout must match
the inline-trained q_knn_ivf results exactly (same quantizer constants),
and the probe scan must prune unprobed list partitions."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_index_probe_matches_inline_ivf(spark, sf_dir, tmp_path):
    from prac_data_pipelines_spark.operators.ann_index import (
        build_ivf_index,
        probe_ivf_index,
    )
    from prac_data_pipelines_spark.queries.vector import (
        IVF_NPROBE,
        IVF_TOP_K,
        KMEANS_ITERS,
        KMEANS_K,
        q_knn_ivf,
    )
    from prac_data_pipelines_spark.sources import load_table

    index_dir = str(tmp_path / "ivf")
    emb = load_table(spark, sf_dir, "embeddings")
    # q_knn_ivf trains on the full collection but serves only the corpus
    # side (vec_id >= 40) — mirror that split exactly
    build_ivf_index(emb, index_dir, k=KMEANS_K, iters=KMEANS_ITERS,
                    corpus=emb.filter(F.col("vec_id") >= 40))

    queries = (emb.filter(F.col("vec_id") < 40)
               .selectExpr("vec_id AS qid",
                           "transform(embedding, v -> cast(v as double)) AS qe"))
    got = probe_ivf_index(spark, index_dir, queries,
                          nprobe=IVF_NPROBE, top_k=IVF_TOP_K)
    want = q_knn_ivf(spark, sf_dir)

    got_rows = [(r.qid, r.cid, r.rango, round(r.cos, 6))
                for r in got.collect()]
    want_rows = [(r.qid, r.cid, r.rango, round(r.cos, 6))
                 for r in want.collect()]
    assert got_rows == want_rows and len(got_rows) > 0


def test_probe_scan_prunes_list_partitions(spark, sf_dir, tmp_path):
    from prac_data_pipelines_spark.operators.ann_index import (
        build_ivf_index,
        probe_ivf_index,
    )
    from prac_data_pipelines_spark.sources import load_table

    index_dir = str(tmp_path / "ivf_prune")
    emb = load_table(spark, sf_dir, "embeddings")
    build_ivf_index(emb, index_dir, k=8, iters=1)

    one_query = (emb.filter(F.col("vec_id") == 0)
                 .selectExpr("vec_id AS qid",
                             "transform(embedding, v -> cast(v as double)) AS qe"))
    probed = probe_ivf_index(spark, index_dir, one_query, nprobe=2, top_k=3)
    plan = probed._jdf.queryExecution().executedPlan().toString()
    # the lists scan must carry a static IN PartitionFilter on centroid_id
    # — directory pruning at the filesystem level, not a post-scan filter
    # (match on the filter itself — long tmp paths get truncated out of
    # the rendered Location field)
    assert any("FileScan" in l and "PartitionFilters: [centroid_id" in l
               and " IN " in l for l in plan.splitlines()), plan
    assert probed.count() > 0


def test_append_then_probe_finds_new_vectors(spark, sf_dir, tmp_path):
    from prac_data_pipelines_spark.operators.ann_index import (
        append_to_ivf_index,
        build_ivf_index,
        probe_ivf_index,
    )
    from prac_data_pipelines_spark.sources import load_table

    index_dir = str(tmp_path / "ivf_inc")
    emb = load_table(spark, sf_dir, "embeddings")
    build_ivf_index(emb, index_dir, k=8, iters=1)
    n_before = spark.read.parquet(f"{index_dir}/lists").count()

    # append exact copies of vectors 0..4 under new ids: each copy lands
    # in its original's list and probes at cosine 1.0
    copies = (emb.filter(F.col("vec_id") < 5)
              .withColumn("vec_id", F.col("vec_id") + 5000000))
    append_to_ivf_index(spark, copies, index_dir)
    assert (spark.read.parquet(f"{index_dir}/lists").count()
            == n_before + 5)

    queries = (emb.filter(F.col("vec_id") < 5)
               .selectExpr("vec_id AS qid",
                           "transform(embedding, v -> cast(v as double)) AS qe"))
    top1 = (probe_ivf_index(spark, index_dir, queries, nprobe=2, top_k=1)
            .collect())
    for r in top1:
        assert r.cos == 1.0
        assert r.cid in (r.qid, r.qid + 5000000)


def test_ann_recall_audit_invariants(spark, sf_dir):
    """Per query: 0 <= aciertos <= LSH_TOP_K, recall = aciertos / K, and
    a query whose candidate set spans the whole corpus must score recall
    1.0 (the approximate ranking degenerates to the exact one)."""
    from prac_data_pipelines_spark.queries.vector import (
        LSH_TOP_K,
        q_ann_recall_audit,
    )
    from prac_data_pipelines_spark.sources import load_table

    corpus_n = (load_table(spark, sf_dir, "embeddings")
                .filter(F.col("vec_id") >= 50).count())
    rows = q_ann_recall_audit(spark, sf_dir).collect()
    assert len(rows) == 50  # one row per query, kept even when no cands
    for r in rows:
        assert 0 <= r["aciertos"] <= LSH_TOP_K
        assert 0 <= r["candidatos"] <= corpus_n
        assert abs(r["recall"] - round(r["aciertos"] / LSH_TOP_K, 4)) < 1e-9
        if r["candidatos"] == corpus_n:
            assert r["aciertos"] == LSH_TOP_K


def test_minhash_est_error_decile_invariants(spark, sf_dir):
    """Per decile: the bucket's mean exact Jaccard must lie inside the
    decile's range, estimates are K-quantized in [0,1], and the mean
    absolute error cannot exceed the max."""
    from prac_data_pipelines_spark.queries.text import q_doc_minhash_est_error

    rows = q_doc_minhash_est_error(spark, sf_dir).collect()
    assert rows, "LSH candidates must exist at this SF"
    for r in rows:
        assert 0 <= r["decil"] <= 9
        assert r["pares"] >= 1
        lo, hi = r["decil"] / 10, (r["decil"] + 1) / 10 if r["decil"] < 9 else 1.0
        assert lo - 1e-4 <= r["jac_media"] <= hi + 1e-4
        assert 0.0 <= r["est_media"] <= 1.0
        assert r["err_medio"] <= r["err_max"] + 1e-4


def test_ivf_recall_audit_invariants(spark, sf_dir):
    """Per query: 0 <= aciertos <= IVF_TOP_K, recall = aciertos / K,
    candidate set bounded by the corpus, and full-corpus candidates
    imply perfect recall."""
    from prac_data_pipelines_spark.queries.vector import (
        IVF_TOP_K,
        q_ivf_recall_audit,
    )
    from prac_data_pipelines_spark.sources import load_table

    corpus_n = (load_table(spark, sf_dir, "embeddings")
                .filter(F.col("vec_id") >= 40).count())
    rows = q_ivf_recall_audit(spark, sf_dir).collect()
    assert len(rows) == 40
    for r in rows:
        assert 0 <= r["aciertos"] <= IVF_TOP_K
        assert 0 <= r["candidatos"] <= corpus_n
        assert abs(r["recall"] - round(r["aciertos"] / IVF_TOP_K, 4)) < 1e-9
        if r["candidatos"] == corpus_n:
            assert r["aciertos"] == IVF_TOP_K


def test_emb_drift_audit_invariants(spark, sf_dir):
    """Split accounting must be exact and the drift metrics bounded:
    cos in [-1, 1], max per-dim shift >= 0 with a valid dimension."""
    from prac_data_pipelines_spark.queries.vector import q_emb_drift_audit
    from prac_data_pipelines_spark.sources import load_table

    total = load_table(spark, sf_dir, "embeddings").count()
    r = q_emb_drift_audit(spark, sf_dir).collect()[0]
    assert r["n0"] + r["n1"] == total and r["n0"] > 0 and r["n1"] > 0
    assert -1.0 - 1e-9 <= r["cos_medias"] <= 1.0 + 1e-9
    assert r["desvio_max"] >= 0
    assert 0 <= r["dim_peor"] < 64
    assert r["norma0"] > 0 and r["norma1"] > 0
