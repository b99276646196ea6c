"""End-to-end corpus curation: artifacts exist, counts reconcile, and the
kept set is disjoint from every drop reason."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_corpus_pipeline_end_to_end(spark, sf_dir, tmp_path):
    from prac_data_pipelines_spark.corpus_pipeline import curate, export
    from prac_data_pipelines_spark.sources import load_table

    out = str(tmp_path / "corpus")
    views = curate(spark, sf_dir)
    export(spark, views, out, sf_dir, build_index=True)

    docs = load_table(spark, sf_dir, "documents")
    curado = spark.read.parquet(f"{out}/curado")
    dropped = spark.read.parquet(f"{out}/descartados")

    n_docs = docs.count()
    n_kept = curado.count()
    n_dropped_ids = dropped.select("doc_id").distinct().count()
    assert 0 < n_kept < n_docs
    assert n_kept + n_dropped_ids == n_docs

    # kept ∩ dropped = empty
    assert curado.join(dropped, "doc_id", "inner").count() == 0
    # drop reasons are the expected closed set
    motivos = {r.motivo for r in dropped.select("motivo").distinct().collect()}
    assert motivos <= {"near_dup", "contaminado", "baja_calidad"}
    # enrichment columns present on the curated output
    assert {"calidad", "idioma"} <= set(curado.columns)

    # per-source stats reconcile against the curated frame
    stats = spark.read.parquet(f"{out}/stats_fuente")
    total = stats.agg(F.sum("docs").alias("d")).collect()[0].d
    assert total == n_kept

    # the ANN index is probeable
    from prac_data_pipelines_spark.operators.ann_index import probe_ivf_index
    emb = load_table(spark, sf_dir, "embeddings")
    q = (emb.filter(F.col("vec_id") < 3)
         .selectExpr("vec_id AS qid",
                     "transform(embedding, v -> cast(v as double)) AS qe"))
    top = probe_ivf_index(spark, f"{out}/ann_index", q, nprobe=2, top_k=3)
    assert top.count() > 0
