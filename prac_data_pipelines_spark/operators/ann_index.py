"""Persisted IVF index: train once, probe many — the ANN serving pattern.

``q_knn_ivf`` (queries/vector.py) trains its coarse quantizer inline,
which is right for a one-shot batch job but wrong for serving: at scale
the k-means assignment of a 100 TB corpus is paid ONCE, written as a
``centroid_id``-partitioned parquet layout, and every later query batch
probes it. Directory partitioning makes the probe read ONLY the
``nprobe`` lists it needs — the scan is pruned at the filesystem level
(``PartitionFilters`` in the plan, asserted by the test), so each query
batch touches ~nprobe/k of the corpus bytes regardless of corpus size.

Layout written by ``build_ivf_index``::

    <index_dir>/centroids/            one small parquet (k rows)
    <index_dir>/lists/centroid_id=i/  the corpus, partitioned by list
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..operators.rounding import r6
from ..operators.similarity import cosine_expr


def build_ivf_index(emb: DataFrame, index_dir: str, k: int = 8,
                    iters: int = 3, corpus: DataFrame | None = None) -> None:
    """Train the coarse quantizer (Lloyd's, deterministic init: lowest ids)
    and persist centroids + the list-partitioned corpus. ``corpus`` lets
    the indexed set differ from the training set (e.g. train on the full
    collection, index only servable vectors); defaults to ``emb``."""
    from ..queries.vector import _assign_to, _recenter

    def _norm(df: DataFrame) -> DataFrame:
        return df.selectExpr(
            "vec_id",
            "transform(embedding, v -> cast(v as double)) AS embedding")

    emb = _norm(emb)
    centroids = (emb.orderBy("vec_id").limit(k)
                 .selectExpr("vec_id AS centroid_id", "embedding AS ce"))
    for _ in range(iters):
        centroids = _recenter(_assign_to(emb, centroids))
    centroids = centroids.cache()
    (centroids.selectExpr("centroid_id", "ce")
     .coalesce(1).write.mode("overwrite")
     .parquet(f"{index_dir}/centroids"))
    assigned = _assign_to(emb if corpus is None else _norm(corpus), centroids)
    (assigned.write.mode("overwrite").partitionBy("centroid_id")
     .parquet(f"{index_dir}/lists"))
    centroids.unpersist()


def probe_ivf_index(spark: SparkSession, index_dir: str, queries: DataFrame,
                    nprobe: int = 2, top_k: int = 3) -> DataFrame:
    """Top-k cosine neighbors for each query row (``qid``, ``qe``) reading
    only the probed lists. The ``centroid_id IN (...)`` filter prunes
    whole directory partitions at the scan."""
    cents = spark.read.parquet(f"{index_dir}/centroids")
    probe_w = Window.partitionBy("qid").orderBy(
        F.col("_sim").desc(), F.col("centroid_id").asc())
    probes = (
        queries.crossJoin(broadcast(cents))
        .selectExpr("qid", "qe", "centroid_id",
                    f"{cosine_expr('qe', 'ce')} AS _sim")
        .withColumn("_rn", F.row_number().over(probe_w))
        .filter(F.col("_rn") <= nprobe)
        .select("qid", "qe", "centroid_id"))
    # serving batches are small: collect the probed list ids so the scan
    # filter is a literal IN over directory partitions (static pruning —
    # visible as PartitionFilters). The collect is over k*nprobe ids at
    # most, never corpus data.
    wanted = sorted({r["centroid_id"] for r in
                     probes.select("centroid_id").distinct().collect()})
    lists = (spark.read.parquet(f"{index_dir}/lists")
             .filter(F.col("centroid_id").isin(wanted)))
    rank_w = Window.partitionBy("qid").orderBy(
        F.col("cos").desc(), F.col("cid").asc())
    return (
        probes.join(lists, "centroid_id")
        .selectExpr("qid", "vec_id AS cid",
                    f"{cosine_expr('qe', 'embedding')} AS _cos")
        .dropDuplicates(["qid", "cid"])
        .select("qid", "cid", r6(F.col("_cos")).alias("cos"))
        .withColumn("rango", F.row_number().over(rank_w).cast("long"))
        .filter(F.col("rango") <= top_k)
        .orderBy("qid", "rango")
    )


def append_to_ivf_index(spark: SparkSession, new_emb: DataFrame,
                        index_dir: str) -> None:
    """Incremental maintenance: assign new vectors to the EXISTING
    centroids and append them into their list partitions (dynamic
    partition append — only touched list directories gain files). The
    quantizer is not retrained; periodic full rebuilds (plus
    ``sinks.lake.compact_partitions`` on the list directories) absorb
    drift — the standard IVF maintenance split."""
    from ..queries.vector import _assign_to

    cents = (spark.read.parquet(f"{index_dir}/centroids")
             .selectExpr("centroid_id", "ce"))
    new_emb = new_emb.selectExpr(
        "vec_id", "transform(embedding, v -> cast(v as double)) AS embedding")
    assigned = _assign_to(new_emb, cents)
    (assigned.write.mode("append").partitionBy("centroid_id")
     .parquet(f"{index_dir}/lists"))
