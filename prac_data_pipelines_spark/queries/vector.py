"""Similarity-search queries over the ``embeddings`` table (array<float>).

Brute-force cosine top-k is the correctness baseline; the sign-bucket LSH
variant is the scale path (bucketed pair join instead of all-pairs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..operators.rounding import r4, r6
from ..operators.similarity import (
    cosine_expr,
    norm_expr,
    sign_bucket_expr,
    sql_cosine_expr,
    sql_norm_expr,
    sql_sign_bucket_expr,
)
from ..sources import load_table
from . import register

TOP_K = 5
LSH_BITS = 6
LSH_TOP_K = 3


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings")


# --------------------------------------------------------------------------
# knn_brute — exact cosine top-k: small query set broadcast against the
# corpus (one pass over the corpus per batch of queries, no shuffle of the
# corpus), ranked per query with a deterministic tiebreak.
# --------------------------------------------------------------------------

def q_knn_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 8).selectExpr("vec_id AS qid", "embedding AS qe")
    corpus = emb.filter(F.col("vec_id") >= 8).selectExpr("vec_id AS cid", "embedding AS ce")
    scored = (
        broadcast(queries).crossJoin(corpus)
        .selectExpr("qid", "cid", f"{cosine_expr('qe', 'ce')} AS _cos")
        .select("qid", "cid", r6(F.col("_cos")).alias("cos"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("cid").asc())
    return (
        scored.withColumn("rango", F.row_number().over(w).cast("long"))
        .filter(F.col("rango") <= TOP_K)
        .orderBy("qid", "rango")
    )


SQL_KNN_BRUTE = f"""
WITH scored AS (
  SELECT q.vec_id AS qid, c.vec_id AS cid,
         floor({sql_cosine_expr('q.embedding', 'c.embedding')} * 1000000 + 0.5) / 1000000 AS cos
  FROM embeddings q CROSS JOIN embeddings c
  WHERE q.vec_id < 8 AND c.vec_id >= 8
), ranked AS (
  SELECT qid, cid, cos,
         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid ASC)::BIGINT AS rango
  FROM scored
)
SELECT qid, cid, cos, rango FROM ranked WHERE rango <= {TOP_K}
ORDER BY qid, rango
"""

register("knn_brute", q_knn_brute, SQL_KNN_BRUTE)


# --------------------------------------------------------------------------
# knn_lsh — sign-bit LSH bucketing: candidates restricted to the query's
# bucket. At 100 TB the bucket key is the shuffle/partition key; all-pairs
# never materializes.
# --------------------------------------------------------------------------

def q_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    bucketed = emb.selectExpr(
        "vec_id", "embedding", f"{sign_bucket_expr('embedding', LSH_BITS)} AS cubo"
    )
    queries = (bucketed.filter(F.col("vec_id") < 50)
               .selectExpr("vec_id AS qid", "embedding AS qe", "cubo"))
    corpus = (bucketed.filter(F.col("vec_id") >= 50)
              .selectExpr("vec_id AS cid", "embedding AS ce", "cubo"))
    scored = (
        queries.join(corpus, "cubo")
        .selectExpr("qid", "cid", "cubo", f"{cosine_expr('qe', 'ce')} AS _cos")
        .select("qid", "cid", "cubo", r6(F.col("_cos")).alias("cos"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("cid").asc())
    return (
        scored.withColumn("rango", F.row_number().over(w).cast("long"))
        .filter(F.col("rango") <= LSH_TOP_K)
        .orderBy("qid", "rango")
    )


SQL_KNN_LSH = f"""
WITH bucketed AS (
  SELECT vec_id, embedding,
         {sql_sign_bucket_expr('embedding', LSH_BITS)} AS cubo
  FROM embeddings
), scored AS (
  SELECT q.vec_id AS qid, c.vec_id AS cid, q.cubo,
         floor({sql_cosine_expr('q.embedding', 'c.embedding')} * 1000000 + 0.5) / 1000000 AS cos
  FROM bucketed q JOIN bucketed c ON q.cubo = c.cubo
  WHERE q.vec_id < 50 AND c.vec_id >= 50
), ranked AS (
  SELECT qid, cid, cubo, cos,
         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid ASC)::BIGINT AS rango
  FROM scored
)
SELECT qid, cid, cubo, cos, rango FROM ranked WHERE rango <= {LSH_TOP_K}
ORDER BY qid, rango
"""

register("knn_lsh", q_knn_lsh, SQL_KNN_LSH)


# --------------------------------------------------------------------------
# embedding_norms — per-label vector statistics (norm distribution).
# --------------------------------------------------------------------------

def q_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    with_norm = emb.selectExpr("label", f"{norm_expr('embedding')} AS _n")
    return (
        with_norm.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vectores"),
            r4(F.avg("_n")).alias("norma_media"),
            r4(F.min("_n")).alias("norma_min"),
            r4(F.max("_n")).alias("norma_max"),
        )
        .orderBy("label")
    )


SQL_EMBEDDING_NORMS = f"""
WITH n AS (SELECT label, {sql_norm_expr('embedding')} AS _n FROM embeddings)
SELECT label, count(*)::BIGINT AS n_vectores,
       floor(avg(_n) * 10000 + 0.5) / 10000 AS norma_media,
       floor(min(_n) * 10000 + 0.5) / 10000 AS norma_min,
       floor(max(_n) * 10000 + 0.5) / 10000 AS norma_max
FROM n GROUP BY label ORDER BY label
"""

register("embedding_norms", q_embedding_norms, SQL_EMBEDDING_NORMS)
