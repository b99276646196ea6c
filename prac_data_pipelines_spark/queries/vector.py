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
    dot_expr,
    norm_expr,
    sql_cosine_expr,
    sql_dot_expr,
    sql_norm_expr,
)
from ..sources import load_table
from . import register

TOP_K = 5
LSH_BITS = 6
LSH_TOP_K = 3


def _emb(spark: SparkSession, sf_dir: str,
         parallelize: bool = False) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings", parallelize=parallelize)


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
# knn_lsh — multi-table random-hyperplane LSH (SimHash for cosine): bit j
# is the sign of the dot product with a fixed Rademacher (+-1) hyperplane;
# candidates are the UNION of same-bucket pairs across L tables, exact
# cosine re-ranks the survivors. Axis signs (the naive scheme) measured
# recall 0.04; hyperplanes at 12x6 measure ~0.44 recall while scanning
# ~18% of the corpus — a 2.4x lift over random scanning on THIS corpus,
# whose synthetic embeddings are near-structureless (within-label cosine
# ~0.002); on real clustered embeddings the same scheme concentrates
# sharply. At 100 TB the (table, bucket) key is the shuffle/partition
# key; all-pairs never materializes, and the union costs one exploded
# frame, not L corpus scans.
# --------------------------------------------------------------------------

LSH_TABLES = 12
EMB_DIM = 64

import random as _random

_rng = _random.Random(20260813)
LSH_PLANES = [[_rng.choice((-1, 1)) for _ in range(EMB_DIM)]
              for _ in range(LSH_TABLES * LSH_BITS)]

_PLANES_SPARK = "array(" + ", ".join(
    "array(" + ",".join(f"{s}D" for s in plane) + ")"
    for plane in LSH_PLANES) + ")"
_PLANES_SQL = "[" + ", ".join(
    "[" + ",".join(str(s) for s in plane) + "]"
    for plane in LSH_PLANES) + "]"

# staged projections (memory: Catalyst inlines expressions into HOF
# lambdas multiplicatively — compute bits once, then keys from bits)
_BITS_EXPR = (
    f"transform({_PLANES_SPARK}, h -> "
    f"aggregate(zip_with(embedding, h, (x, s) -> cast(x as double) * s), "
    f"0D, (acc, v) -> acc + v) >= 0D)")
_KEYS_EXPR = (
    f"transform(sequence(0, {LSH_TABLES - 1}), t -> concat(t, ':', "
    f"aggregate(transform(slice(_bits, t * {LSH_BITS} + 1, {LSH_BITS}), "
    f"b -> CASE WHEN b THEN 1L ELSE 0L END), 0L, (acc, x) -> acc * 2 + x)))")


def q_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir, parallelize=True)
    # Narrow bucket frame: (vec_id, cubo) only. Carrying the 64-float
    # embedding through the x12 explode and the bucket join would blow the
    # shuffle up 12x; instead candidates form on ids alone and embeddings
    # join back only for surviving pairs. The query side (a small serving
    # batch) is broadcast, so the corpus bucket frame never shuffles and
    # the expensive 72-plane bits projection runs once per side, pushed
    # below the explode by Catalyst.
    bucketed = (
        emb.selectExpr("vec_id", f"{_BITS_EXPR} AS _bits")
        .selectExpr("vec_id", f"explode({_KEYS_EXPR}) AS cubo"))
    q_keys = (bucketed.filter(F.col("vec_id") < 50)
              .selectExpr("vec_id AS qid", "cubo"))
    c_keys = (bucketed.filter(F.col("vec_id") >= 50)
              .selectExpr("vec_id AS cid", "cubo"))
    cand = (broadcast(q_keys).join(c_keys, "cubo")
            .select("qid", "cid").dropDuplicates(["qid", "cid"]))
    qe = (emb.filter(F.col("vec_id") < 50)
          .selectExpr("vec_id AS qid", "embedding AS qe"))
    ce = (emb.filter(F.col("vec_id") >= 50)
          .selectExpr("vec_id AS cid", "embedding AS ce"))
    scored = (
        broadcast(cand.join(broadcast(qe), "qid")).join(ce, "cid")
        .selectExpr("qid", "cid", f"{cosine_expr('qe', 'ce')} AS _cos")
        .select("qid", "cid", r6(F.col("_cos")).alias("cos"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("cid").asc())
    return (
        scored.withColumn("rango", F.row_number().over(w).cast("long"))
        .filter(F.col("rango") <= LSH_TOP_K)
        .orderBy("qid", "rango")
    )


SQL_KNN_LSH = f"""
WITH bits AS (
  SELECT vec_id, embedding,
         list_transform({_PLANES_SQL}, h ->
           list_sum(list_transform(list_zip(embedding, h),
                    x -> (x[1]::DOUBLE) * x[2])) >= 0) AS _bits
  FROM embeddings
), bucketed AS (
  SELECT vec_id, embedding,
         concat(t, ':', list_reduce(list_prepend(0,
           list_transform(list_slice(_bits, t * {LSH_BITS} + 1,
                                     t * {LSH_BITS} + {LSH_BITS}),
                          b -> CASE WHEN b THEN 1 ELSE 0 END)),
           (acc, x) -> acc * 2 + x)) AS cubo
  FROM bits CROSS JOIN (SELECT unnest(range(0, {LSH_TABLES})) AS t)
), cand AS (
  SELECT DISTINCT q.vec_id AS qid, c.vec_id AS cid,
         q.embedding AS qe, c.embedding AS ce
  FROM bucketed q JOIN bucketed c ON q.cubo = c.cubo
  WHERE q.vec_id < 50 AND c.vec_id >= 50
), scored AS (
  SELECT qid, cid,
         floor({sql_cosine_expr('qe', 'ce')} * 1000000 + 0.5) / 1000000 AS cos
  FROM cand
), ranked AS (
  SELECT qid, cid, cos,
         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid ASC)::BIGINT AS rango
  FROM scored
)
SELECT qid, cid, cos, rango FROM ranked WHERE rango <= {LSH_TOP_K}
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


# --------------------------------------------------------------------------
# emb_quantize — int8 scalar-quantization audit: the standard memory/
# bandwidth lever for serving and ANN-indexing a large embedding corpus
# (4x smaller than float32) is per-dimension min/max uint8 quantization;
# this query measures what that costs BEFORE committing the corpus to
# it: per-label mean reconstruction RMSE and worst per-element error.
#
# Scale shape: per-dim ranges come from one posexplode + groupBy(dim)
# with map-side partial aggregation (the shuffle carries |dims| rows per
# partition, never the corpus); the |dims|-row parameter table collapses
# to ONE broadcast row (array_sort(collect_list(...)) — the kmeans
# broadcast-fold idiom), and reconstruction is a per-row zip_with fold.
# The corpus is scanned twice and never shuffled or joined wide.
#
# Determinism: quantize/reconstruct is per-element IEEE double
# arithmetic in the same expression shape on both engines (floor(x+0.5)
# grid snap); per-vector folds are sequential on both; only the
# per-label AVG re-associates, and it is r6-rounded like every grouped
# mean in the registry.
# --------------------------------------------------------------------------

def q_emb_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    dims = (emb.select(F.posexplode("embedding").alias("dim", "v"))
            .groupBy("dim")
            .agg(F.min(F.col("v").cast("double")).alias("mn"),
                 F.max(F.col("v").cast("double")).alias("mx")))
    params = dims.agg(
        F.expr("array_sort(collect_list(struct(dim, mn, mx)))").alias("P"))
    scale = "((p.mx - p.mn) / cast(255 as double))"
    errs = (
        "zip_with(embedding, P, (v, p) -> "
        "CASE WHEN p.mx = p.mn THEN 0D ELSE "
        f"cast(v as double) - (p.mn + floor((cast(v as double) - p.mn) / "
        f"{scale} + 0.5D) * {scale}) END)")
    per_vec = (emb.crossJoin(broadcast(params))
               .withColumn("_e", F.expr(errs))
               .withColumn("_rmse", F.expr(
                   "sqrt(aggregate(_e, 0D, (acc, e) -> acc + e * e) "
                   "/ size(_e))"))
               .withColumn("_amax", F.expr(
                   "array_max(transform(_e, e -> abs(e)))")))
    return (per_vec.groupBy("label")
            .agg(F.count(F.lit(1)).cast("long").alias("n_vectores"),
                 F.min(F.size("embedding")).cast("long").alias("dims"),
                 r6(F.avg("_rmse")).alias("rmse_media"),
                 r6(F.max("_amax")).alias("error_max"))
            .orderBy("label"))


SQL_EMB_QUANTIZE = """
WITH x AS (
  SELECT unnest(embedding)::DOUBLE AS v,
         generate_subscripts(embedding, 1) AS dim
  FROM embeddings
), d AS (
  SELECT dim, min(v) AS mn, max(v) AS mx FROM x GROUP BY dim
), pp AS (
  SELECT list({'mn': mn, 'mx': mx} ORDER BY dim) AS P FROM d
), e AS (
  SELECT label, embedding,
         list_transform(range(1, len(embedding) + 1), i ->
           CASE WHEN P[i].mx = P[i].mn THEN 0.0::DOUBLE ELSE
             embedding[i]::DOUBLE - (P[i].mn
               + floor((embedding[i]::DOUBLE - P[i].mn)
                       / ((P[i].mx - P[i].mn) / CAST(255 AS DOUBLE)) + 0.5)
                 * ((P[i].mx - P[i].mn) / CAST(255 AS DOUBLE)))
           END) AS errs
  FROM embeddings CROSS JOIN pp
)
SELECT label, count(*)::BIGINT AS n_vectores,
       min(len(embedding))::BIGINT AS dims,
       floor(avg(sqrt(list_sum(list_transform(errs, e -> e * e))
                      / len(errs))) * 1000000 + 0.5) / 1000000 AS rmse_media,
       floor(max(list_max(list_transform(errs, e -> abs(e))))
             * 1000000 + 0.5) / 1000000 AS error_max
FROM e GROUP BY label ORDER BY label
"""

register("emb_quantize", q_emb_quantize, SQL_EMB_QUANTIZE)


# --------------------------------------------------------------------------
# kmeans_embeddings — distributed Lloyd's k-means over the embedding
# corpus: deterministic init (first K vectors), 3 refinement rounds of
# assign-to-nearest-centroid (cosine, broadcast centroids) followed by a
# per-dimension mean (posexplode -> groupBy(centroid, dim) -> rebuild
# array), means rounded to 1e-6 so both engines agree bit-for-bit despite
# different floating-point summation orders. This is the trained-centroid
# path the IVF index swaps in at deployment (q_knn_ivf's first-N
# assignment keeps the identical plan shape). Oracle: the SAME three
# rounds unrolled as SQL CTEs.
# --------------------------------------------------------------------------

KMEANS_K = 8
KMEANS_ITERS = 3


def _assign_to(emb: DataFrame, centroids: DataFrame) -> DataFrame:
    """Nearest-centroid assignment by cosine (ties -> lowest centroid id).

    Shuffle-free: the k centroids collapse into ONE broadcast row holding
    a sorted struct array, and the per-vector argmax is an array fold —
    ``array_max`` over (sim, -centroid_id) structs, whose lexicographic
    order makes ties resolve to the LOWEST id, matching the previous
    row_number tie rule. The earlier form shuffled the whole scored
    (n x k) frame through a per-vec_id row_number window on EVERY Lloyd
    iteration; assignment now costs zero exchanges, so an iteration pays
    only the recenter aggregation.

    NaN-ordering caveat as in _ivf_ranked's fold: relies on
    cosine_expr's non-zero-norm precondition (operators/similarity.py).
    """
    packed = centroids.agg(F.expr(
        "sort_array(collect_list(struct(centroid_id, ce))) AS _cents"))
    best = (f"array_max(transform(_cents, c -> "
            f"struct({cosine_expr('embedding', 'c.ce')} AS s, "
            f"-c.centroid_id AS nid)))")
    return (emb.crossJoin(broadcast(packed))
            .selectExpr("vec_id", "embedding",
                        f"cast(-({best}.nid) as bigint) AS centroid_id"))


def _recenter(assigned: DataFrame) -> DataFrame:
    """Per-dimension mean of each cluster, rounded 1e-6 for parity."""
    dims = assigned.select("centroid_id",
                           F.posexplode("embedding").alias("d", "v"))
    means = (dims.groupBy("centroid_id", "d")
             .agg(F.expr("floor(avg(cast(v as double)) * 1000000 + 0.5) "
                         "/ 1000000").alias("m")))
    return (means.groupBy("centroid_id")
            .agg(F.expr("transform(array_sort(collect_list(struct(d, m))), "
                        "s -> s.m)").alias("ce")))


def q_kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir).selectExpr(
        "vec_id", "transform(embedding, v -> cast(v as double)) AS embedding")
    centroids = (emb.filter(F.col("vec_id") < KMEANS_K)
                 .selectExpr("vec_id AS centroid_id", "embedding AS ce"))
    for _ in range(KMEANS_ITERS):
        assigned = _assign_to(emb, centroids)
        centroids = _recenter(assigned)
    # the trained centroids feed TWO consumers (the final assignment's
    # packed broadcast and the cohesion join's broadcast) whose exchanges
    # are not reusable — without materialization the whole lazy
    # three-iteration Lloyd chain executes once per consumer. K rows.
    centroids = centroids.localCheckpoint()
    final = _assign_to(emb, centroids)
    scored = (
        final.join(broadcast(centroids), "centroid_id")
        .selectExpr("centroid_id", f"{cosine_expr('embedding', 'ce')} AS _cos"))
    return (
        scored.groupBy(F.col("centroid_id").cast("long").alias("centroid_id"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_vectores"),
             r4(F.avg("_cos")).alias("cohesion"))
        .orderBy("centroid_id")
    )


def _sql_assign(emb_cte: str, cent_cte: str) -> str:
    return f"""(
  SELECT vec_id, embedding, centroid_id FROM (
    SELECT e.vec_id, e.embedding, c.centroid_id,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {sql_cosine_expr('e.embedding', 'c.ce')} DESC,
                                       c.centroid_id ASC) AS rn
    FROM {emb_cte} e CROSS JOIN {cent_cte} c
  ) WHERE rn = 1
)"""


_SQL_RECENTER = """(
  SELECT centroid_id, list(m ORDER BY d) AS ce FROM (
    SELECT centroid_id, d,
           floor(avg(embedding[d + 1]::DOUBLE) * 1000000 + 0.5) / 1000000 AS m
    FROM {src} CROSS JOIN (SELECT unnest(range(0, 64)) AS d)
    GROUP BY centroid_id, d
  ) GROUP BY centroid_id
)"""

SQL_KMEANS_EMBEDDINGS = f"""
WITH emb AS (
  SELECT vec_id, list_transform(embedding, v -> v::DOUBLE) AS embedding
  FROM embeddings
), c0 AS (
  SELECT vec_id AS centroid_id, embedding AS ce FROM emb
  WHERE vec_id < {KMEANS_K}
), a1 AS {_sql_assign('emb', 'c0')}, c1 AS {_SQL_RECENTER.format(src='a1')},
a2 AS {_sql_assign('emb', 'c1')}, c2 AS {_SQL_RECENTER.format(src='a2')},
a3 AS {_sql_assign('emb', 'c2')}, c3 AS {_SQL_RECENTER.format(src='a3')},
final AS {_sql_assign('emb', 'c3')}
SELECT f.centroid_id::BIGINT AS centroid_id, count(*)::BIGINT AS n_vectores,
       floor(avg({sql_cosine_expr('f.embedding', 'c.ce')}) * 10000 + 0.5) / 10000
         AS cohesion
FROM final f JOIN c3 c ON f.centroid_id = c.centroid_id
GROUP BY f.centroid_id ORDER BY f.centroid_id
"""

register("kmeans_embeddings", q_kmeans_embeddings, SQL_KMEANS_EMBEDDINGS)


# --------------------------------------------------------------------------
# knn_ivf — IVF ANN over TRAINED centroids: the Lloyd's k-means below
# (kmeans_embeddings) provides the coarse quantizer; every corpus vector
# joins its nearest list, and each query probes its IVF_NPROBE nearest
# lists (multi-probe — single-probe recall is bounded by how often the
# true neighbor shares the query's one list). At scale the centroid
# assignment partitions the corpus (the inverted lists ARE the shuffle
# partitioning) and centroids broadcast.
# --------------------------------------------------------------------------

IVF_TOP_K = 3
IVF_NPROBE = 2


def _ivf_ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, embedding, centroid_id, _rn) — every vector ranked
    against the trained IVF coarse quantizer (rank 1 = home list,
    ranks <= IVF_NPROBE = probe lists). Shared by knn_ivf and
    ivf_recall_audit so both run the identical index.

    Shuffle-free ranking (r10): the old form scored the n x K crossJoin
    and ranked it through ``Window.partitionBy(vec_id)`` — a full
    exchange + sort of corpus x K rows each carrying TWO 64-double
    arrays, exactly the "shuffling heavy payloads to decide placement"
    anti-pattern. Both consumers only ever read ranks <= IVF_NPROBE, so
    the rank is now an in-row fold: sort the K (−sim, centroid_id)
    structs (lexicographic = sim desc, ties -> lowest id — the
    row_number order), slice the top IVF_NPROBE, posexplode. Zero
    exchanges, and the frame shrinks from n x K to n x NPROBE rows.

    The trained centroids are ``localCheckpoint``ed (K rows): the lazy
    Lloyd chain otherwise nests one plan per iteration and re-executes
    per consumer subtree."""
    emb = _emb(spark, sf_dir).selectExpr(
        "vec_id", "transform(embedding, v -> cast(v as double)) AS embedding")
    centroids = (emb.filter(F.col("vec_id") < KMEANS_K)
                 .selectExpr("vec_id AS centroid_id", "embedding AS ce"))
    for _ in range(KMEANS_ITERS):
        centroids = _recenter(_assign_to(emb, centroids))
    centroids = centroids.localCheckpoint()

    packed = centroids.agg(F.expr(
        "sort_array(collect_list(struct(centroid_id, ce))) AS _cents"))
    # NaN caveat (ADVICE-r10): this fold and the SQL twin's row_number
    # rank NaN sims at OPPOSITE ends — safe only under cosine_expr's
    # documented non-zero-norm precondition (operators/similarity.py),
    # which the corpus and the Lloyd means satisfy by construction.
    probe = (f"slice(sort_array(transform(_cents, c -> "
             f"struct(-({cosine_expr('embedding', 'c.ce')}) AS ns, "
             f"c.centroid_id AS cid))), 1, {IVF_NPROBE})")
    return (emb.crossJoin(broadcast(packed))
            .select("vec_id", "embedding",
                    F.posexplode(F.expr(probe)).alias("_i", "_c"))
            .selectExpr("vec_id", "embedding", "_c.cid AS centroid_id",
                        "cast(_i + 1 as int) AS _rn")
            .cache())


def q_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ranked = _ivf_ranked(spark, sf_dir)
    queries = (ranked.filter((F.col("vec_id") < 40)
                             & (F.col("_rn") <= IVF_NPROBE))
               .selectExpr("vec_id AS qid", "embedding AS qe", "centroid_id"))
    corpus = (ranked.filter((F.col("vec_id") >= 40) & (F.col("_rn") == 1))
              .selectExpr("vec_id AS cid", "embedding AS ce", "centroid_id"))
    scored_pairs = (
        queries.join(corpus, "centroid_id")
        .dropDuplicates(["qid", "cid"])
        .selectExpr("qid", "cid", f"{cosine_expr('qe', 'ce')} AS _cos")
        .select("qid", "cid", r6(F.col("_cos")).alias("cos"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("cid").asc())
    return (
        scored_pairs.withColumn("rango", F.row_number().over(w).cast("long"))
        .filter(F.col("rango") <= IVF_TOP_K)
        .orderBy("qid", "rango")
    )


SQL_KNN_IVF = f"""
WITH emb AS (
  SELECT vec_id, list_transform(embedding, v -> v::DOUBLE) AS embedding
  FROM embeddings
), c0 AS (
  SELECT vec_id AS centroid_id, embedding AS ce FROM emb
  WHERE vec_id < {KMEANS_K}
), a1 AS {_sql_assign('emb', 'c0')}, c1 AS {_SQL_RECENTER.format(src='a1')},
a2 AS {_sql_assign('emb', 'c1')}, c2 AS {_SQL_RECENTER.format(src='a2')},
a3 AS {_sql_assign('emb', 'c2')}, c3 AS {_SQL_RECENTER.format(src='a3')},
ranked_assign AS (
  SELECT e.vec_id, e.embedding, c.centroid_id,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY {sql_cosine_expr('e.embedding', 'c.ce')} DESC,
                                     c.centroid_id ASC) AS rn
  FROM emb e CROSS JOIN c3 c
), scored AS (
  SELECT DISTINCT q.vec_id AS qid, c.vec_id AS cid,
         floor({sql_cosine_expr('q.embedding', 'c.embedding')} * 1000000 + 0.5) / 1000000 AS cos
  FROM ranked_assign q JOIN ranked_assign c ON q.centroid_id = c.centroid_id
  WHERE q.vec_id < 40 AND q.rn <= {IVF_NPROBE}
    AND c.vec_id >= 40 AND c.rn = 1
), ranked AS (
  SELECT qid, cid, cos,
         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid ASC)::BIGINT AS rango
  FROM scored
)
SELECT qid, cid, cos, rango FROM ranked WHERE rango <= {IVF_TOP_K}
ORDER BY qid, rango
"""

register("knn_ivf", q_knn_ivf, SQL_KNN_IVF)




# --------------------------------------------------------------------------
# emb_near_dup — embedding-cosine near-duplicate detection: hyperplane
# bucket candidates, exact cosine verify at NEAR_DUP_COS, keep-lowest-id
# winner per pair. Duplicates are synthesized deterministically (a
# re-keyed copy of vec_id < 30, the doc_exact_dedup pattern) so the
# operator is demonstrable on the near-structureless synthetic corpus;
# identical vectors share EVERY bucket, so recall at cos=1 is guaranteed.
#
# Bucket keys are DEDICATED near-dup keys — 6 tables x 12 bits (4096
# buckets per table, the same 72 hyperplanes as knn_lsh re-sliced) — not
# knn's 12 x 6-bit keys: near-dup needs far fewer, far finer buckets
# (candidates at cos >= 0.98 agree on almost every bit: P[12-bit band
# agrees] ~ 0.45, six tables -> ~0.97 recall at the threshold boundary),
# while 6-bit keys give only 64 buckets per table and the in-bucket
# self-join goes quadratic with corpus size (measured 569 s at the 32x
# clone probe; seconds with these keys). The hot-bucket guard
# (MAX_BUCKET_VECS, enforced identically in the oracle) backstops
# degenerate embedding collapse. At scale this is the embedding-space
# member of the dedup family: bucket-join + verify, never all-pairs.
# --------------------------------------------------------------------------

NEAR_DUP_COS = 0.98
ND_TABLES = 6
ND_BITS = 12  # 6 x 12 = 72 = all available hyperplanes
MAX_BUCKET_VECS = 1000

_ND_KEYS_EXPR = (
    f"transform(sequence(0, {ND_TABLES - 1}), t -> concat(t, ':', "
    f"aggregate(transform(slice(_bits, t * {ND_BITS} + 1, {ND_BITS}), "
    f"b -> CASE WHEN b THEN 1L ELSE 0L END), 0L, (acc, x) -> acc * 2 + x)))")


def q_emb_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir, parallelize=True)
    copies = (emb.filter(F.col("vec_id") < 30)
              .withColumn("vec_id", F.col("vec_id") + 1000000))
    union = emb.unionByName(copies)
    # cache: the bucketed frame (with its hyperplane dot products) feeds
    # both sides of the self-join
    w_cubo = Window.partitionBy("cubo")
    bucketed = (
        union.selectExpr("vec_id", "embedding", f"{_BITS_EXPR} AS _bits")
        .selectExpr("vec_id", "embedding", f"explode({_ND_KEYS_EXPR}) AS cubo")
        .withColumn("_n", F.count(F.lit(1)).over(w_cubo))
        .filter(F.col("_n") <= MAX_BUCKET_VECS).drop("_n")
        .cache())
    left = bucketed.selectExpr("vec_id AS d1", "embedding AS e1", "cubo")
    right = bucketed.selectExpr("vec_id AS d2", "embedding AS e2", "cubo")
    # cosine + threshold BEFORE the pair dedup: the cosine is a pure
    # function of the pair's embeddings (identical in every bucket the
    # pair collides in), so the dedup shuffle carries only (d1, d2, cos)
    # survivors instead of two dim-length float arrays per banded
    # candidate
    return (
        left.join(right, "cubo")
        .filter(F.col("d1") < F.col("d2"))
        .selectExpr("d1", "d2", f"{cosine_expr('e1', 'e2')} AS _cos")
        .select(F.col("d1").cast("long").alias("d1"),
                F.col("d2").cast("long").alias("d2"),
                r6(F.col("_cos")).alias("cos"))
        .filter(F.col("cos") >= NEAR_DUP_COS)
        .dropDuplicates(["d1", "d2"])
        .orderBy("d1", "d2")
    )


SQL_EMB_NEAR_DUP = f"""
WITH unioned AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000, embedding FROM embeddings WHERE vec_id < 30
), bits AS (
  SELECT vec_id, embedding,
         list_transform({_PLANES_SQL}, h ->
           list_sum(list_transform(list_zip(embedding, h),
                    x -> (x[1]::DOUBLE) * x[2])) >= 0) AS _bits
  FROM unioned
), bucketed0 AS (
  SELECT vec_id, embedding,
         concat(t, ':', list_reduce(list_prepend(0,
           list_transform(list_slice(_bits, t * {ND_BITS} + 1,
                                     t * {ND_BITS} + {ND_BITS}),
                          b -> CASE WHEN b THEN 1 ELSE 0 END)),
           (acc, x) -> acc * 2 + x)) AS cubo
  FROM bits CROSS JOIN (SELECT unnest(range(0, {ND_TABLES})) AS t)
), bucketed AS (
  SELECT vec_id, embedding, cubo FROM (
    SELECT *, count(*) OVER (PARTITION BY cubo) AS _n FROM bucketed0)
  WHERE _n <= {MAX_BUCKET_VECS}
), cand AS (
  SELECT DISTINCT l.vec_id AS d1, r.vec_id AS d2,
         l.embedding AS e1, r.embedding AS e2
  FROM bucketed l JOIN bucketed r ON l.cubo = r.cubo AND l.vec_id < r.vec_id
)
SELECT d1::BIGINT AS d1, d2::BIGINT AS d2,
       floor({sql_cosine_expr('e1', 'e2')} * 1000000 + 0.5) / 1000000 AS cos
FROM cand
WHERE floor({sql_cosine_expr('e1', 'e2')} * 1000000 + 0.5) / 1000000 >= {NEAR_DUP_COS}
ORDER BY d1, d2
"""

register("emb_near_dup", q_emb_near_dup, SQL_EMB_NEAR_DUP)


# --------------------------------------------------------------------------
# emb_semantic_dedup — SemDeDup-style semantic deduplication (Abbas et al.
# 2023, arXiv:2303.09540): cluster the corpus, then mark near-semantic
# duplicates WITHIN each cluster only — the cluster assignment replaces
# the all-pairs join, so pair work is sum(|cluster|^2), bounded by keeping
# K proportional to corpus size (plus a hot-cluster cap, enforced
# identically in the oracle, as the backstop against degenerate collapse).
# Keep-rule per duplicate pair: the vector closer to its centroid is
# dropped (SemDeDup keeps the outlier — it carries more information),
# ties broken toward keeping the lower vec_id. Clones are synthesized
# (re-keyed copies of vec_id < 30, the established pattern) so the
# operator is demonstrable on the near-structureless synthetic corpus.
# Centroids here are the deterministic seed set (first K vectors) so the
# oracle stays tractable; the production path swaps in trained centroids
# from the Lloyd's rounds above (identical plan shape — assignment is the
# same broadcast crossJoin + row_number).
#
# K is ADAPTIVE: K = max(8, N // 256), computed identically in both
# engines, so mean cluster size stays ~SEM_TARGET no matter the corpus —
# pair work is sum(|cluster|^2) ~ N x SEM_TARGET, i.e. LINEAR in N. A
# fixed K would make clusters grow with the corpus and the in-cluster
# join quadratic (the band-key-cardinality lesson in SCALING.md, which
# also applies to cluster counts); the hot-cluster cap stays as the
# backstop for degenerate collapse, not the scaling mechanism. The
# count() that sizes K is a driver-side scalar of the centroid-
# cardinality class (same rank as the k-means centroid collect).
# --------------------------------------------------------------------------

SEM_K_MIN = 8
SEM_TARGET = 256
SEM_COS = 0.9
MAX_CLUSTER_VECS = 2000


def q_emb_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir).selectExpr(
        "vec_id", "transform(embedding, v -> cast(v as double)) AS embedding")
    clones = (emb.filter(F.col("vec_id") < 30)
              .withColumn("vec_id", F.col("vec_id") + 1000000))
    union = emb.unionByName(clones)
    k = max(SEM_K_MIN, union.count() // SEM_TARGET)
    centroids = (emb.filter(F.col("vec_id") < k)
                 .selectExpr("vec_id AS centroid_id", "embedding AS ce"))
    # Assignment is the same shuffle-free broadcast fold as _assign_to
    # (argmax via array_max over (sim, -id) structs — ties to the lowest
    # centroid id, identical to the oracle's row_number tie rule). The
    # explode-of-one barrier pins the fold to a single evaluation:
    # projection collapse would otherwise inline it once per extracted
    # field, re-running every cosine in the fold per field.
    packed = centroids.agg(F.expr(
        "sort_array(collect_list(struct(centroid_id, ce))) AS _cents"))
    best = (f"array_max(transform(_cents, c -> "
            f"struct({cosine_expr('embedding', 'c.ce')} AS s, "
            f"-c.centroid_id AS nid)))")
    w_cluster = Window.partitionBy("centroid_id")
    assigned = (
        union.crossJoin(broadcast(packed))
        .select("vec_id", "embedding",
                F.explode(F.array(F.expr(best))).alias("_best"))
        .select("vec_id", "embedding",
                (-F.col("_best.nid")).cast("long").alias("centroid_id"),
                r6(F.col("_best.s")).alias("_ccos"))
        .withColumn("_n", F.count(F.lit(1)).over(w_cluster))
        .filter(F.col("_n") <= MAX_CLUSTER_VECS).drop("_n")
        .cache())
    left = assigned.selectExpr("vec_id AS d1", "embedding AS e1",
                               "centroid_id", "_ccos AS c1")
    right = assigned.selectExpr("vec_id AS d2", "embedding AS e2",
                                "centroid_id", "_ccos AS c2")
    dominated = (
        left.join(right, "centroid_id")
        .filter(F.col("d1") != F.col("d2"))
        .filter((F.col("c2") > F.col("c1"))
                | ((F.col("c2") == F.col("c1")) & (F.col("d2") < F.col("d1"))))
        .selectExpr("d1", "centroid_id", f"{cosine_expr('e1', 'e2')} AS _cos")
        .filter(r6(F.col("_cos")) >= SEM_COS)
        .select("d1").dropDuplicates(["d1"])
        .withColumn("_drop", F.lit(1)))
    return (
        assigned.join(dominated, assigned.vec_id == dominated.d1, "left")
        .groupBy(F.col("centroid_id").cast("long").alias("centroid_id"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_vectores"),
             F.sum(F.coalesce(F.col("_drop"), F.lit(0)))
             .cast("long").alias("n_descartados"))
        .orderBy("centroid_id")
    )


SQL_EMB_SEMANTIC_DEDUP = f"""
WITH emb AS (
  SELECT vec_id, list_transform(embedding, v -> v::DOUBLE) AS embedding
  FROM embeddings
), unioned AS (
  SELECT vec_id, embedding FROM emb
  UNION ALL
  SELECT vec_id + 1000000, embedding FROM emb WHERE vec_id < 30
), cent AS (
  SELECT vec_id AS centroid_id, embedding AS ce FROM emb
  WHERE vec_id < (SELECT greatest({SEM_K_MIN}, count(*) // {SEM_TARGET})
                  FROM unioned)
), assigned0 AS (
  SELECT vec_id, embedding, centroid_id,
         floor(_sim * 1000000 + 0.5) / 1000000 AS _ccos FROM (
    SELECT u.vec_id, u.embedding, c.centroid_id,
           {sql_cosine_expr('u.embedding', 'c.ce')} AS _sim,
           row_number() OVER (PARTITION BY u.vec_id
                              ORDER BY {sql_cosine_expr('u.embedding', 'c.ce')} DESC,
                                       c.centroid_id ASC) AS rn
    FROM unioned u CROSS JOIN cent c
  ) WHERE rn = 1
), assigned AS (
  SELECT vec_id, embedding, centroid_id, _ccos FROM (
    SELECT *, count(*) OVER (PARTITION BY centroid_id) AS _n FROM assigned0)
  WHERE _n <= {MAX_CLUSTER_VECS}
), dominated AS (
  SELECT DISTINCT l.vec_id AS d1
  FROM assigned l JOIN assigned r
    ON l.centroid_id = r.centroid_id AND l.vec_id != r.vec_id
   AND (r._ccos > l._ccos OR (r._ccos = l._ccos AND r.vec_id < l.vec_id))
  WHERE floor({sql_cosine_expr('l.embedding', 'r.embedding')} * 1000000 + 0.5)
          / 1000000 >= {SEM_COS}
)
SELECT a.centroid_id::BIGINT AS centroid_id,
       count(*)::BIGINT AS n_vectores,
       sum(CASE WHEN d.d1 IS NULL THEN 0 ELSE 1 END)::BIGINT AS n_descartados
FROM assigned a LEFT JOIN dominated d ON a.vec_id = d.d1
GROUP BY a.centroid_id ORDER BY a.centroid_id
"""

register("emb_semantic_dedup", q_emb_semantic_dedup, SQL_EMB_SEMANTIC_DEDUP)


# --------------------------------------------------------------------------
# emb_label_centroids — embedding-space class audit: per-label centroid
# (per-dimension mean, r6 like the k-means recenter), intra-label
# cohesion (mean cosine of members to their own centroid), and
# separability (the nearest OTHER label's centroid and its cosine).
# The standard health check before using labels for classifier training
# or stratified sampling: low cohesion or a too-close neighbor flags
# label noise / collapsed classes.
#
# Plan shape: one posexplode shuffle keyed by (label, dim) for the
# centroids (map-side partial avg), centroid table broadcast back for
# the member cosine pass, and a |labels|^2 broadcast cross for the
# neighbor — the corpus is scanned twice and never self-joined.
# --------------------------------------------------------------------------

def q_emb_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir).selectExpr(
        "vec_id", "label",
        "transform(embedding, v -> cast(v as double)) AS embedding")
    dims = emb.select("label", F.posexplode("embedding").alias("d", "v"))
    cents = (dims.groupBy("label", "d")
             .agg(F.expr("floor(avg(cast(v as double)) * 1000000 + 0.5) "
                         "/ 1000000").alias("m"))
             .groupBy("label")
             .agg(F.expr("transform(array_sort(collect_list(struct(d, m))), "
                         "s -> s.m)").alias("ce")))
    coh = (emb.join(broadcast(cents), "label")
           .selectExpr("label", f"{cosine_expr('embedding', 'ce')} AS _cos")
           .groupBy("label")
           .agg(F.count(F.lit(1)).cast("long").alias("n_vectores"),
                r4(F.avg("_cos")).alias("cohesion")))
    a = cents.select(F.col("label").alias("l1"), F.col("ce").alias("e1"))
    b = cents.select(F.col("label").alias("l2"), F.col("ce").alias("e2"))
    pares = (a.crossJoin(broadcast(b)).filter("l1 != l2")
             .selectExpr("l1", "l2", f"{cosine_expr('e1', 'e2')} AS _c"))
    w = Window.partitionBy("l1").orderBy(F.desc("_c"), F.asc("l2"))
    vecino = (pares.withColumn("_rn", F.row_number().over(w))
              .filter("_rn = 1")
              .select(F.col("l1").alias("label"),
                      F.col("l2").cast("long").alias("vecino"),
                      r4(F.col("_c")).alias("cos_vecino")))
    return (coh.join(vecino, "label")
            .select(F.col("label").cast("long").alias("label"),
                    "n_vectores", "cohesion", "vecino", "cos_vecino")
            .orderBy("label"))


SQL_EMB_LABEL_CENTROIDS = f"""
WITH emb AS (
  SELECT vec_id, label, list_transform(embedding, v -> v::DOUBLE) AS embedding
  FROM embeddings
), cents AS (
  SELECT label, list(m ORDER BY d) AS ce FROM (
    SELECT label, d,
           floor(avg(embedding[d + 1]::DOUBLE) * 1000000 + 0.5) / 1000000 AS m
    FROM emb CROSS JOIN (SELECT unnest(range(0, 64)) AS d)
    GROUP BY label, d
  ) GROUP BY label
), coh AS (
  SELECT e.label, count(*)::BIGINT AS n_vectores,
         floor(avg({sql_cosine_expr('e.embedding', 'c.ce')}) * 10000 + 0.5)
           / 10000 AS cohesion
  FROM emb e JOIN cents c USING (label) GROUP BY e.label
), vecino AS (
  SELECT l1 AS label, l2 AS vecino, _c FROM (
    SELECT a.label AS l1, b.label AS l2,
           {sql_cosine_expr('a.ce', 'b.ce')} AS _c,
           row_number() OVER (PARTITION BY a.label
                              ORDER BY {sql_cosine_expr('a.ce', 'b.ce')} DESC,
                                       b.label ASC) AS rn
    FROM cents a JOIN cents b ON a.label != b.label
  ) WHERE rn = 1
)
SELECT coh.label::BIGINT AS label, coh.n_vectores, coh.cohesion,
       v.vecino::BIGINT AS vecino,
       floor(v._c * 10000 + 0.5) / 10000 AS cos_vecino
FROM coh JOIN vecino v USING (label) ORDER BY label
"""

register("emb_label_centroids", q_emb_label_centroids,
         SQL_EMB_LABEL_CENTROIDS)


# --------------------------------------------------------------------------
# ann_recall_audit — recall@k evaluation of the LSH ANN path against the
# exact brute-force ranking, the standard ANN quality metric (recall@k at
# a measured scan fraction). Both rankings run on the SAME query/corpus
# split and k as knn_lsh; per query the audit reports the candidate-set
# size (what fraction of the corpus the LSH actually scanned) and the
# overlap of the approximate top-k with the exact top-k. "Measure, don't
# guess": this is the operator that turns the LSH's recall claim into a
# number the pipeline can regression-gate.
#
# Scale: the exact side is the documented O(|Q|·|C|) baseline — |Q| is a
# small serving/eval batch (broadcast), so the corpus is scanned once,
# never shuffled. The LSH side reuses the bucketed-candidate plan
# (narrow id+bucket frame, union of per-table buckets). The final
# per-qid rollups join on qid — |Q|-sized frames, broadcast.
# --------------------------------------------------------------------------

def q_ann_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir, parallelize=True)
    qe = (emb.filter(F.col("vec_id") < 50)
          .selectExpr("vec_id AS qid", "embedding AS qe"))
    ce = (emb.filter(F.col("vec_id") >= 50)
          .selectExpr("vec_id AS cid", "embedding AS ce"))
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(),
                                          F.col("cid").asc())
    exact = (broadcast(qe).crossJoin(ce)
             .selectExpr("qid", "cid", f"{cosine_expr('qe', 'ce')} AS _cos")
             .select("qid", "cid", r6(F.col("_cos")).alias("cos"))
             .withColumn("rango", F.row_number().over(w))
             .filter(F.col("rango") <= LSH_TOP_K)
             .select("qid", "cid"))
    bucketed = (
        emb.selectExpr("vec_id", f"{_BITS_EXPR} AS _bits")
        .selectExpr("vec_id", f"explode({_KEYS_EXPR}) AS cubo"))
    q_keys = (bucketed.filter(F.col("vec_id") < 50)
              .selectExpr("vec_id AS qid", "cubo"))
    c_keys = (bucketed.filter(F.col("vec_id") >= 50)
              .selectExpr("vec_id AS cid", "cubo"))
    cand = (broadcast(q_keys).join(c_keys, "cubo")
            .select("qid", "cid").dropDuplicates(["qid", "cid"]))
    approx = (broadcast(cand.join(broadcast(qe), "qid")).join(ce, "cid")
              .selectExpr("qid", "cid", f"{cosine_expr('qe', 'ce')} AS _cos")
              .select("qid", "cid", r6(F.col("_cos")).alias("cos"))
              .withColumn("rango", F.row_number().over(w))
              .filter(F.col("rango") <= LSH_TOP_K)
              .select("qid", "cid"))
    cand_n = cand.groupBy("qid").agg(
        F.count(F.lit(1)).cast("long").alias("candidatos"))
    hits = (approx.join(exact, ["qid", "cid"])
            .groupBy("qid")
            .agg(F.count(F.lit(1)).cast("long").alias("aciertos")))
    return (qe.select("qid")
            .join(cand_n, "qid", "left")
            .join(hits, "qid", "left")
            .fillna(0, ["candidatos", "aciertos"])
            .select("qid", "candidatos", "aciertos",
                    r4(F.col("aciertos").cast("double") / LSH_TOP_K)
                    .alias("recall"))
            .orderBy("qid"))


SQL_ANN_RECALL_AUDIT = f"""
WITH exact_scored AS (
  SELECT q.vec_id AS qid, c.vec_id AS cid,
         floor({sql_cosine_expr('q.embedding', 'c.embedding')} * 1000000
               + 0.5) / 1000000 AS cos
  FROM embeddings q CROSS JOIN embeddings c
  WHERE q.vec_id < 50 AND c.vec_id >= 50
), exact_top AS (
  SELECT qid, cid FROM (
    SELECT qid, cid,
           row_number() OVER (PARTITION BY qid
                              ORDER BY cos DESC, cid ASC) AS rango
    FROM exact_scored)
  WHERE rango <= {LSH_TOP_K}
), bits AS (
  SELECT vec_id, embedding,
         list_transform({_PLANES_SQL}, h ->
           list_sum(list_transform(list_zip(embedding, h),
                    x -> (x[1]::DOUBLE) * x[2])) >= 0) AS _bits
  FROM embeddings
), bucketed AS (
  SELECT vec_id, embedding,
         concat(t, ':', list_reduce(list_prepend(0,
           list_transform(list_slice(_bits, t * {LSH_BITS} + 1,
                                     t * {LSH_BITS} + {LSH_BITS}),
                          b -> CASE WHEN b THEN 1 ELSE 0 END)),
           (acc, x) -> acc * 2 + x)) AS cubo
  FROM bits CROSS JOIN (SELECT unnest(range(0, {LSH_TABLES})) AS t)
), cand AS (
  SELECT DISTINCT q.vec_id AS qid, c.vec_id AS cid,
         q.embedding AS qe, c.embedding AS ce
  FROM bucketed q JOIN bucketed c ON q.cubo = c.cubo
  WHERE q.vec_id < 50 AND c.vec_id >= 50
), approx_top AS (
  SELECT qid, cid FROM (
    SELECT qid, cid,
           row_number() OVER (PARTITION BY qid
                              ORDER BY cos DESC, cid ASC) AS rango
    FROM (SELECT qid, cid,
                 floor({sql_cosine_expr('qe', 'ce')} * 1000000 + 0.5)
                   / 1000000 AS cos
          FROM cand))
  WHERE rango <= {LSH_TOP_K}
), cand_n AS (
  SELECT qid, count(*)::BIGINT AS candidatos FROM cand GROUP BY qid
), hits AS (
  SELECT a.qid, count(*)::BIGINT AS aciertos
  FROM approx_top a JOIN exact_top e ON a.qid = e.qid AND a.cid = e.cid
  GROUP BY a.qid
)
SELECT q.vec_id AS qid,
       coalesce(candidatos, 0)::BIGINT AS candidatos,
       coalesce(aciertos, 0)::BIGINT AS aciertos,
       floor(coalesce(aciertos, 0)::DOUBLE / {LSH_TOP_K} * 10000 + 0.5)
         / 10000 AS recall
FROM embeddings q
LEFT JOIN cand_n ON cand_n.qid = q.vec_id
LEFT JOIN hits ON hits.qid = q.vec_id
WHERE q.vec_id < 50
ORDER BY qid
"""

register("ann_recall_audit", q_ann_recall_audit, SQL_ANN_RECALL_AUDIT)


# --------------------------------------------------------------------------
# ivf_recall_audit — recall@k of the IVF ANN path against the exact
# brute-force ranking, completing the audit symmetry with
# ann_recall_audit (LSH): same query/corpus split and k as knn_ivf, per
# query the probed-list candidate count (the scan fraction nprobe buys)
# and the overlap of the IVF top-k with the exact top-k. Together the
# two audits make BOTH approximate serving paths regression-gateable
# numbers instead of claims.
#
# Scale: exact side is the documented O(|Q|·|C|) eval baseline with the
# |Q| queries broadcast (corpus scanned once, never shuffled); the IVF
# side reuses _ivf_ranked — centroids broadcast, candidates keyed by
# centroid_id (the inverted lists ARE the partitioning). Rollups join
# on qid — |Q|-sized broadcast frames.
# --------------------------------------------------------------------------

def q_ivf_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ranked = _ivf_ranked(spark, sf_dir)
    qe = (ranked.filter((F.col("vec_id") < 40) & (F.col("_rn") == 1))
          .selectExpr("vec_id AS qid", "embedding AS qe"))
    ce = (ranked.filter((F.col("vec_id") >= 40) & (F.col("_rn") == 1))
          .selectExpr("vec_id AS cid", "embedding AS ce"))
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(),
                                          F.col("cid").asc())
    exact = (broadcast(qe).crossJoin(ce)
             .selectExpr("qid", "cid", f"{cosine_expr('qe', 'ce')} AS _cos")
             .select("qid", "cid", r6(F.col("_cos")).alias("cos"))
             .withColumn("rango", F.row_number().over(w))
             .filter(F.col("rango") <= IVF_TOP_K)
             .select("qid", "cid"))
    queries = (ranked.filter((F.col("vec_id") < 40)
                             & (F.col("_rn") <= IVF_NPROBE))
               .selectExpr("vec_id AS qid", "embedding AS qe", "centroid_id"))
    corpus = (ranked.filter((F.col("vec_id") >= 40) & (F.col("_rn") == 1))
              .selectExpr("vec_id AS cid", "embedding AS ce", "centroid_id"))
    cand = (queries.join(corpus, "centroid_id")
            .dropDuplicates(["qid", "cid"]))
    approx = (cand
              .selectExpr("qid", "cid", f"{cosine_expr('qe', 'ce')} AS _cos")
              .select("qid", "cid", r6(F.col("_cos")).alias("cos"))
              .withColumn("rango", F.row_number().over(w))
              .filter(F.col("rango") <= IVF_TOP_K)
              .select("qid", "cid"))
    cand_n = (cand.groupBy("qid")
              .agg(F.count(F.lit(1)).cast("long").alias("candidatos")))
    hits = (approx.join(exact, ["qid", "cid"])
            .groupBy("qid")
            .agg(F.count(F.lit(1)).cast("long").alias("aciertos")))
    return (qe.select("qid")
            .join(cand_n, "qid", "left")
            .join(hits, "qid", "left")
            .fillna(0, ["candidatos", "aciertos"])
            .select("qid", "candidatos", "aciertos",
                    r4(F.col("aciertos").cast("double") / IVF_TOP_K)
                    .alias("recall"))
            .orderBy("qid"))


SQL_IVF_RECALL_AUDIT = f"""
WITH emb AS (
  SELECT vec_id, list_transform(embedding, v -> v::DOUBLE) AS embedding
  FROM embeddings
), c0 AS (
  SELECT vec_id AS centroid_id, embedding AS ce FROM emb
  WHERE vec_id < {KMEANS_K}
), a1 AS {_sql_assign('emb', 'c0')}, c1 AS {_SQL_RECENTER.format(src='a1')},
a2 AS {_sql_assign('emb', 'c1')}, c2 AS {_SQL_RECENTER.format(src='a2')},
a3 AS {_sql_assign('emb', 'c2')}, c3 AS {_SQL_RECENTER.format(src='a3')},
ranked_assign AS (
  SELECT e.vec_id, e.embedding, c.centroid_id,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY {sql_cosine_expr('e.embedding', 'c.ce')} DESC,
                                     c.centroid_id ASC) AS rn
  FROM emb e CROSS JOIN c3 c
), exact_top AS (
  SELECT qid, cid FROM (
    SELECT q.vec_id AS qid, c.vec_id AS cid,
           row_number() OVER (PARTITION BY q.vec_id
                              ORDER BY floor({sql_cosine_expr('q.embedding', 'c.embedding')}
                                             * 1000000 + 0.5) / 1000000 DESC,
                                       c.vec_id ASC) AS rango
    FROM emb q CROSS JOIN emb c
    WHERE q.vec_id < 40 AND c.vec_id >= 40)
  WHERE rango <= {IVF_TOP_K}
), cand AS (
  SELECT DISTINCT q.vec_id AS qid, c.vec_id AS cid,
         q.embedding AS qe, c.embedding AS ce
  FROM ranked_assign q JOIN ranked_assign c ON q.centroid_id = c.centroid_id
  WHERE q.vec_id < 40 AND q.rn <= {IVF_NPROBE}
    AND c.vec_id >= 40 AND c.rn = 1
), approx_top AS (
  SELECT qid, cid FROM (
    SELECT qid, cid,
           row_number() OVER (PARTITION BY qid
                              ORDER BY floor({sql_cosine_expr('qe', 'ce')}
                                             * 1000000 + 0.5) / 1000000 DESC,
                                       cid ASC) AS rango
    FROM cand)
  WHERE rango <= {IVF_TOP_K}
), cand_n AS (
  SELECT qid, count(*)::BIGINT AS candidatos FROM cand GROUP BY qid
), hits AS (
  SELECT a.qid, count(*)::BIGINT AS aciertos
  FROM approx_top a JOIN exact_top e ON a.qid = e.qid AND a.cid = e.cid
  GROUP BY a.qid
)
SELECT q.vec_id AS qid,
       coalesce(candidatos, 0)::BIGINT AS candidatos,
       coalesce(aciertos, 0)::BIGINT AS aciertos,
       floor(coalesce(aciertos, 0)::DOUBLE / {IVF_TOP_K} * 10000 + 0.5)
         / 10000 AS recall
FROM embeddings q
LEFT JOIN cand_n ON cand_n.qid = q.vec_id
LEFT JOIN hits ON hits.qid = q.vec_id
WHERE q.vec_id < 40
ORDER BY qid
"""

register("ivf_recall_audit", q_ivf_recall_audit, SQL_IVF_RECALL_AUDIT)


# --------------------------------------------------------------------------
# emb_anisotropy_audit — spectral health check of the embedding space
# (the "all-but-the-top" diagnosis, Mu & Viswanath, ICLR 2018): estimate
# the top eigenvalue of the centered covariance by power iteration and
# report what fraction of total variance (trace) it captures. A high
# ratio means the space is anisotropic — cosine similarities are
# dominated by one common direction — and retrieval/dedup thresholds
# (knn_*, emb_near_dup) degrade; this is the audit run before trusting
# them, and the whitening decision gate.
#
# Determinism: the ONLY order-dependent float reductions (per-dim means,
# covariance-entry sums) are r6-rounded before anything else touches
# them — the per-group rounded-avg idiom emb_label_centroids established
# — so the unrolled power iteration (fixed association matvec folds,
# sqrt normalization; both correctly-rounded IEEE ops) is a pure
# function of bit-identical inputs on both engines. The iterate starts
# at the exactly-unit vector (1/8, ..., 1/8) [64 · 0.015625 = 1].
#
# Scale: one posexplode shuffle for the means (map-side partial), one
# outer-product explode whose groupBy(idx) is map-side combined (the
# shuffle carries partitions x D² rows, corpus-size-free), then a
# D²-bounded single-row assembly and O(D²) driver-free iteration math on
# a 1-row frame. The corpus is scanned twice and never self-joined; at
# 100 TB only the two scans grow.
# --------------------------------------------------------------------------

EMB_D = 64
POWER_ITERS = 4


def _matvec(c: str, x: str) -> str:
    return (f"transform(sequence(0, {EMB_D - 1}), i -> "
            f"aggregate(sequence(0, {EMB_D - 1}), cast(0.0 as double), "
            f"(a, j) -> a + element_at({c}, i * {EMB_D} + j + 1) "
            f"* element_at({x}, j + 1)))")


def _sql_matvec(c: str, x: str) -> str:
    return (f"list_transform(range(0, {EMB_D}), i -> "
            f"list_reduce(list_prepend(0.0::DOUBLE, "
            f"list_transform(range(0, {EMB_D}), "
            f"j -> {c}[i * {EMB_D} + j + 1] * {x}[j + 1])), "
            f"(a, b) -> a + b))")


def _norm2(x: str) -> str:
    return (f"sqrt(aggregate({x}, cast(0.0 as double), "
            f"(a, v) -> a + v * v))")


def _sql_norm2(x: str) -> str:
    return (f"sqrt(list_reduce(list_prepend(0.0::DOUBLE, "
            f"list_transform({x}, v -> v * v)), (a, b) -> a + b))")


def emb_anisotropy_frame(emb_raw: DataFrame) -> DataFrame:
    """Audit over an (vec_id, embedding) frame; shared by the registered
    query and the bit-equality property test."""
    emb = emb_raw.selectExpr(
        "vec_id", "transform(embedding, v -> cast(v as double)) AS e")
    mu = (emb.select(F.posexplode("e").alias("d", "v"))
          .groupBy("d")
          .agg(F.expr("floor(avg(v) * 1000000 + 0.5) / 1000000").alias("m"))
          .agg(F.expr("transform(array_sort(collect_list(struct(d, m))), "
                      "s -> s.m)").alias("_mu"),
               F.count(F.lit(1)).alias("_dchk")))
    centered = (emb.crossJoin(broadcast(mu))
                .selectExpr("zip_with(e, _mu, (a, b) -> a - b) AS cv"))
    cov = (centered
           .selectExpr("posexplode(flatten(transform(cv, "
                       "a -> transform(cv, b -> a * b)))) AS (idx, val)")
           .groupBy("idx")
           .agg(F.sum("val").alias("_s")))
    n_row = emb.agg(F.count(F.lit(1)).cast("long").alias("_n"))
    c_row = (cov.crossJoin(broadcast(n_row))
             .selectExpr("idx",
                         "floor(_s / (_n - 1) * 1000000 + 0.5) / 1000000"
                         " AS c", "_n")
             .groupBy("_n")
             .agg(F.expr("transform(array_sort(collect_list("
                         "struct(idx, c))), s -> s.c)").alias("_C")))
    # unrolled power iteration from the exact unit vector (1/8,...,1/8)
    it = c_row.selectExpr(
        "_n", "_C",
        f"transform(sequence(0, {EMB_D - 1}), i -> cast(0.125 as double))"
        " AS _x0")
    for k in range(POWER_ITERS):
        it = (it.selectExpr("_n", "_C", f"{_matvec('_C', f'_x{k}')} AS _y")
              .selectExpr("_n", "_C", "_y", f"{_norm2('_y')} AS _nr")
              .selectExpr(
                  "_n", "_C",
                  f"if(_nr = 0.0, _y, transform(_y, v -> v / _nr))"
                  f" AS _x{k + 1}"))
    xf = f"_x{POWER_ITERS}"
    return (it.selectExpr(
        "_n", "_C", xf,
        f"{_matvec('_C', xf)} AS _cx")
        .selectExpr(
            "_n AS n_vectores",
            f"aggregate(zip_with({xf}, _cx, (a, b) -> a * b), "
            f"cast(0.0 as double), (a, v) -> a + v) AS _l1",
            f"aggregate(sequence(0, {EMB_D - 1}), cast(0.0 as double), "
            f"(a, i) -> a + element_at(_C, i * {EMB_D} + i + 1)) AS _tr")
        .selectExpr(
            "n_vectores",
            "floor(_l1 * 1000000 + 0.5) / 1000000 AS lambda1",
            "floor(_tr * 1000000 + 0.5) / 1000000 AS traza",
            "if(_tr = 0.0, cast(0.0 as double), "
            "floor(_l1 / _tr * 10000 + 0.5) / 10000) AS anisotropia"))


def q_emb_anisotropy_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return emb_anisotropy_frame(_emb(spark, sf_dir, parallelize=True))


_SQL_POWER_CTES = []
for _k in range(POWER_ITERS):
    _SQL_POWER_CTES.append(
        f"p{_k} AS (SELECT _n, c, "
        f"{_sql_matvec('c', f'x{_k}')} AS y FROM i{_k}), "
        f"i{_k + 1} AS (SELECT _n, c, CASE WHEN {_sql_norm2('y')} = 0.0 "
        f"THEN y ELSE list_transform(y, v -> v / {_sql_norm2('y')}) END "
        f"AS x{_k + 1} FROM p{_k})")

SQL_EMB_ANISOTROPY_AUDIT = f"""
WITH emb AS (
  SELECT vec_id, list_transform(embedding, v -> v::DOUBLE) AS e
  FROM embeddings
), mu AS (
  SELECT list(m ORDER BY d) AS mu FROM (
    SELECT d, floor(avg(e[d + 1]) * 1000000 + 0.5) / 1000000 AS m
    FROM emb CROSS JOIN (SELECT unnest(range(0, {EMB_D})) AS d)
    GROUP BY d)
), centered AS (
  SELECT list_transform(list_zip(e, mu), p -> p[1] - p[2]) AS cv
  FROM emb CROSS JOIN mu
), fo AS (
  SELECT flatten(list_transform(cv, a -> list_transform(cv, b -> a * b)))
           AS f
  FROM centered
), cov AS (
  SELECT idx, sum(f[idx + 1]) AS s
  FROM fo CROSS JOIN (SELECT unnest(range(0, {EMB_D * EMB_D})) AS idx)
  GROUP BY idx
), nr AS (
  SELECT count(*)::BIGINT AS _n FROM emb
), c_row AS (
  SELECT _n, list(c ORDER BY idx) AS c FROM (
    SELECT idx, floor(s / (_n - 1) * 1000000 + 0.5) / 1000000 AS c, _n
    FROM cov CROSS JOIN nr)
  GROUP BY _n
), i0 AS (
  SELECT _n, c,
         list_transform(range(0, {EMB_D}), i -> 0.125::DOUBLE) AS x0
  FROM c_row
), {', '.join(_SQL_POWER_CTES)}, fin AS (
  SELECT _n, c, x{POWER_ITERS} AS xf,
         {_sql_matvec('c', f'x{POWER_ITERS}')} AS cx
  FROM i{POWER_ITERS}
), met AS (
  SELECT _n AS n_vectores,
         list_reduce(list_prepend(0.0::DOUBLE,
           list_transform(list_zip(xf, cx), p -> p[1] * p[2])),
           (a, b) -> a + b) AS _l1,
         list_reduce(list_prepend(0.0::DOUBLE,
           list_transform(range(0, {EMB_D}),
                          i -> c[i * {EMB_D} + i + 1])),
           (a, b) -> a + b) AS _tr
  FROM fin
)
SELECT n_vectores,
       floor(_l1 * 1000000 + 0.5) / 1000000 AS lambda1,
       floor(_tr * 1000000 + 0.5) / 1000000 AS traza,
       CASE WHEN _tr = 0.0 THEN 0.0::DOUBLE
            ELSE floor(_l1 / _tr * 10000 + 0.5) / 10000 END AS anisotropia
FROM met
"""

register("emb_anisotropy_audit", q_emb_anisotropy_audit,
         SQL_EMB_ANISOTROPY_AUDIT)


# --------------------------------------------------------------------------
# emb_pq_audit — product quantization (Jégou, Douze & Schmid, TPAMI
# 2011), the codebook-compression complement of emb_quantize's int8
# scalar path: split the 64-dim space into PQ_M subspaces, train a
# PQ_K-codeword codebook per subspace with PQ_ITERS Lloyd iterations
# (L2, ties -> lowest code), and report per-subspace distortion (mean /
# max squared reconstruction error) and codebook utilization. 8 bytes
# per vector instead of 256 — the audit's distortion numbers are what
# decide whether that compression is affordable for the ANN candidate
# stage.
#
# Determinism: subspace L2 distances are 8-term fixed-association
# folds (identical IEEE on both engines); recentering is the r6-rounded
# per-(sub, code, dim) mean — the kmeans idiom; assignment ties break
# to the lowest code id via lexicographic struct extremes.
#
# Scale: the codebook is PQ_M·PQ_K rows → ONE broadcast row; both
# assignment passes are embarrassingly-parallel folds (zero exchanges,
# the _assign_to lesson); each recenter is a map-side-combined groupBy
# of PQ_M·PQ_K·8 cells. Corpus scanned PQ_ITERS+1 times, never
# self-joined.
# --------------------------------------------------------------------------

PQ_M = 8       # subspaces
PQ_SD = 8      # dims per subspace (PQ_M * PQ_SD = 64)
PQ_K = 4       # codewords per subspace
PQ_ITERS = 2   # Lloyd iterations

_PQ_L2 = ("aggregate(zip_with(sv, {cv}, (a, b) -> (a - b) * (a - b)), "
          "cast(0.0 as double), (a, v) -> a + v)")

# nearest codeword of this row's subspace from the packed codebook:
# max of (-dist, -cid) structs = min dist, ties -> lowest cid
_PQ_BEST = (
    f"array_max(transform(filter(_cb, c -> c.sub = sub), "
    f"c -> struct(-({_PQ_L2.format(cv='c.cv')}) AS nd, -c.cid AS ncid)))"
)


def _pq_subvectors(emb: DataFrame) -> DataFrame:
    return (emb.selectExpr(
        "vec_id",
        f"explode(transform(sequence(0, {PQ_M - 1}), "
        f"m -> struct(m AS sub, "
        f"slice(e, m * {PQ_SD} + 1, {PQ_SD}) AS sv))) AS s")
        .select("vec_id", "s.sub", "s.sv"))


def _pq_pack(codebook: DataFrame) -> DataFrame:
    """All PQ_M x PQ_K codewords as ONE sorted broadcast row."""
    return codebook.agg(F.expr(
        "sort_array(collect_list(struct(sub, cid, cv))) AS _cb"))


def _pq_assign(sv: DataFrame, codebook: DataFrame) -> DataFrame:
    return (sv.crossJoin(broadcast(_pq_pack(codebook)))
            .selectExpr("vec_id", "sub", "sv",
                        f"cast(-({_PQ_BEST}.ncid) as bigint) AS cid",
                        f"-({_PQ_BEST}.nd) AS d2"))


def _pq_recenter(assigned: DataFrame) -> DataFrame:
    cells = assigned.select("sub", "cid",
                            F.posexplode("sv").alias("d", "v"))
    means = (cells.groupBy("sub", "cid", "d")
             .agg(F.expr("floor(avg(v) * 1000000 + 0.5) / 1000000")
                  .alias("m")))
    return (means.groupBy("sub", "cid")
            .agg(F.expr("transform(array_sort(collect_list(struct(d, m))), "
                        "s -> s.m)").alias("cv")))


def q_emb_pq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir).selectExpr(
        "vec_id", "transform(embedding, v -> cast(v as double)) AS e")
    sv = _pq_subvectors(emb)
    codebook = (sv.filter(F.col("vec_id") < PQ_K)
                .selectExpr("sub", "vec_id AS cid", "sv AS cv"))
    for _ in range(PQ_ITERS):
        codebook = _pq_recenter(_pq_assign(sv, codebook))
    final = _pq_assign(sv, codebook)
    return (final.groupBy("sub")
            .agg(F.count(F.lit(1)).cast("long").alias("vectores"),
                 F.countDistinct("cid").cast("long").alias("codigos"),
                 r6(F.avg("d2")).alias("error_medio"),
                 r6(F.max("d2")).alias("error_max"))
            .orderBy("sub"))


_SQL_PQ_L2 = ("list_reduce(list_prepend(0.0::DOUBLE, "
              "list_transform(list_zip(sv, {cv}), "
              "p -> (p[1] - p[2]) * (p[1] - p[2]))), (a, b) -> a + b)")


def _sql_pq_assign(sv_cte: str, cb_cte: str) -> str:
    l2 = _SQL_PQ_L2.format(cv="cb.cv")
    best = f"max({{'nd': -({l2}), 'ncid': -cb.cid}})"
    return f"""(
  SELECT vec_id, sub, sv,
         (-struct_extract({best}, 'ncid'))::BIGINT AS cid,
         -struct_extract({best}, 'nd') AS d2
  FROM {sv_cte} JOIN {cb_cte} cb USING (sub)
  GROUP BY vec_id, sub, sv
)"""


_SQL_PQ_RECENTER = """(
  SELECT sub, cid, list(m ORDER BY d) AS cv FROM (
    SELECT sub, cid, d,
           floor(avg(sv[d + 1]) * 1000000 + 0.5) / 1000000 AS m
    FROM {src} CROSS JOIN (SELECT unnest(range(0, %d)) AS d)
    GROUP BY sub, cid, d)
  GROUP BY sub, cid
)""" % PQ_SD

SQL_EMB_PQ_AUDIT = f"""
WITH emb AS (
  SELECT vec_id, list_transform(embedding, v -> v::DOUBLE) AS e
  FROM embeddings
), sv AS (
  SELECT vec_id, m AS sub, list_slice(e, m * {PQ_SD} + 1, (m + 1) * {PQ_SD})
           AS sv
  FROM emb CROSS JOIN (SELECT unnest(range(0, {PQ_M})) AS m)
), cb0 AS (
  SELECT sub, vec_id AS cid, sv AS cv FROM sv WHERE vec_id < {PQ_K}
), a1 AS {_sql_pq_assign('sv', 'cb0')}, cb1 AS {_SQL_PQ_RECENTER.format(src='a1')},
a2 AS {_sql_pq_assign('sv', 'cb1')}, cb2 AS {_SQL_PQ_RECENTER.format(src='a2')},
fin AS {_sql_pq_assign('sv', 'cb2')}
SELECT sub::BIGINT AS sub, count(*)::BIGINT AS vectores,
       count(DISTINCT cid)::BIGINT AS codigos,
       floor(avg(d2) * 1000000 + 0.5) / 1000000 AS error_medio,
       floor(max(d2) * 1000000 + 0.5) / 1000000 AS error_max
FROM fin GROUP BY sub ORDER BY sub
"""

register("emb_pq_audit", q_emb_pq_audit, SQL_EMB_PQ_AUDIT)


# --------------------------------------------------------------------------
# emb_drift_audit — embedding distribution drift between two corpus
# snapshots, the monitoring check an embedding pipeline runs before
# mixing newly-embedded data with an existing index (encoder upgrades
# and silent preprocessing changes move the mean vector). The two
# "snapshots" here are the deterministic vec_id parity halves — the
# harness has one embeddings table; the operator's contract is
# snapshot-agnostic. Reported: cosine between the two mean vectors,
# the largest per-dimension mean shift and its dimension, and each
# half's mean norm.
#
# Determinism: per-dim means are r6-rounded before any comparison (the
# emb_label_centroids idiom); the cosine/shift math is then a pure
# function of identical inputs. Norms use sqrt (correctly-rounded IEEE,
# portable); the per-row norm mean is r4-rounded at the output like
# every mean-of-bounded-values in the repo.
#
# Scale: one posexplode shuffle keyed by (half, dim) — map-side
# combined — plus one scan for norms; the comparison runs on two
# 64-value broadcast rows. Nothing else grows with the corpus.
# --------------------------------------------------------------------------

def q_emb_drift_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir).selectExpr(
        "vec_id % 2 AS _h",
        "transform(embedding, v -> cast(v as double)) AS e")
    means = (emb.select("_h", F.posexplode("e").alias("d", "v"))
             .groupBy("_h", "d")
             .agg(F.expr("floor(avg(v) * 1000000 + 0.5) / 1000000")
                  .alias("m"))
             .groupBy("_h")
             .agg(F.expr("transform(array_sort(collect_list(struct(d, m))), "
                         "s -> s.m)").alias("mu")))
    stats = (emb.selectExpr(
        "_h",
        "sqrt(aggregate(e, cast(0.0 as double), (a, v) -> a + v * v))"
        " AS _n")
        .groupBy("_h")
        .agg(F.count(F.lit(1)).cast("long").alias("n"),
             r4(F.avg("_n")).alias("norma_media")))
    a = means.filter("_h = 0").selectExpr("mu AS m0")
    b = means.filter("_h = 1").selectExpr("mu AS m1")
    sa = stats.filter("_h = 0").selectExpr("n AS n0",
                                           "norma_media AS norma0")
    sb = stats.filter("_h = 1").selectExpr("n AS n1",
                                           "norma_media AS norma1")
    shift = ("array_max(transform(zip_with(m0, m1, (x, y) -> abs(x - y)), "
             "s -> s))")
    worst = (f"array_max(transform(sequence(0, size(m0) - 1), "
             f"i -> struct(abs(element_at(m0, i + 1) "
             f"- element_at(m1, i + 1)) AS s, -i AS nd)))")
    return (a.crossJoin(b).crossJoin(broadcast(sa)).crossJoin(broadcast(sb))
            .selectExpr(
                "n0", "n1", "norma0", "norma1",
                f"{cosine_expr('m0', 'm1')} AS _cos",
                f"{shift} AS _shift",
                f"cast(-({worst}.nd) as bigint) AS dim_peor")
            .selectExpr(
                "n0", "n1", "norma0", "norma1",
                "floor(_cos * 1000000 + 0.5) / 1000000 AS cos_medias",
                "floor(_shift * 1000000 + 0.5) / 1000000 AS desvio_max",
                "dim_peor"))


SQL_EMB_DRIFT_AUDIT = f"""
WITH emb AS (
  SELECT vec_id % 2 AS h, list_transform(embedding, v -> v::DOUBLE) AS e
  FROM embeddings
), means AS (
  SELECT h, list(m ORDER BY d) AS mu FROM (
    SELECT h, d, floor(avg(e[d + 1]) * 1000000 + 0.5) / 1000000 AS m
    FROM emb CROSS JOIN (SELECT unnest(range(0, {EMB_D})) AS d)
    GROUP BY h, d)
  GROUP BY h
), stats AS (
  SELECT h, count(*)::BIGINT AS n,
         floor(avg(sqrt(list_reduce(list_prepend(0.0::DOUBLE,
               list_transform(e, v -> v * v)), (a, b) -> a + b)))
               * 10000 + 0.5) / 10000 AS norma_media
  FROM emb GROUP BY h
), paired AS (
  SELECT a.mu AS m0, b.mu AS m1,
         sa.n AS n0, sb.n AS n1,
         sa.norma_media AS norma0, sb.norma_media AS norma1
  FROM (SELECT mu FROM means WHERE h = 0) a
  CROSS JOIN (SELECT mu FROM means WHERE h = 1) b
  CROSS JOIN (SELECT n, norma_media FROM stats WHERE h = 0) sa
  CROSS JOIN (SELECT n, norma_media FROM stats WHERE h = 1) sb
), met AS (
  SELECT n0, n1, norma0, norma1,
         {sql_cosine_expr('m0', 'm1')} AS _cos,
         list_max(list_transform(list_zip(m0, m1),
                                 p -> abs(p[1] - p[2]))) AS _shift,
         (-struct_extract(max_struct, 'nd'))::BIGINT AS dim_peor
  FROM (SELECT *,
          list_max(list_transform(range(0, len(m0)),
            i -> {{'s': abs(m0[i + 1] - m1[i + 1]), 'nd': -i}}))
            AS max_struct
        FROM paired)
)
SELECT n0, n1, norma0, norma1,
       floor(_cos * 1000000 + 0.5) / 1000000 AS cos_medias,
       floor(_shift * 1000000 + 0.5) / 1000000 AS desvio_max,
       dim_peor
FROM met
"""

register("emb_drift_audit", q_emb_drift_audit, SQL_EMB_DRIFT_AUDIT)


# --------------------------------------------------------------------------
# emb_dedup_curve — semantic-dedup threshold-selection curve: for each
# candidate cosine threshold, how many pairs fire and how many docs a
# lower-id-wins dedup would drop. This is the audit run BEFORE freezing
# the dedup threshold (SemDeDup's eps sweep): too low and the corpus
# bleeds diversity, too high and templated near-dups survive. Computed
# over the SAME sign-LSH banded candidate set as emb_near_dup — like
# doc_minhash_est_error, the curve audits the candidates the production
# pipeline would actually see (band recall at the low end is the
# documented trade of the banding scheme, not a defect of the audit).
#
# Scale: identical candidate machinery to emb_near_dup (bucketed pair
# join, hot-bucket cap, cosine before the pair dedup so the shuffle
# carries scalars); the curve itself is a |thresholds|-way explode over
# SURVIVING pairs only, and the corpus total rides a one-row broadcast.
# --------------------------------------------------------------------------

CURVE_COS = (0.8, 0.9, 0.95, 0.98, 0.995)


# deterministic graded perturbation: mix in the cyclically-shifted
# vector at strength a — cos(e, e + a·rot(e)) lands around
# 1/sqrt(1+a²) with per-vector spread, so the clone groups populate
# distinct cosine bands and the thresholds actually separate. All
# arithmetic in DOUBLE on both engines (bit-identical folds).
_CURVE_ROT = ("concat(slice(_e, 2, size(_e) - 1), slice(_e, 1, 1))")


def _curve_clones(emb: DataFrame, shift: int, alpha: float) -> DataFrame:
    return (emb.filter(F.col("vec_id") < 30)
            .selectExpr(f"vec_id + {shift} AS vec_id",
                        "transform(embedding, v -> cast(v as double)) AS _e")
            .selectExpr(
                "vec_id",
                f"zip_with(_e, {_CURVE_ROT}, "
                f"(a, b) -> a + cast({alpha} as double) * b) AS embedding"))


def q_emb_dedup_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    base = emb.selectExpr(
        "vec_id", "transform(embedding, v -> cast(v as double)) AS embedding")
    union = (base
             .unionByName(_curve_clones(emb, 1000000, 0.0))
             .unionByName(_curve_clones(emb, 2000000, 0.2))
             .unionByName(_curve_clones(emb, 3000000, 0.6)))
    w_cubo = Window.partitionBy("cubo")
    bucketed = (
        union.selectExpr("vec_id", "embedding", f"{_BITS_EXPR} AS _bits")
        .selectExpr("vec_id", "embedding", f"explode({_ND_KEYS_EXPR}) AS cubo")
        .withColumn("_n", F.count(F.lit(1)).over(w_cubo))
        .filter(F.col("_n") <= MAX_BUCKET_VECS).drop("_n")
        .cache())
    left = bucketed.selectExpr("vec_id AS d1", "embedding AS e1", "cubo")
    right = bucketed.selectExpr("vec_id AS d2", "embedding AS e2", "cubo")
    pairs = (
        left.join(right, "cubo")
        .filter(F.col("d1") < F.col("d2"))
        .selectExpr("d1", "d2", f"{cosine_expr('e1', 'e2')} AS _cos")
        .select("d1", "d2", r6(F.col("_cos")).alias("cos"))
        .filter(F.col("cos") >= CURVE_COS[0])
        .dropDuplicates(["d1", "d2"]))
    total = union.agg(F.count(F.lit(1)).cast("long").alias("_n"))
    curve = (
        pairs.withColumn("umbral",
                         F.explode(F.array(*[F.lit(t) for t in CURVE_COS])))
        .filter(F.col("cos") >= F.col("umbral"))
        .groupBy("umbral")
        .agg(F.count(F.lit(1)).cast("long").alias("pares"),
             F.countDistinct("d2").cast("long").alias("docs_caidos")))
    return (
        curve.crossJoin(broadcast(total))
        .select("umbral", "pares", "docs_caidos",
                (F.col("_n") - F.col("docs_caidos")).cast("long")
                .alias("docs_conservados"),
                r6(F.col("docs_caidos").cast("double") / F.col("_n"))
                .alias("tasa_caida"))
        .orderBy("umbral")
    )


_SQL_CURVE_LIST = ", ".join(f"{t}::DOUBLE" for t in CURVE_COS)

SQL_EMB_DEDUP_CURVE = f"""
WITH based AS (
  SELECT vec_id, list_transform(embedding, v -> v::DOUBLE) AS embedding
  FROM embeddings
), rotmix AS (
  SELECT vec_id, embedding,
         list_concat(list_slice(embedding, 2, len(embedding)),
                     list_slice(embedding, 1, 1)) AS _rot
  FROM based WHERE vec_id < 30
), unioned AS (
  SELECT vec_id, embedding FROM based
  UNION ALL
  SELECT vec_id + 1000000,
         list_transform(list_zip(embedding, _rot),
                        x -> x[1] + 0.0::DOUBLE * x[2]) FROM rotmix
  UNION ALL
  SELECT vec_id + 2000000,
         list_transform(list_zip(embedding, _rot),
                        x -> x[1] + 0.2::DOUBLE * x[2]) FROM rotmix
  UNION ALL
  SELECT vec_id + 3000000,
         list_transform(list_zip(embedding, _rot),
                        x -> x[1] + 0.6::DOUBLE * x[2]) FROM rotmix
), bits AS (
  SELECT vec_id, embedding,
         list_transform({_PLANES_SQL}, h ->
           list_sum(list_transform(list_zip(embedding, h),
                    x -> (x[1]::DOUBLE) * x[2])) >= 0) AS _bits
  FROM unioned
), bucketed0 AS (
  SELECT vec_id, embedding,
         concat(t, ':', list_reduce(list_prepend(0,
           list_transform(list_slice(_bits, t * {ND_BITS} + 1,
                                     t * {ND_BITS} + {ND_BITS}),
                          b -> CASE WHEN b THEN 1 ELSE 0 END)),
           (acc, x) -> acc * 2 + x)) AS cubo
  FROM bits CROSS JOIN (SELECT unnest(range(0, {ND_TABLES})) AS t)
), bucketed AS (
  SELECT vec_id, embedding, cubo FROM (
    SELECT *, count(*) OVER (PARTITION BY cubo) AS _n FROM bucketed0)
  WHERE _n <= {MAX_BUCKET_VECS}
), cand AS (
  SELECT DISTINCT l.vec_id AS d1, r.vec_id AS d2,
         l.embedding AS e1, r.embedding AS e2
  FROM bucketed l JOIN bucketed r ON l.cubo = r.cubo AND l.vec_id < r.vec_id
), pairs AS (
  SELECT d1, d2,
         floor({sql_cosine_expr('e1', 'e2')} * 1000000 + 0.5) / 1000000
           AS cos
  FROM cand
), curve AS (
  SELECT umbral, count(*)::BIGINT AS pares,
         count(DISTINCT d2)::BIGINT AS docs_caidos
  FROM (SELECT * FROM pairs WHERE cos >= 0.8) p
  CROSS JOIN (SELECT unnest([{_SQL_CURVE_LIST}]) AS umbral)
  WHERE cos >= umbral GROUP BY umbral
), total AS (
  SELECT count(*)::BIGINT AS _n FROM unioned
)
SELECT c.umbral, c.pares, c.docs_caidos,
       (t._n - c.docs_caidos)::BIGINT AS docs_conservados,
       floor(c.docs_caidos::DOUBLE / t._n * 1000000 + 0.5) / 1000000
         AS tasa_caida
FROM curve c CROSS JOIN total t
ORDER BY c.umbral
"""

register("emb_dedup_curve", q_emb_dedup_curve, SQL_EMB_DEDUP_CURVE)


# --------------------------------------------------------------------------
# emb_decontaminate — SEMANTIC benchmark decontamination, completing the
# decontamination family (doc_decontaminate = exact n-gram overlap,
# doc_bloom_decontaminate = sketch-accelerated n-grams, this = embedding
# cosine): a corpus vector is contaminated when its cosine against ANY
# held benchmark embedding reaches EMB_DECON_COS — the guard that
# catches paraphrased/translated eval leakage that n-gram overlap
# misses. The benchmark set is synthesized deterministically as graded
# perturbations of every EMB_DECON_MOD-th corpus vector (the
# emb_dedup_curve cyclic-shift-mix pattern, alpha in {0, 0.2, 0.6} by
# residue) so the threshold separates: alpha 0/0.2 land at cos ~1/~0.98
# (caught), 0.6 at ~0.86 (kept), unrelated pairs near 0.
#
# Scale: benchmark sets are eval-sized (1e3-1e5 rows) and FIXED — they
# do not grow with the corpus, so the bench selection is bounded by
# EMB_DECON_MAX_ID as well as the residue (without the bound, the
# replication scale probe grows both sides and the probe cost goes
# quadratic — measured 5 s/52 s/309 s at 1x/8x/32x; with it, linear).
# The bench set is broadcast to every executor and probed map-side (one
# vectorized cosine per (corpus row, bench row)); the corpus itself
# never shuffles before the |labels|-row rollup. For benchmark sets
# past broadcast size, the sign-LSH bucketed pair join (emb_near_dup's
# machinery) is the drop-in escalation path.
# --------------------------------------------------------------------------

EMB_DECON_MOD = 11
EMB_DECON_MAX_ID = 100_000  # bench = a FIXED eval slice, not corpus-growing
EMB_DECON_COS = 0.9

_DECON_ROT = ("concat(slice(embedding, 2, size(embedding) - 1), "
              "slice(embedding, 1, 1))")
_DECON_ALPHA = ("CASE WHEN bid % 3 = 0 THEN cast(0.0 as double) "
                "WHEN bid % 3 = 1 THEN cast(0.2 as double) "
                "ELSE cast(0.6 as double) END")


def q_emb_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir, parallelize=True)
    # norms are staged ONCE per side before the broadcast cross — the
    # inline cosine re-folded both norms per PAIR (|corpus| x |bench|
    # interpreted lambda folds; measured 6.3 s -> the dot alone at
    # sf0.1). Same arithmetic bit-for-bit: dot / (na * nb).
    base = (emb.selectExpr(
        "vec_id", "label",
        "transform(embedding, v -> cast(v as double)) AS embedding")
        .selectExpr("vec_id", "label", "embedding",
                    f"{norm_expr('embedding')} AS _na"))
    bench = (base.filter((F.col("vec_id") % EMB_DECON_MOD == 0)
                         & (F.col("vec_id") < EMB_DECON_MAX_ID))
             .selectExpr("vec_id AS bid", "embedding")
             .selectExpr(
                 "bid",
                 f"zip_with(embedding, {_DECON_ROT}, "
                 f"(a, b) -> a + ({_DECON_ALPHA}) * b) AS be")
             .selectExpr("bid", "be", f"{norm_expr('be')} AS _nb"))
    scored = (
        base.join(broadcast(bench))
        .selectExpr("vec_id", "label",
                    f"({dot_expr('embedding', 'be')} / (_na * _nb)) "
                    "AS _cos")
        .groupBy("vec_id", "label")
        .agg(r6(F.max("_cos")).alias("_mc")))
    return (
        scored.groupBy("label")
        .agg(F.count(F.lit(1)).cast("long").alias("vecs_total"),
             F.sum(F.when(F.col("_mc") >= EMB_DECON_COS, 1).otherwise(0))
             .cast("long").alias("vecs_contaminados"),
             F.sum(F.when(F.col("_mc") < EMB_DECON_COS, 1).otherwise(0))
             .cast("long").alias("vecs_conservados"),
             F.max("_mc").alias("cos_max"))
        .orderBy("label")
    )


SQL_EMB_DECONTAMINATE = f"""
WITH based AS (
  SELECT vec_id, label,
         list_transform(embedding, v -> v::DOUBLE) AS embedding
  FROM embeddings
), bench AS (
  SELECT bid,
         list_transform(
           list_zip(embedding,
                    list_concat(list_slice(embedding, 2, len(embedding)),
                                list_slice(embedding, 1, 1))),
           x -> x[1] + (CASE WHEN bid % 3 = 0 THEN 0.0::DOUBLE
                             WHEN bid % 3 = 1 THEN 0.2::DOUBLE
                             ELSE 0.6::DOUBLE END) * x[2]) AS be
  FROM (SELECT vec_id AS bid, embedding FROM based
        WHERE vec_id % {EMB_DECON_MOD} = 0
          AND vec_id < {EMB_DECON_MAX_ID})
), scored AS (
  SELECT vec_id, label,
         floor(max({sql_cosine_expr('embedding', 'be')}) * 1000000 + 0.5)
           / 1000000 AS _mc
  FROM based CROSS JOIN bench
  GROUP BY vec_id, label
)
SELECT label,
       count(*)::BIGINT AS vecs_total,
       sum(CASE WHEN _mc >= {EMB_DECON_COS} THEN 1 ELSE 0 END)::BIGINT
         AS vecs_contaminados,
       sum(CASE WHEN _mc < {EMB_DECON_COS} THEN 1 ELSE 0 END)::BIGINT
         AS vecs_conservados,
       max(_mc) AS cos_max
FROM scored GROUP BY label ORDER BY label
"""

register("emb_decontaminate", q_emb_decontaminate, SQL_EMB_DECONTAMINATE)


# --------------------------------------------------------------------------
# ann_hard_negatives — hard-negative mining for contrastive training
# (DPR/Contriever-style): for each query vector, the HN_K most-similar
# corpus vectors with a DIFFERENT label — near the query in embedding
# space but semantically wrong, the negatives that actually move a
# retriever's loss. Random negatives are trivial at scale; the mining
# job is exactly this label-filtered top-k.
#
# Scale shape: the knn_brute contract — the query batch is broadcast
# (training batches are 1e2-1e5 rows), the corpus is scanned once
# map-side with a vectorized cosine, the label filter prunes before
# ranking, and the per-query rank window partitions by qid (|batch|
# partitions; each holds at most the corpus' negatives for one query —
# escalate to the sign-LSH bucketed probe (knn_lsh) when the per-query
# candidate set must shrink before ranking).
# --------------------------------------------------------------------------

HN_K = 5


def q_ann_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 8).selectExpr(
        "vec_id AS qid", "label AS qlabel", "embedding AS qe")
    corpus = emb.filter(F.col("vec_id") >= 8).selectExpr(
        "vec_id AS cid", "label AS neg_label", "embedding AS ce")
    scored = (
        broadcast(queries).crossJoin(corpus)
        .filter(F.col("neg_label") != F.col("qlabel"))
        .selectExpr("qid", "cid", "neg_label",
                    f"{cosine_expr('qe', 'ce')} AS _cos")
        .select("qid", "cid", "neg_label", r6(F.col("_cos")).alias("cos")))
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(),
                                          F.col("cid").asc())
    return (scored.withColumn("rango", F.row_number().over(w).cast("long"))
            .filter(F.col("rango") <= HN_K)
            .orderBy("qid", "rango"))


SQL_ANN_HARD_NEGATIVES = f"""
WITH scored AS (
  SELECT q.vec_id AS qid, c.vec_id AS cid, c.label AS neg_label,
         floor({sql_cosine_expr('q.embedding', 'c.embedding')}
               * 1000000 + 0.5) / 1000000 AS cos
  FROM embeddings q CROSS JOIN embeddings c
  WHERE q.vec_id < 8 AND c.vec_id >= 8 AND c.label <> q.label
), ranked AS (
  SELECT qid, cid, neg_label, cos,
         row_number() OVER (PARTITION BY qid
                            ORDER BY cos DESC, cid ASC)::BIGINT AS rango
  FROM scored
)
SELECT qid, cid, neg_label, cos, rango FROM ranked WHERE rango <= {HN_K}
ORDER BY qid, rango
"""

register("ann_hard_negatives", q_ann_hard_negatives, SQL_ANN_HARD_NEGATIVES)


# --------------------------------------------------------------------------
# emb_dim_stats — per-dimension embedding health audit: mean, population
# variance, min/max, and a dead-dimension flag (variance below EPS). The
# standard pre-training check on an embedding column: dead or collapsed
# dimensions flag an exporter bug or a truncated projection; a dimension
# whose scale dwarfs the rest breaks cosine-vs-dot assumptions downstream
# (reference: the per-column quality profiling of src/auditor.py:349-376,
# _evaluar_calidad_datos, applied to the vector column).
#
# Scale: one posexplode keyed by dimension index — the aggregate key
# space is EMB_DIM (64), fixed by the model, never corpus cardinality,
# and the partial aggregation is map-side combined, so the exchange
# carries |partitions| x 64 rows regardless of corpus size. Variance is
# the one-pass sum/sum-of-squares form; outputs are floor-rounded to
# millionths on both engines so partition-order float accumulation can't
# flip the hash.
# --------------------------------------------------------------------------

DIM_DEAD_EPS = 1e-4


def q_emb_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    dims = _emb(spark, sf_dir).select(
        F.posexplode(F.expr("transform(embedding, v -> cast(v as double))"))
        .alias("d", "v"))
    return (dims.groupBy("d")
            .agg(F.count(F.lit(1)).cast("long").alias("n"),
                 r6(F.avg("v")).alias("media"),
                 r6(F.avg(F.col("v") * F.col("v"))
                    - F.avg("v") * F.avg("v")).alias("varianza"),
                 r6(F.min("v")).alias("vmin"),
                 r6(F.max("v")).alias("vmax"))
            .withColumn("muerta",
                        (F.col("varianza") < DIM_DEAD_EPS).cast("boolean"))
            .select(F.col("d").cast("long").alias("d"), "n", "media",
                    "varianza", "vmin", "vmax", "muerta")
            .orderBy("d"))


SQL_EMB_DIM_STATS = f"""
WITH dims AS (
  SELECT d, embedding[d + 1]::DOUBLE AS v
  FROM embeddings CROSS JOIN (SELECT unnest(range(0, 64)) AS d)
), stats AS (
  SELECT d, count(*)::BIGINT AS n,
         floor(avg(v) * 1000000 + 0.5) / 1000000 AS media,
         floor((avg(v * v) - avg(v) * avg(v)) * 1000000 + 0.5) / 1000000
           AS varianza,
         floor(min(v) * 1000000 + 0.5) / 1000000 AS vmin,
         floor(max(v) * 1000000 + 0.5) / 1000000 AS vmax
  FROM dims GROUP BY d
)
SELECT d::BIGINT AS d, n, media, varianza, vmin, vmax,
       varianza < {DIM_DEAD_EPS} AS muerta
FROM stats ORDER BY d
"""

register("emb_dim_stats", q_emb_dim_stats, SQL_EMB_DIM_STATS)


# --------------------------------------------------------------------------
# emb_label_outliers — label-noise review queue: the vectors most
# confusable with ANOTHER label's centroid. For each vector compute the
# cosine to its OWN label centroid and the best cosine to any OTHER
# centroid (argmax, lowest label on ties); rank by the margin
# (cos_otro - cos_propio) and emit the top OUTLIER_TOP_K candidates —
# the standard mislabel-mining pass before training a classifier on the
# labels (reference: the outlier-audit framing of src/auditor.py:173-211,
# _detectar_importes_atipicos).
#
# Scale: the centroid table is |labels| x EMB_DIM (bounded by the label
# vocabulary, never corpus size); it folds into ONE broadcast array row,
# so the per-vector argmax over other centroids is a JVM higher-order
# fold with zero fan-out and zero extra shuffle — the corpus is scanned
# once for the centroid aggregate (posexplode keyed (label, dim),
# map-side combined) and once for the scoring pass; the final top-k is a
# TakeOrdered, never a global sort. No per-label window anywhere (labels
# are low-cardinality — the recurring window-key scale-killer).
# --------------------------------------------------------------------------

OUTLIER_TOP_K = 50
_R6_COS = ("floor((" + cosine_expr("embedding", "s.ce")
           + ") * 1000000 + 0.5) / 1000000")
_BEST_OTHER = (
    "array_max(transform(filter(_cents, s -> s.label != label), "
    f"s -> named_struct('c', {_R6_COS}, 'nl', -s.label)))")


def q_emb_label_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir).selectExpr(
        "vec_id", "label",
        "transform(embedding, v -> cast(v as double)) AS embedding")
    dims = emb.select("label", F.posexplode("embedding").alias("d", "v"))
    cents = (dims.groupBy("label", "d")
             .agg(F.expr("floor(avg(v) * 1000000 + 0.5) / 1000000")
                  .alias("m"))
             .groupBy("label")
             .agg(F.expr("transform(array_sort(collect_list(struct(d, m))), "
                         "s -> s.m)").alias("ce")))
    cent_arr = cents.agg(
        F.expr("collect_list(named_struct('label', label, 'ce', ce))")
        .alias("_cents"))
    scored = (emb.join(broadcast(cents), "label")
              .crossJoin(broadcast(cent_arr))
              .selectExpr(
                  "vec_id", "label",
                  "floor((" + cosine_expr("embedding", "ce")
                  + ") * 1000000 + 0.5) / 1000000 AS cos_propio",
                  f"{_BEST_OTHER} AS _best")
              .selectExpr("vec_id", "label", "cos_propio",
                          "-_best.nl AS otro", "_best.c AS cos_otro")
              # a label that is the corpus' ONLY label has no "other"
              # centroid: drop it (the oracle's inner join does the same)
              .filter(F.col("otro").isNotNull()))
    return (scored
            .withColumn("margen", F.expr(
                "floor((cos_otro - cos_propio) * 1000000 + 0.5) / 1000000"))
            .select(F.col("vec_id").cast("long").alias("vec_id"),
                    F.col("label").cast("long").alias("label"),
                    F.col("otro").cast("long").alias("otro"),
                    "cos_propio", "cos_otro", "margen")
            .orderBy(F.desc("margen"), F.asc("vec_id"))
            .limit(OUTLIER_TOP_K))


SQL_EMB_LABEL_OUTLIERS = f"""
WITH emb AS (
  SELECT vec_id, label,
         list_transform(embedding, v -> v::DOUBLE) AS embedding
  FROM embeddings
), cents AS (
  SELECT label, list(m ORDER BY d) AS ce FROM (
    SELECT label, d,
           floor(avg(embedding[d + 1]::DOUBLE) * 1000000 + 0.5) / 1000000 AS m
    FROM emb CROSS JOIN (SELECT unnest(range(0, 64)) AS d)
    GROUP BY label, d
  ) GROUP BY label
), propio AS (
  SELECT e.vec_id, e.label,
         floor({sql_cosine_expr('e.embedding', 'c.ce')} * 1000000 + 0.5)
           / 1000000 AS cos_propio
  FROM emb e JOIN cents c USING (label)
), otro AS (
  SELECT e.vec_id,
         max(struct_pack(
           c := floor({sql_cosine_expr('e.embedding', 'c2.ce')}
                      * 1000000 + 0.5) / 1000000,
           nl := -c2.label)) AS _best
  FROM emb e JOIN cents c2 ON c2.label != e.label
  GROUP BY e.vec_id
)
SELECT p.vec_id::BIGINT AS vec_id, p.label::BIGINT AS label,
       (-o._best.nl)::BIGINT AS otro, p.cos_propio,
       o._best.c AS cos_otro,
       floor((o._best.c - p.cos_propio) * 1000000 + 0.5) / 1000000 AS margen
FROM propio p JOIN otro o USING (vec_id)
ORDER BY margen DESC, vec_id ASC
LIMIT {OUTLIER_TOP_K}
"""

register("emb_label_outliers", q_emb_label_outliers, SQL_EMB_LABEL_OUTLIERS)


# --------------------------------------------------------------------------
# lsh_bucket_skew — the hot-bucket audit behind every LSH guard in this
# repo, turned into a measured query: per LSH table, the bucket-size
# distribution (bucket count, max bucket, mean size) and the EXACT
# within-bucket pair count (sum of C(size, 2) — the candidate-join cost
# that table contributes) plus its fraction of all C(n, 2) pairs. This
# is the number that says whether MAX_BUCKET_VECS is about to fire and
# how far from all-pairs the banded join actually is — "measure, don't
# guess" applied to the index itself.
#
# Scale: one exploded pass over the corpus keyed (table, bucket) — the
# aggregate key space is LSH_TABLES x 2^LSH_BITS (768), fixed by index
# parameters; pair counts are exact integer adds (mergeable partials),
# so the hash can't drift with partition order. No join anywhere.
# --------------------------------------------------------------------------

def q_lsh_bucket_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    bucketed = (
        emb.selectExpr("vec_id", f"{_BITS_EXPR} AS _bits")
        .selectExpr("vec_id", f"explode({_KEYS_EXPR}) AS cubo")
        .selectExpr("vec_id", "cast(split(cubo, ':')[0] AS bigint) AS t",
                    "cubo"))
    sizes = (bucketed.groupBy("t", "cubo")
             .agg(F.count(F.lit(1)).cast("long").alias("_sz")))
    return (sizes.groupBy("t")
            .agg(F.count(F.lit(1)).cast("long").alias("n_cubos"),
                 F.sum("_sz").cast("long").alias("n_vecs"),
                 F.max("_sz").cast("long").alias("max_cubo"),
                 F.sum(F.expr("_sz * (_sz - 1) div 2"))
                 .cast("long").alias("pares"))
            .withColumn("media", F.expr(
                "floor(n_vecs / cast(n_cubos as double) * 1000000 + 0.5) "
                "/ 1000000"))
            .withColumn("frac_pares", F.expr(
                "floor(pares / (n_vecs * (n_vecs - 1) / cast(2 as double)) "
                "* 1000000 + 0.5) / 1000000"))
            .select("t", "n_cubos", "n_vecs", "max_cubo", "pares",
                    "media", "frac_pares")
            .orderBy("t"))


SQL_LSH_BUCKET_SKEW = f"""
WITH bits AS (
  SELECT vec_id,
         list_transform({_PLANES_SQL}, h ->
           list_sum(list_transform(list_zip(embedding, h),
                    x -> (x[1]::DOUBLE) * x[2])) >= 0) AS _bits
  FROM embeddings
), bucketed AS (
  SELECT vec_id, t,
         concat(t, ':', list_reduce(list_prepend(0,
           list_transform(list_slice(_bits, t * {LSH_BITS} + 1,
                                     t * {LSH_BITS} + {LSH_BITS}),
                          b -> CASE WHEN b THEN 1 ELSE 0 END)),
           (acc, x) -> acc * 2 + x)) AS cubo
  FROM bits CROSS JOIN (SELECT unnest(range(0, {LSH_TABLES})) AS t)
), sizes AS (
  SELECT t, cubo, count(*)::BIGINT AS _sz FROM bucketed GROUP BY t, cubo
)
SELECT t::BIGINT AS t, count(*)::BIGINT AS n_cubos,
       sum(_sz)::BIGINT AS n_vecs, max(_sz)::BIGINT AS max_cubo,
       sum(_sz * (_sz - 1) // 2)::BIGINT AS pares,
       floor(sum(_sz) / count(*)::DOUBLE * 1000000 + 0.5) / 1000000 AS media,
       floor(sum(_sz * (_sz - 1) // 2)
             / (sum(_sz) * (sum(_sz) - 1) / 2.0) * 1000000 + 0.5) / 1000000
         AS frac_pares
FROM sizes GROUP BY t ORDER BY t
"""

register("lsh_bucket_skew", q_lsh_bucket_skew, SQL_LSH_BUCKET_SKEW)


# --------------------------------------------------------------------------
# knn_mutual_pairs — mutual-kNN graph construction: the edge (a, b)
# survives iff b is in a's LSH-candidate top-MUTUAL_K AND a is in b's.
# Mutual edges are the standard symmetrization for semantic-graph
# curation (cluster seeds, label propagation, diversity sampling) —
# one-directional neighbors are dominated by hubs; mutual pairs are the
# high-precision backbone. Candidates use the NEAR-DUP index shape
# (ND_TABLES x ND_BITS — 4096 buckets per table), NOT knn_lsh's 6-bit
# buckets: a corpus<->corpus join needs fine buckets (in-bucket pair
# cost is sum n_b^2; 64 coarse buckets per table go quadratic the
# moment the corpus grows — knn_lsh gets away with them only because
# its probe side is a 50-row broadcast). The oracle mirrors the index
# bit-for-bit, so the graph checked is the graph served.
#
# Scale: bucketed self-join only (never all-pairs), hot buckets dropped
# by the MAX_BUCKET_VECS guard BEFORE the join on both engines; the
# per-vector top-k windows key on vec_id (corpus-cardinality); the
# mutual check is a self-join of the k·|corpus|-row edge list on the
# undirected pair key. At larger corpora ND_BITS rises with log n —
# bucket count tracks corpus size, keeping mean bucket size O(1).
# --------------------------------------------------------------------------

MUTUAL_K = 3


def q_knn_mutual_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    w_cubo = Window.partitionBy("cubo")
    bucketed = (
        emb.selectExpr("vec_id", "embedding", f"{_BITS_EXPR} AS _bits")
        .selectExpr("vec_id", "embedding", f"explode({_ND_KEYS_EXPR}) AS cubo")
        .withColumn("_n", F.count(F.lit(1)).over(w_cubo))
        .filter(F.col("_n") <= MAX_BUCKET_VECS).drop("_n")
        .cache())
    left = bucketed.selectExpr("vec_id AS src", "embedding AS e1", "cubo")
    right = bucketed.selectExpr("vec_id AS dst", "embedding AS e2", "cubo")
    scored = (
        left.join(right, "cubo")
        .filter(F.col("src") != F.col("dst"))
        .selectExpr("src", "dst", f"{cosine_expr('e1', 'e2')} AS _cos")
        .select("src", "dst", r6(F.col("_cos")).alias("cos"))
        .dropDuplicates(["src", "dst"]))
    w = Window.partitionBy("src").orderBy(F.desc("cos"), F.asc("dst"))
    # the fwd/rev arms of the mutuality join otherwise each re-execute
    # the whole candidate join + dedup + top-k window (union-arm rule:
    # Spark shares no mid-plan results); the edge list is k x |corpus|
    # narrow rows — cache it, not the join (r10 A/B min-of-4: 0.81x)
    edges = (scored.withColumn("rango", F.row_number().over(w).cast("long"))
             .filter(F.col("rango") <= MUTUAL_K)
             .cache())
    fwd = edges.filter("src < dst").selectExpr(
        "src AS a", "dst AS b", "cos", "rango AS rango_ab")
    rev = edges.filter("src > dst").selectExpr(
        "dst AS a", "src AS b", "rango AS rango_ba")
    return (fwd.join(rev, ["a", "b"])
            .select(F.col("a").cast("long").alias("a"),
                    F.col("b").cast("long").alias("b"),
                    "cos", "rango_ab", "rango_ba")
            .orderBy("a", "b"))


SQL_KNN_MUTUAL_PAIRS = f"""
WITH bits AS (
  SELECT vec_id, embedding,
         list_transform({_PLANES_SQL}, h ->
           list_sum(list_transform(list_zip(embedding, h),
                    x -> (x[1]::DOUBLE) * x[2])) >= 0) AS _bits
  FROM embeddings
), bucketed0 AS (
  SELECT vec_id, embedding,
         concat(t, ':', list_reduce(list_prepend(0,
           list_transform(list_slice(_bits, t * {ND_BITS} + 1,
                                     t * {ND_BITS} + {ND_BITS}),
                          b -> CASE WHEN b THEN 1 ELSE 0 END)),
           (acc, x) -> acc * 2 + x)) AS cubo
  FROM bits CROSS JOIN (SELECT unnest(range(0, {ND_TABLES})) AS t)
), bucketed AS (
  SELECT vec_id, embedding, cubo FROM (
    SELECT *, count(*) OVER (PARTITION BY cubo) AS _n FROM bucketed0)
  WHERE _n <= {MAX_BUCKET_VECS}
), scored AS (
  SELECT DISTINCT l.vec_id AS src, r.vec_id AS dst,
         floor({sql_cosine_expr('l.embedding', 'r.embedding')}
               * 1000000 + 0.5) / 1000000 AS cos
  FROM bucketed l JOIN bucketed r
    ON l.cubo = r.cubo AND l.vec_id != r.vec_id
), edges AS (
  SELECT src, dst, cos,
         row_number() OVER (PARTITION BY src
                            ORDER BY cos DESC, dst ASC)::BIGINT AS rango
  FROM scored QUALIFY rango <= {MUTUAL_K}
)
SELECT f.a::BIGINT AS a, f.b::BIGINT AS b, f.cos, f.rango_ab, r.rango_ba
FROM (SELECT src AS a, dst AS b, cos, rango AS rango_ab
      FROM edges WHERE src < dst) f
JOIN (SELECT dst AS a, src AS b, rango AS rango_ba
      FROM edges WHERE src > dst) r USING (a, b)
ORDER BY a, b
"""

register("knn_mutual_pairs", q_knn_mutual_pairs, SQL_KNN_MUTUAL_PAIRS)
