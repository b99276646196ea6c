"""Accuracy harness for the approximate operators.

The oracle gate proves the approximate operators are deterministic and
cross-engine reproducible; this file proves they are USEFUL — each
approximation is measured against its exact counterpart on the same data
and must clear a documented quality floor. Bounds are set well below
measured values so they flag real regressions (a broken hash, a dropped
band, a bucketing bug), not noise: these are deterministic computations,
identical on every run.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def acc_dir():
    return "/root/testdata/sf0.01"


def test_knn_lsh_recall_and_lift(spark, acc_dir):
    """Hyperplane ANN measured against exact brute force over the SAME
    query/corpus split. The synthetic embeddings are near-structureless
    (within-label cosine ~0.002), so the information-theoretic ceiling for
    any sub-linear method is low; the honest quality metric is LIFT —
    recall divided by the fraction of the corpus scanned, i.e. how much
    better than random candidate selection the hash is. Measured: recall
    0.44 scanning ~0.18 of the corpus (lift ~2.4)."""
    from pyspark.sql import Window
    from prac_data_pipelines_spark.operators.similarity import cosine_expr
    from prac_data_pipelines_spark.queries.vector import LSH_TOP_K, q_knn_lsh
    from prac_data_pipelines_spark.sources import load_table

    emb = load_table(spark, acc_dir, "embeddings")
    q = emb.filter("vec_id < 50").selectExpr("vec_id qid", "embedding qe")
    c = emb.filter("vec_id >= 50").selectExpr("vec_id cid", "embedding ce")
    n_corpus = c.count()
    scored = q.crossJoin(c).selectExpr("qid", "cid",
                                       f"{cosine_expr('qe', 'ce')} cos")
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(),
                                          F.col("cid").asc())
    truth = {(r.qid, r.cid) for r in
             scored.withColumn("rk", F.row_number().over(w))
             .filter(F.col("rk") <= LSH_TOP_K).collect()}
    lsh = {(r.qid, r.cid) for r in q_knn_lsh(spark, acc_dir).collect()}
    recall = len(lsh & truth) / len(truth)

    # candidate fraction actually scanned (union of buckets, pre-ranking)
    from prac_data_pipelines_spark.queries.vector import _BITS_EXPR, _KEYS_EXPR
    bucketed = (emb.selectExpr("vec_id", f"{_BITS_EXPR} AS _bits")
                .selectExpr("vec_id", f"explode({_KEYS_EXPR}) AS cubo"))
    qb = bucketed.filter("vec_id < 50").selectExpr("vec_id qid", "cubo")
    cb = bucketed.filter("vec_id >= 50").selectExpr("vec_id cid", "cubo")
    cand = qb.join(cb, "cubo").select("qid", "cid").distinct()
    frac = cand.count() / (qb.select("qid").distinct().count() * n_corpus)

    assert recall >= 0.30, f"LSH recall collapsed: {recall:.2f}"
    assert frac <= 0.35, f"LSH scans too much of the corpus: {frac:.2f}"
    lift = recall / frac
    assert lift >= 1.8, f"LSH no better than random scanning: lift {lift:.2f}"


def test_minhash_estimate_tracks_exact_jaccard(spark, acc_dir):
    """For every surviving candidate pair the MinHash estimate must be
    within 0.35 of the exact shingle Jaccard (8 permutations → sigma
    ~0.17), and correlate in aggregate (mean |err| under 0.15)."""
    from prac_data_pipelines_spark.queries.text import (
        q_doc_minhash_pairs,
        q_doc_ngram_jaccard,
    )

    est = {(r.d1, r.d2): r.jaccard_est
           for r in q_doc_minhash_pairs(spark, acc_dir).collect()}
    exact = {(r.d1, r.d2): r.jaccard
             for r in q_doc_ngram_jaccard(spark, acc_dir).collect()}
    common = set(est) & set(exact)
    assert len(common) >= 10
    errs = [abs(est[p] - exact[p]) for p in common]
    assert max(errs) <= 0.35, f"worst MinHash error {max(errs):.3f}"
    assert sum(errs) / len(errs) <= 0.15, f"mean error {sum(errs)/len(errs):.3f}"


def test_approx_count_distinct_error_bound(spark, acc_dir):
    """HLL++ sketch vs exact distinct on the events user population —
    default rsd is 5%; require observed error under 10%."""
    from prac_data_pipelines_spark.sources import load_table

    ev = load_table(spark, acc_dir, "events")
    row = ev.agg(
        F.approx_count_distinct("user_id").alias("approx"),
        F.countDistinct("user_id").alias("exact")).collect()[0]
    err = abs(row.approx - row.exact) / row.exact
    assert err <= 0.10, f"HLL error {err:.3f} (approx={row.approx}, exact={row.exact})"


def test_approx_percentile_error_bound(spark, acc_dir):
    """approx_percentile with accuracy 10000 vs the exact percentile on
    lineitem prices — require under 1% relative error at p50/p90."""
    from prac_data_pipelines_spark.sources import load_table

    li = load_table(spark, acc_dir, "lineitem")
    row = li.agg(
        F.expr("approx_percentile(l_extendedprice, array(0.5, 0.9), 10000)")
        .alias("approx"),
        F.expr("percentile(l_extendedprice, array(0.5, 0.9))").alias("exact"),
    ).collect()[0]
    for a, e in zip(row.approx, row.exact):
        assert abs(a - e) / e <= 0.01, f"approx percentile {a} vs exact {e}"


def test_simhash_hamming_separates_duplicates(spark, acc_dir):
    """Near-dup pairs (from LSH) must sit at a smaller SimHash Hamming
    distance than random pairs — the property that makes SimHash a usable
    dedup filter."""
    from prac_data_pipelines_spark.queries.text import (
        q_doc_minhash_pairs,
        q_doc_simhash,
    )

    sim = {r.doc_id: r.simhash for r in q_doc_simhash(spark, acc_dir).collect()}
    pairs = [(r.d1, r.d2)
             for r in q_doc_minhash_pairs(spark, acc_dir)
             .filter(F.col("jaccard_est") >= 0.5).collect()]
    assert pairs

    def ham(a: int, b: int) -> int:
        return bin(a ^ b).count("1")

    dup_mean = sum(ham(sim[a], sim[b]) for a, b in pairs) / len(pairs)
    ids = sorted(sim)
    rand = [(ids[i], ids[(i * 7 + 13) % len(ids)]) for i in range(0, 200)]
    rand = [(a, b) for a, b in rand if a != b]
    rand_mean = sum(ham(sim[a], sim[b]) for a, b in rand) / len(rand)
    # the synthetic docs share one template vocabulary, so even random
    # pairs sit well below the 14-bit random-28-bit mean; require clear
    # separation, not a fixed absolute gap
    assert dup_mean < rand_mean * 0.7, (dup_mean, rand_mean)


def test_knn_ivf_recall_and_lift(spark, acc_dir):
    """Multi-probe IVF measured against exact brute force over the SAME
    query/corpus split (qid < 40, corpus = rest). As with LSH, the
    near-structureless synthetic embeddings put a low ceiling on any
    sub-linear method, so the quality bar is lift over random scanning:
    recall divided by the fraction of (query, corpus) pairs scored."""
    from pyspark.sql import Window
    from prac_data_pipelines_spark.operators.similarity import cosine_expr
    from prac_data_pipelines_spark.queries.vector import IVF_TOP_K, q_knn_ivf
    from prac_data_pipelines_spark.sources import load_table

    emb = load_table(spark, acc_dir, "embeddings")
    q = emb.filter("vec_id < 40").selectExpr("vec_id qid", "embedding qe")
    c = emb.filter("vec_id >= 40").selectExpr("vec_id cid", "embedding ce")
    n_pairs = q.count() * c.count()
    scored = q.crossJoin(c).selectExpr("qid", "cid",
                                       f"{cosine_expr('qe', 'ce')} cos")
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(),
                                          F.col("cid").asc())
    truth = {(r.qid, r.cid) for r in
             scored.withColumn("rk", F.row_number().over(w))
             .filter(F.col("rk") <= IVF_TOP_K).collect()}

    ivf_rows = q_knn_ivf(spark, acc_dir).collect()
    ivf = {(r.qid, r.cid) for r in ivf_rows}
    recall = len(ivf & truth) / len(truth)

    # pairs scored = every (query, corpus) pair sharing a probed list;
    # the top-k output undercounts, so recount from the probe structure
    from prac_data_pipelines_spark.queries.vector import (
        IVF_NPROBE,
        KMEANS_ITERS,
        KMEANS_K,
        _assign_to,
        _recenter,
    )
    from pyspark.sql import functions as SF
    embd = emb.selectExpr(
        "vec_id", "transform(embedding, v -> cast(v as double)) AS embedding")
    cents = (embd.filter(SF.col("vec_id") < KMEANS_K)
             .selectExpr("vec_id AS centroid_id", "embedding AS ce"))
    for _ in range(KMEANS_ITERS):
        cents = _recenter(_assign_to(embd, cents))
    sc = (embd.crossJoin(SF.broadcast(cents))
          .selectExpr("vec_id", "centroid_id",
                      f"{cosine_expr('embedding', 'ce')} AS _sim"))
    wa = Window.partitionBy("vec_id").orderBy(SF.col("_sim").desc(),
                                              SF.col("centroid_id").asc())
    rk = sc.withColumn("_rn", SF.row_number().over(wa))
    qs = (rk.filter((SF.col("vec_id") < 40) & (SF.col("_rn") <= IVF_NPROBE))
          .selectExpr("vec_id qid", "centroid_id"))
    cs = (rk.filter((SF.col("vec_id") >= 40) & (SF.col("_rn") == 1))
          .selectExpr("vec_id cid", "centroid_id"))
    n_scored = qs.join(cs, "centroid_id").select("qid", "cid").distinct().count()
    frac = n_scored / n_pairs

    assert recall >= 0.15, f"IVF recall collapsed: {recall:.2f}"
    assert frac <= 0.6, f"IVF probes too much of the corpus: {frac:.2f}"
    assert recall / frac >= 1.2, f"IVF no better than random: {recall/frac:.2f}"


def test_emb_near_dup_finds_every_clone(spark, acc_dir):
    """Identical vectors share every bucket, so recall at cos=1 is
    structural — all 30 synthesized clone pairs must surface regardless
    of the bucket-key scheme (this pinned the 6x12-bit re-keying)."""
    from prac_data_pipelines_spark.queries.vector import q_emb_near_dup

    pairs = q_emb_near_dup(spark, acc_dir)
    clones = (pairs.filter((F.col("d2") >= 1000000)
                           & (F.col("d2") - 1000000 == F.col("d1")))
              .count())
    assert clones == 30, f"clone recall broke: {clones}/30"


def test_dup_clusters_match_union_find(spark, sf_dir):
    """The distributed connected-components labeling (min-label propagation
    + pointer jumping) must equal an independent driver-side union-find
    over the same candidate pairs — validating the iterative algorithm
    without the recursive-CTE oracle's cost ceiling."""
    from prac_data_pipelines_spark.queries.text import (
        CLUSTER_MIN_EST,
        q_doc_dup_clusters,
        q_doc_minhash_pairs,
    )
    from pyspark.sql import functions as F

    pairs = (q_doc_minhash_pairs(spark, sf_dir)
             .filter(F.col("jaccard_est") >= CLUSTER_MIN_EST)
             .select("d1", "d2").collect())
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pairs:
        a, b = find(r["d1"]), find(r["d2"])
        if a != b:
            hi, lo = max(a, b), min(a, b)
            parent[hi] = lo
    want = {x: find(x) for x in parent}

    got = {r["doc_id"]: r["cluster_id"]
           for r in q_doc_dup_clusters(spark, sf_dir).collect()}
    assert got == want and len(got) > 0


def test_dup_clusters_match_union_find_at_sf01(spark):
    """Same cross-check at the 5k-doc scale the sf0.1 oracle run skips
    (the recursive-CTE oracle is too slow there): the iterative CC
    labeling must still partition identically to the union-find."""
    import os

    import pytest

    big = "/root/testdata/sf0.1"
    if not os.path.isdir(big):
        pytest.skip("sf0.1 testdata not present")
    from collections import defaultdict

    from pyspark.sql import functions as F

    from prac_data_pipelines_spark.queries.text import (
        CLUSTER_MIN_EST,
        q_doc_dup_clusters,
        q_doc_minhash_pairs,
    )

    pairs = (q_doc_minhash_pairs(spark, big)
             .filter(F.col("jaccard_est") >= CLUSTER_MIN_EST)
             .select("d1", "d2").collect())
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pairs:
        a, b = find(r["d1"]), find(r["d2"])
        if a != b:
            parent[max(a, b)] = min(a, b)
    want = defaultdict(set)
    for x in parent:
        want[find(x)].add(x)
    got = defaultdict(set)
    for r in q_doc_dup_clusters(spark, big).collect():
        got[r["cluster_id"]].add(r["doc_id"])
    assert {frozenset(v) for v in got.values()} == \
        {frozenset(v) for v in want.values()}
    assert len(got) > 100


def test_emb_dedup_curve_monotone_and_separating(spark, acc_dir):
    """The threshold curve must behave like a curve: pair and drop counts
    non-increasing in the threshold, kept docs non-decreasing — and the
    graded clone groups must SEPARATE it (strictly fewer docs dropped at
    0.995 than at 0.8; the 30 exact clones dropped at every threshold,
    since cos(e, e) = 1 clears any bound)."""
    from prac_data_pipelines_spark.queries.vector import q_emb_dedup_curve

    rows = q_emb_dedup_curve(spark, acc_dir).collect()
    assert [r["umbral"] for r in rows] == sorted(r["umbral"] for r in rows)
    for a, b in zip(rows, rows[1:]):
        assert b["pares"] <= a["pares"]
        assert b["docs_caidos"] <= a["docs_caidos"]
        assert b["docs_conservados"] >= a["docs_conservados"]
    assert rows[-1]["docs_caidos"] < rows[0]["docs_caidos"]
    assert all(r["docs_caidos"] >= 30 for r in rows)


def test_phash_clusters_match_union_find_at_sf01(spark):
    """Image-side CC (shared operators/graph.py loop) must partition
    identically to a driver-side union-find over the same banded
    Hamming pairs at the 5k-doc scale the sf0.1 oracle run skips."""
    import os

    import pytest

    big = "/root/testdata/sf0.1"
    if not os.path.isdir(big):
        pytest.skip("sf0.1 testdata not present")
    from prac_data_pipelines_spark.queries.media import (
        q_multimodal_phash_clusters,
        q_multimodal_phash_pairs,
    )

    pairs = q_multimodal_phash_pairs(spark, big).select("d1", "d2").collect()
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pairs:
        a, b = find(r["d1"]), find(r["d2"])
        if a != b:
            hi, lo = max(a, b), min(a, b)
            parent[hi] = lo
    want = {x: find(x) for x in parent}

    got = {r["doc_id"]: r["cluster_id"]
           for r in q_multimodal_phash_clusters(spark, big).collect()}
    assert got == want and len(got) > 0


def test_phash_weights_match_union_find_rollup_at_sf01(spark):
    """Image soft-dedup weights at the 5k-doc scale the sf0.1 oracle run
    skips: recompute the per-source rollup driver-side from a union-find
    over the same banded Hamming pairs with the SAME exact-integer
    weight arithmetic (floor(1e6/|cluster|), BIGINT sums, one division
    at the edge) — every column must match."""
    import os
    from collections import Counter, defaultdict

    import pytest

    big = "/root/testdata/sf0.1"
    if not os.path.isdir(big):
        pytest.skip("sf0.1 testdata not present")
    from prac_data_pipelines_spark.queries.media import (
        q_multimodal_phash_pairs,
        q_multimodal_phash_weights,
    )
    from prac_data_pipelines_spark.sources import load_table

    pairs = q_multimodal_phash_pairs(spark, big).select("d1", "d2").collect()
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pairs:
        a, b = find(r["d1"]), find(r["d2"])
        if a != b:
            parent[max(a, b)] = min(a, b)
    tam = Counter(find(x) for x in parent)
    size_of = {x: tam[find(x)] for x in parent}

    docs = (load_table(spark, big, "documents")
            .selectExpr("doc_id", "source",
                        "cast(octet_length(encode(text, 'UTF-8')) "
                        "as bigint) AS b").collect())
    agg = defaultdict(lambda: [0, 0, 0, 0])  # n, bytes, sw6, sbw6
    for r in docs:
        w6 = 1000000 // size_of.get(r["doc_id"], 1)
        a = agg[r["source"]]
        a[0] += 1
        a[1] += r["b"]
        a[2] += w6
        a[3] += r["b"] * w6
    import math

    def rnd6(x: float) -> float:
        return math.floor(x * 1000000 + 0.5) / 1000000

    want = {
        s: (n, by, rnd6(sw6 / 1000000.0), sbw6 // 1000000,
            rnd6(sbw6 / (1000000.0 * by)))
        for s, (n, by, sw6, sbw6) in agg.items()
    }
    got = {
        r["source"]: (r["n_docs"], r["bytes_total"], r["docs_efectivos"],
                      r["bytes_efectivos"], r["frac_efectiva"])
        for r in q_multimodal_phash_weights(spark, big).collect()
    }
    assert got == want
    # soft dedup is non-trivial at this scale: some source's effective
    # doc count is strictly below its raw count
    assert any(g[2] < g[0] for g in got.values())
