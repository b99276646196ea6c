"""Unit-level operator tests: salted join equivalence, bucket compiler
edges, TOTAL-row arithmetic, z-score guards."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_salted_join_matches_plain_join(spark, sf_dir):
    from prac_data_pipelines_spark.operators.skew import salted_join
    from prac_data_pipelines_spark.sources import load_table

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    plain = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    salted = salted_join(
        li.withColumnRenamed("l_orderkey", "o_orderkey"), orders,
        "o_orderkey", n_salts=4).count()
    assert salted == plain


def test_bucketize_edges(spark):
    from prac_data_pipelines_spark.config import RANGOS_ANTIGUEDAD
    from prac_data_pipelines_spark.operators.buckets import bucketize

    df = spark.createDataFrame(
        [(-5,), (0,), (1,), (15,), (16,), (365,), (366,), (None,)], ["d"])
    out = {r["d"]: r["b"] for r in df.select(
        "d", bucketize(F.col("d"), RANGOS_ANTIGUEDAD).alias("b")).collect()}
    assert out[-5] == "VIGENTE" and out[0] == "VIGENTE"
    assert out[1] == "1-15 DIAS" and out[15] == "1-15 DIAS"
    assert out[16] == "16-30 DIAS"
    assert out[365] == "181-365 DIAS" and out[366] == "MAS DE 365 DIAS"
    assert out[None] == "SIN CLASIFICAR"


def test_total_row(spark):
    from prac_data_pipelines_spark.operators.totals import with_total_row

    df = spark.createDataFrame(
        [("a", 1.25, 2), ("b", 2.50, 3)], ["k", "monto", "n"])
    out = with_total_row(df, "k", ["monto"], int_sum_cols=["n"])
    total = [r for r in out.collect() if r["k"] == "TOTAL"][0]
    assert total["monto"] == 3.75 and total["n"] == 5


def test_asof_join_null_payload_still_matches(spark):
    import datetime as dt

    from prac_data_pipelines_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 10), "e1")], ["k", "lt", "ev"])
    right = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 5), None),        # older, null payload
         (1, dt.datetime(2024, 1, 8), None)],       # newest <= lt, null payload
        "k long, rt timestamp, p string")
    out = asof_join(left, right, key="k", left_time="lt", right_time="rt",
                    payload_cols=["p"]).collect()
    # a true as-of match with a NULL payload is still a match
    assert len(out) == 1 and out[0]["p"] is None


def test_salted_join_rejects_outer(spark, sf_dir):
    import pytest as _pytest

    from prac_data_pipelines_spark.operators.skew import salted_join
    from prac_data_pipelines_spark.sources import load_table

    o = load_table(spark, sf_dir, "orders")
    with _pytest.raises(ValueError):
        salted_join(o, o.limit(1), "o_orderkey", how="full")


def test_zscore_guards(spark):
    from prac_data_pipelines_spark.operators.stats import zscore_columns

    # n < 3 → all null z
    small = spark.createDataFrame([(1.0,), (2.0,)], ["x"])
    z = zscore_columns(small, "x", z_col="z", flag_col="f")
    assert all(r["z"] is None for r in z.collect())
    # zero variance → all null z
    flat = spark.createDataFrame([(5.0,)] * 4, ["x"])
    z2 = zscore_columns(flat, "x", z_col="z", flag_col="f")
    assert all(r["z"] is None for r in z2.collect())


def test_tune_for_input_scales_with_volume(spark, sf_dir):
    from prac_data_pipelines_spark.session import tune_for_input

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        cores = spark.sparkContext.defaultParallelism
        # report-sized input: floor at 2x cores (AQE coalesces below)
        assert tune_for_input(spark, sf_dir) == 2 * cores
        # same bytes against a tiny target: partition count grows with the
        # input/target ratio, proving the formula tracks volume
        many = tune_for_input(spark, sf_dir, target_partition_bytes=1024)
        assert many > 2 * cores
        assert int(spark.conf.get("spark.sql.shuffle.partitions")) == many
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_sharded_range_window_matches_single_key_window(spark):
    """The time-sharded RANGE window must agree row-for-row with the plain
    single-key window, including rows in the boundary-overlap region and
    exact bucket-edge timestamps."""
    from pyspark.sql import Window

    from prac_data_pipelines_spark.operators.windows import sharded_range_window

    # timestamps engineered around bucket edges: bucket=20s, range=10s
    rows = [("a", s, float(s)) for s in
            [0, 3, 9, 10, 11, 19, 20, 21, 29, 30, 31, 39, 40, 55, 60]]
    rows += [("b", s, float(s * 2)) for s in [5, 18, 20, 22, 38, 40, 41]]
    df = spark.createDataFrame(rows, "k string, sec long, v double") \
        .withColumn("ts", F.col("sec").cast("timestamp"))

    sharded = sharded_range_window(
        df, ["k"], "ts", 10,
        {"n": lambda w: F.count(F.lit(1)).over(w).cast("long"),
         "s": lambda w: F.sum("v").over(w)},
        bucket_seconds=20)

    w = (Window.partitionBy("k").orderBy(F.col("ts").cast("long"))
         .rangeBetween(-10, 0))
    plain = (df.withColumn("n", F.count(F.lit(1)).over(w).cast("long"))
               .withColumn("s", F.sum("v").over(w)))

    key = lambda r: (r["k"], r["sec"])
    got = sorted(sharded.select("k", "sec", "n", "s").collect(), key=key)
    want = sorted(plain.select("k", "sec", "n", "s").collect(), key=key)
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_sharded_range_window_rejects_small_bucket(spark):
    from prac_data_pipelines_spark.operators.windows import sharded_range_window

    df = spark.range(1).selectExpr("'a' AS k", "cast(id as timestamp) AS ts")
    try:
        sharded_range_window(df, ["k"], "ts", 100,
                             {"n": lambda w: F.count(F.lit(1)).over(w)},
                             bucket_seconds=50)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_events_rolling_sharded_equals_events_rolling(spark, sf_dir):
    from prac_data_pipelines_spark.queries.events import (
        q_events_rolling,
        q_events_rolling_sharded,
    )

    plain = q_events_rolling(spark, sf_dir).collect()
    sharded = q_events_rolling_sharded(spark, sf_dir).collect()
    assert [tuple(r) for r in plain] == [tuple(r) for r in sharded]


def test_doc_chunks_cover_every_word_with_stride_overlap(spark, sf_dir):
    """Chunk invariants over the real corpus: chunks start at exact stride
    multiples, every word of every document falls in some chunk, only the
    final chunk may be short, and (doc, chunk_idx) is dense from 0."""
    from prac_data_pipelines_spark.queries.text import (
        CHUNK_STRIDE,
        CHUNK_WORDS,
        q_doc_chunks,
    )

    rows = q_doc_chunks(spark, sf_dir).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert by_doc
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_idx"])
        n_words = chunks[-1]["desde_palabra"] + chunks[-1]["n_palabras"]
        for i, c in enumerate(chunks):
            assert c["chunk_idx"] == i
            assert c["desde_palabra"] == i * CHUNK_STRIDE
            want = min(CHUNK_WORDS, n_words - i * CHUNK_STRIDE)
            assert c["n_palabras"] == want, (doc_id, i)
        # coverage: next chunk starts before the previous one ends
        for prev, nxt in zip(chunks, chunks[1:]):
            assert nxt["desde_palabra"] < (prev["desde_palabra"]
                                           + prev["n_palabras"])


def test_conversion_window_consistent_with_pairs(spark, sf_dir):
    """Internal consistency of the temporal-join family: aggregating the
    pair query per click must equal the RANGE-frame window query — two
    independent plans (bucketed join vs window frame), one semantics."""
    from prac_data_pipelines_spark.queries.events import (
        q_events_conversion_pairs,
        q_events_conversion_window,
    )

    from_pairs = {}
    for r in q_events_conversion_pairs(spark, sf_dir).collect():
        n, v = from_pairs.get(r["click_id"], (0, 0.0))
        from_pairs[r["click_id"]] = (n + 1, round(v + r["monto"], 2))
    windowed = q_events_conversion_window(spark, sf_dir).collect()
    assert sum(r["n_compras"] for r in windowed) == sum(
        n for n, _ in from_pairs.values())
    for r in windowed:
        if r["n_compras"]:
            n, _ = from_pairs[r["click_id"]]
            assert n == r["n_compras"]


def test_dedup_weights_conserve_content_mass(spark, sf_dir):
    """Soft-dedup invariant: every content cluster contributes total
    weight ~1 (quantized to millionths), so the corpus-wide effective
    doc count must equal singletons + number of multi-doc clusters,
    within the floor(1e6/tam) quantization error (< tam/1e6 per
    cluster). Containment pairs must also be a superset story: every
    pair doc_ngram_jaccard reports at the near-dup threshold has
    containment >= jaccard in both directions by set algebra."""
    from prac_data_pipelines_spark.queries.text import (
        q_doc_dedup_weights,
        q_doc_dup_clusters,
    )
    from prac_data_pipelines_spark.sources import load_table

    rows = q_doc_dedup_weights(spark, sf_dir).collect()
    total_eff = sum(r["docs_efectivos"] for r in rows)
    n_docs = load_table(spark, sf_dir, "documents").count()
    clustered = q_doc_dup_clusters(spark, sf_dir).collect()
    n_clustered_docs = len(clustered)
    n_clusters = len({r["cluster_id"] for r in clustered})
    want = (n_docs - n_clustered_docs) + n_clusters
    assert abs(total_eff - want) < 0.01 + n_clusters * 64 / 1e6
    assert total_eff < n_docs  # weighting must actually down-weight


def test_min_label_components_labels_and_raise(spark):
    """Direct unit test of the shared CC core: labels on a mix of path /
    star / pair / self-loop components equal the smallest reachable id
    (with the seeded first propagation step this exercises both the
    pre-seeded fast path — pairs/stars converge in the verification
    round — and the loop for the diameter-4 path); exhausting the round
    budget must raise, never return partial labels."""
    import pytest as _pytest

    from prac_data_pipelines_spark.operators.graph import (
        min_label_components,
    )

    pairs = spark.createDataFrame(
        [(2, 1), (3, 2), (4, 3), (5, 4),       # path 1-2-3-4-5
         (10, 9), (11, 9), (12, 9),            # star centered at 9
         (20, 21),                             # pair
         (30, 30)],                            # self-loop singleton
        "d1 long, d2 long")
    got = {(r.doc_id, r.etiqueta)
           for r in min_label_components(spark, pairs).collect()}
    want = {(1, 1), (2, 1), (3, 1), (4, 1), (5, 1),
            (9, 9), (10, 9), (11, 9), (12, 9),
            (20, 20), (21, 20), (30, 30)}
    assert got == want
    # budget exhaustion raises (diameter-4 path cannot converge in 1
    # round even with the seed + pointer jump)
    with _pytest.raises(RuntimeError, match="did not converge"):
        min_label_components(spark, pairs, max_rounds=1)
