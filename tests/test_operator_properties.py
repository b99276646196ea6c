"""Hypothesis property tests for the scale-critical operator rewrites.

Each property asserts that a distributed/scale-shaped implementation is
EXTENSIONALLY EQUAL to the simple reference implementation over randomized
inputs — the class of bug (boundary rows, ties, empty shards, hot keys)
that a fixed fixture can miss. Examples are small (Spark round-trips per
example), bounded, and fully deterministic under hypothesis' seed
database.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture,
                           HealthCheck.too_slow],
)

RANGE_SEC = 100


# events: (key 0-2, second 0-1000, value) — small span so windows overlap
# shard boundaries often
_events = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 1000),
              st.integers(-50, 50)),
    min_size=1, max_size=60)


@given(rows=_events, bucket_mult=st.integers(1, 5))
@settings(**SETTINGS)
def test_sharded_range_window_equals_plain(spark, rows, bucket_mult):
    """The (key, time-bucket) sharded range window with boundary overlap
    must equal the plain single-key range window for EVERY bucket size
    >= the window range — boundary rows, ties at bucket edges, and
    single-row shards included."""
    from prac_data_pipelines_spark.operators.windows import sharded_range_window

    df = (spark.createDataFrame(
        [(i, k, s, float(v)) for i, (k, s, v) in enumerate(rows)],
        "event_id long, k long, sec long, value double")
        .withColumn("ts", F.timestamp_seconds("sec")))

    plain_w = (Window.partitionBy("k").orderBy(F.col("sec"))
               .rangeBetween(-RANGE_SEC, 0))
    plain = (df.withColumn("n", F.count(F.lit(1)).over(plain_w))
             .withColumn("s", F.sum("value").over(plain_w))
             .select("event_id", "n", "s"))
    sharded = sharded_range_window(
        df, ["k"], "ts", RANGE_SEC,
        {"n": lambda w: F.count(F.lit(1)).over(w),
         "s": lambda w: F.sum("value").over(w)},
        bucket_seconds=RANGE_SEC * bucket_mult,
    ).select("event_id", "n", "s")

    got = sorted(map(tuple, sharded.collect()))
    want = sorted(map(tuple, plain.collect()))
    assert got == want


@given(rows=_events, bucket_mult=st.integers(1, 5),
       with_nulls=st.booleans())
@settings(**SETTINGS)
def test_sharded_trailing_count_avg_equals_plain(spark, rows, bucket_mult,
                                                 with_nulls):
    """The prefix-frame count/avg rewrite (r10: two incremental
    [unbounded, X] frames subtracted instead of one sliding frame) must
    equal the plain sliding RANGE window row-for-row — shard boundaries,
    order-value ties, NULL values, and empty-past frames included.
    Integer-valued doubles keep float sums exact, so equality is exact."""
    from prac_data_pipelines_spark.operators.windows import (
        sharded_trailing_count_avg)

    data = [(i, k, s, None if (with_nulls and v % 3 == 0) else float(v))
            for i, (k, s, v) in enumerate(rows)]
    df = (spark.createDataFrame(
        data, "event_id long, k long, sec long, value double")
        .withColumn("ts", F.timestamp_seconds("sec")))

    plain_w = (Window.partitionBy("k").orderBy(F.col("sec"))
               .rangeBetween(-RANGE_SEC, 0))
    plain = (df.withColumn("n", F.count(F.lit(1)).over(plain_w).cast("long"))
             .withColumn("a", F.avg("value").over(plain_w))
             .select("event_id", "n", "a"))
    rewritten = sharded_trailing_count_avg(
        df, ["k"], "ts", RANGE_SEC, "n", "a", "value",
        bucket_seconds=RANGE_SEC * bucket_mult,
    ).select("event_id", "n", "a")

    got = sorted(map(tuple, rewritten.collect()))
    want = sorted(map(tuple, plain.collect()))
    assert got == want


_large = st.lists(
    st.tuples(st.integers(0, 3), st.integers(-100, 100)),
    min_size=0, max_size=50)
_small = st.lists(st.tuples(st.integers(0, 5), st.text("abc", max_size=2)),
                  min_size=0, max_size=8)


@given(large=_large, small=_small,
       how=st.sampled_from(["inner", "left", "left_semi", "left_anti"]),
       n_salts=st.integers(1, 4))
@settings(**SETTINGS)
def test_salted_join_equals_plain_join(spark, large, small, how, n_salts):
    """Salting the hot side and exploding the dim must be invisible in the
    result for every supported join type — including duplicate small-side
    keys (fan-out) and keys present on only one side."""
    from prac_data_pipelines_spark.operators.skew import salted_join

    ldf = spark.createDataFrame(
        [(k, v) for k, v in large] or [(None, None)], "key int, v int"
    ).filter(F.col("key").isNotNull())
    sdf = spark.createDataFrame(
        [(k, t) for k, t in small] or [(None, None)], "key int, t string"
    ).filter(F.col("key").isNotNull())

    got = salted_join(ldf, sdf, "key", n_salts=n_salts, how=how)
    want = ldf.join(sdf, "key", how)
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, want.collect()))


@given(rows=_events, parts=st.integers(1, 7))
@settings(**SETTINGS)
def test_running_balance_partition_invariant(spark, rows, parts):
    """The running balance must be a pure function of the data, not of the
    physical partitioning — the determinism rule (SURVEY §4.1) that total
    tiebreaker keys exist to guarantee. Ties in (k, sec) are real here
    (random data), so event_id is doing the work."""
    from prac_data_pipelines_spark.operators.windows import running_balance

    df = spark.createDataFrame(
        [(i, k, s, float(v)) for i, (k, s, v) in enumerate(rows)],
        "event_id long, k long, sec long, value double")
    order = [F.col("sec").asc(), F.col("event_id").asc()]

    a = running_balance(df.repartition(parts), ["k"], order, F.col("value"),
                        out_col="bal").select("event_id", "bal")
    b = running_balance(df.coalesce(1), ["k"], order, F.col("value"),
                        out_col="bal").select("event_id", "bal")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


# range join: pairs across two small frames; seconds may be negative
# (bucket floor-division must round toward -inf, not 0)
_left_rows = st.lists(
    st.tuples(st.integers(0, 2), st.integers(-200, 1000)),
    min_size=1, max_size=40)
_right_rows = st.lists(
    st.tuples(st.integers(0, 2), st.integers(-200, 1000)),
    min_size=1, max_size=40)


@given(left=_left_rows, right=_right_rows,
       lower=st.integers(-120, 60), width=st.integers(0, 150))
@settings(**SETTINGS)
def test_bucketed_range_join_equals_naive(spark, left, right, lower, width):
    """The (key, time-bucket) range join with <=2-bucket probe duplication
    must produce EXACTLY the pairs of the naive equi-join + range filter —
    for every window placement (past-only, straddling, future-only),
    negative timestamps, bucket-edge ties, and hot keys included."""
    from prac_data_pipelines_spark.operators.rangejoin import (
        bucketed_range_join,
        naive_range_join,
    )

    upper = lower + width
    ldf = spark.createDataFrame(
        [(i, k, s) for i, (k, s) in enumerate(left)],
        "lid long, k long, lsec long")
    rdf = spark.createDataFrame(
        [(i, k, s) for i, (k, s) in enumerate(right)],
        "rid long, k long, rsec long")

    def pairs(df):
        return sorted((r.lid, r.rid) for r in df.select("lid", "rid").collect())

    got = pairs(bucketed_range_join(ldf, rdf, "k", "lsec", "rsec", lower, upper))
    want = pairs(naive_range_join(ldf, rdf, "k", "lsec", "rsec", lower, upper))
    assert got == want


_texts = st.lists(
    st.text(alphabet="ab c", min_size=0, max_size=300), min_size=1, max_size=8)


@given(texts=_texts)
@settings(**SETTINGS)
def test_doc_chunks_reconstruct_documents(spark, texts):
    """Chunk rows must tile every document: sorted chunks start at stride
    multiples, cover exactly [0, n_words), and only the last is short —
    for arbitrary whitespace-heavy, empty, and single-word texts."""
    from prac_data_pipelines_spark.queries.text import (
        CHUNK_STRIDE,
        CHUNK_WORDS,
        q_doc_chunks,
    )

    rows = [(i, t, "und", "s", len(t)) for i, t in enumerate(texts)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long")

    import os
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix="chunk_prop_")
    try:
        df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
        out = q_doc_chunks(spark, d).collect()
        by_doc = {}
        for r in out:
            by_doc.setdefault(r["doc_id"], []).append(r)
        assert set(by_doc) == set(range(len(texts)))  # every doc chunks
        for doc_id, chunks in by_doc.items():
            chunks.sort(key=lambda r: r["chunk_idx"])
            n_words = len(texts[doc_id].strip().split()) or 1  # '' -> ['']
            assert chunks[0]["desde_palabra"] == 0
            for i, c in enumerate(chunks):
                assert c["chunk_idx"] == i
                assert c["desde_palabra"] == i * CHUNK_STRIDE
                assert c["n_palabras"] == min(
                    CHUNK_WORDS, n_words - i * CHUNK_STRIDE)
            assert (chunks[-1]["desde_palabra"] + chunks[-1]["n_palabras"]
                    == n_words)
    finally:
        shutil.rmtree(d, ignore_errors=True)


_corpus = st.lists(
    st.text(alphabet="abc ", min_size=10, max_size=60), min_size=2, max_size=10)


@given(texts=_corpus, split=st.integers(1, 9))
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
def test_incremental_dedup_sound_and_complete(spark, texts, split, tmp_path_factory):
    """Every drop has a real banded above-threshold match with a state doc
    or a lower-id batch doc (soundness), and every batch doc with such a
    match IS dropped (completeness) — checked against an independent
    Python recomputation of the same signatures/bands/estimate."""
    import shutil
    import tempfile

    from prac_data_pipelines_spark.incremental import (
        DEFAULT_THRESHOLD,
        incremental_dedup,
        init_dedup_state,
    )
    from prac_data_pipelines_spark.queries.text import (
        MINHASH_K,
        N_BANDS,
        minhash_signatures,
    )

    split = min(split, len(texts) - 1)
    rows = [(i, t if t.strip() else "x") for i, t in enumerate(texts)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    state_docs = docs.filter(f"doc_id < {split}")
    batch_docs = docs.filter(f"doc_id >= {split}")

    d = tempfile.mkdtemp(prefix="inc_prop_")
    try:
        init_dedup_state(state_docs, d)
        got = {r["doc_id"]: r["mantener"]
               for r in incremental_dedup(spark, batch_docs, d).collect()}

        sigs = {r["doc_id"]: tuple(r["sigs"])
                for r in minhash_signatures(docs).collect()}

        def bands(s):
            return {(b, s[2 * b], s[2 * b + 1]) for b in range(N_BANDS)}

        def est(a, b):
            same = sum(1 for x, y in zip(sigs[a], sigs[b]) if x == y)
            return round(same / MINHASH_K, 4)

        def banded_match(a, b):
            return bands(sigs[a]) & bands(sigs[b]) and est(a, b) >= DEFAULT_THRESHOLD

        state_ids = [i for i, _ in rows[:split]]
        for doc_id in (i for i, _ in rows[split:]):
            should_drop = (
                any(banded_match(doc_id, s) for s in state_ids)
                or any(banded_match(doc_id, b)
                       for b, _ in rows[split:] if b < doc_id))
            assert got[doc_id] == (not should_drop), (doc_id, texts)
    finally:
        shutil.rmtree(d, ignore_errors=True)


@given(rows=st.lists(st.tuples(st.integers(0, 30),
                               st.integers(0, 10_000)),
                     min_size=1, max_size=60),
       parts=st.integers(1, 7))
@settings(**SETTINGS)
def test_pareto_abc_partition_invariant(spark, rows, parts):
    """The two-level cumsum (range partition + local window + broadcast
    offsets) must produce identical PCT/cum/ABC under ANY input
    partitioning or row order — the single-partition window it replaced
    was trivially order-stable, so the replacement must prove it."""
    from prac_data_pipelines_spark.operators.windows import pareto_abc

    df = (spark.createDataFrame(
        [(k, float(v)) for k, v in rows], "k int, amt double")
        .groupBy("k").agg(F.sum("amt").alias("amt")))

    def run(frame):
        out = pareto_abc(frame, "amt", key_order=[F.col("k").asc()])
        return sorted((r["k"], r["PCT"], r["PCT_ACUMULADO"],
                       r["CLASIFICACION_ABC"]) for r in out.collect())

    base = run(df.coalesce(1))
    assert run(df.repartition(parts)) == base
    assert run(df.orderBy(F.desc("k"))) == base


@given(
    rows=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 50)),
                  min_size=1, max_size=60),
    parts=st.integers(1, 7),
)
@settings(**SETTINGS)
def test_grouped_positions_equal_window_rank(spark, rows, parts):
    """grouped_positions (range partition + local rank + triangular
    broadcast offsets, per group) must equal Window.partitionBy(group)
    row_number/count exactly — including single-row groups, one group
    holding everything (the skew case the rewrite exists for), ties on
    the order key, and any input partitioning."""
    from prac_data_pipelines_spark.operators.sorting import grouped_positions

    df = spark.createDataFrame(
        [(i, g, v) for i, (g, v) in enumerate(rows)],
        "id long, g int, v int").repartition(parts)

    w = Window.partitionBy("g").orderBy(F.desc("v"), F.asc("id"))
    want = sorted(
        (r["id"], r["rn"], r["n"]) for r in df.withColumn(
            "rn", F.row_number().over(w)).withColumn(
            "n", F.count(F.lit(1)).over(Window.partitionBy("g")))
        .collect())
    got = sorted(
        (r["id"], r["pos"], r["n"]) for r in grouped_positions(
            df, ["g"], [F.desc("v"), F.asc("id")],
            pos_col="pos", n_col="n").collect())
    assert got == want


@given(
    rows=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 50),
                            st.integers(1, 30)),
                  min_size=1, max_size=60),
    parts=st.integers(1, 7),
)
@settings(**SETTINGS)
def test_grouped_positions_cumsum_equal_window(spark, rows, parts):
    """The grouped two-level running sum (cum_of/total_col) must equal
    Window.partitionBy(group) sum exactly for integral values — offsets
    re-associate the sum, which is only observable for floats."""
    from prac_data_pipelines_spark.operators.sorting import grouped_positions

    df = spark.createDataFrame(
        [(i, g, v, t) for i, (g, v, t) in enumerate(rows)],
        "id long, g int, v int, t long").repartition(parts)

    w = Window.partitionBy("g").orderBy(F.desc("v"), F.asc("id"))
    want = sorted(
        (r["id"], r["cum"], r["tot"]) for r in df.withColumn(
            "cum", F.sum("t").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("tot", F.sum("t").over(Window.partitionBy("g")))
        .collect())
    got = sorted(
        (r["id"], r["cum"], r["tot"]) for r in grouped_positions(
            df, ["g"], [F.desc("v"), F.asc("id")],
            cum_of=F.col("t"), cum_col="cum", total_col="tot").collect())
    assert got == want


_substr_docs = st.lists(
    st.lists(st.sampled_from(["a", "b"]), min_size=0, max_size=30),
    min_size=1, max_size=10)


@given(docs=_substr_docs)
@settings(**SETTINGS)
def test_substring_coverage_equals_interval_union(spark, docs):
    """The same-length-interval union shortcut (K + sum min(K, gap) over
    sorted starts, one lag window) must equal a brute-force positional
    set union of the repeated K-token windows — including window-less
    short docs, fully-repeated docs, and overlapping flagged spans."""
    from prac_data_pipelines_spark.queries.text import (
        SUBSTR_K,
        doc_substring_coverage,
    )

    rows = [(i, " ".join(toks) if toks else "", "s") for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r["doc_id"]: (r["_n"], r["_cov"])
           for r in doc_substring_coverage(df).collect()}

    # brute force: flag windows whose token text occurs >= 2 times
    # corpus-wide, union their [i, i+K) spans per doc
    toks_by_doc = {i: (t.strip().split() if t.strip() else [""])
                   for i, (_, t, _) in enumerate(rows)}
    counts: dict[tuple, int] = {}
    for toks in toks_by_doc.values():
        for i in range(len(toks) - SUBSTR_K + 1):
            w = tuple(toks[i:i + SUBSTR_K])
            counts[w] = counts.get(w, 0) + 1
    for doc_id, toks in toks_by_doc.items():
        covered = set()
        for i in range(len(toks) - SUBSTR_K + 1):
            if counts[tuple(toks[i:i + SUBSTR_K])] >= 2:
                covered.update(range(i, i + SUBSTR_K))
        assert got[doc_id] == (len(toks), len(covered)), doc_id


@given(docs=_substr_docs)
@settings(**SETTINGS)
def test_dup_spans_equal_brute_force_interval_merge(spark, docs):
    """Chained flagged windows (gap <= K breaks into a new span at > K)
    must produce exactly the maximal intervals of the brute-force union
    of repeated K-token windows — including overlapping flags, exactly
    token-contiguous flags (gap == K), and span-less docs."""
    from prac_data_pipelines_spark.queries.text import SUBSTR_K, dup_spans

    rows = [(i, " ".join(toks) if toks else "", "s") for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = sorted((r["doc_id"], r["desde_palabra"], r["n_palabras"])
                 for r in dup_spans(df).collect())

    # brute force: union the [i, i+K) spans of corpus-repeated windows,
    # then read the maximal runs off the sorted covered-position set
    toks_by_doc = {i: (t.strip().split() if t.strip() else [""])
                   for i, (_, t, _) in enumerate(rows)}
    counts: dict[tuple, int] = {}
    for toks in toks_by_doc.values():
        for i in range(len(toks) - SUBSTR_K + 1):
            w = tuple(toks[i:i + SUBSTR_K])
            counts[w] = counts.get(w, 0) + 1
    want = []
    for doc_id, toks in toks_by_doc.items():
        covered = set()
        for i in range(len(toks) - SUBSTR_K + 1):
            if counts[tuple(toks[i:i + SUBSTR_K])] >= 2:
                covered.update(range(i, i + SUBSTR_K))
        run_start = None
        for p in sorted(covered) + [None]:
            if run_start is None:
                run_start, prev = p, p
            elif p is None or p > prev + 1:
                want.append((doc_id, run_start, prev - run_start + 1))
                run_start, prev = p, p
            else:
                prev = p
    assert got == sorted(want)


@given(docs=_substr_docs)
@settings(**SETTINGS)
def test_strip_dup_spans_equals_brute_force_keep_first(spark, docs):
    """The distributed rewrite (first-occurrence exclusion riding the
    window-hash groupBy, chained flags, per-row higher-order filter) must
    equal a sequential Python reimplementation of the keep-first span
    removal — and by that equality, no token position covered by a
    removal span survives into any rewritten text."""
    import hashlib

    from prac_data_pipelines_spark.queries.text import (
        DUP_SPAN_MIN,
        SUBSTR_K,
        strip_dup_spans,
    )

    rows = [(i, " ".join(toks) if toks else "", "s") for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r["doc_id"]: r["text"] for r in strip_dup_spans(df).collect()}

    def h28(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:7], 16)

    toks_by_doc = {i: (t.strip().split() if t.strip() else [""])
                   for i, (_, t, _) in enumerate(rows)}
    # flag every NON-FIRST occurrence of a corpus-repeated window
    occ: dict[int, list[tuple[int, int]]] = {}
    for d in sorted(toks_by_doc):
        toks = toks_by_doc[d]
        for p in range(len(toks) - SUBSTR_K + 1):
            g = h28(" ".join(toks[p:p + SUBSTR_K]))
            occ.setdefault(g, []).append((d, p))
    flagged: dict[int, set[int]] = {}
    for lst in occ.values():
        if len(lst) >= 2:
            first = min(lst)
            for d, p in lst:
                if (d, p) != first:
                    flagged.setdefault(d, set()).add(p)
    # chain flags (gap <= K merges), remove spans >= DUP_SPAN_MIN
    for d, toks in toks_by_doc.items():
        removed: set[int] = set()
        starts = sorted(flagged.get(d, ()))
        runs: list[tuple[int, int]] = []
        for p in starts:
            if runs and p - runs[-1][1] <= SUBSTR_K:
                runs[-1] = (runs[-1][0], p)
            else:
                runs.append((p, p))
        for lo, hi in runs:
            if hi - lo + SUBSTR_K >= DUP_SPAN_MIN:
                removed.update(range(lo, hi + SUBSTR_K))
        want = " ".join(w for j, w in enumerate(toks) if j not in removed)
        if removed:
            assert got[d] == want, d
        else:
            # untouched docs pass through byte-for-byte
            assert got[d] == rows[d][1], d


_dsir_docs = st.lists(
    st.tuples(st.lists(st.sampled_from(["x", "y", "z"]), min_size=0, max_size=12),
              st.sampled_from(["en", "es", "fr"])),
    min_size=1, max_size=12)


@given(docs=_dsir_docs)
@settings(**SETTINGS)
def test_dsir_weights_equal_python_fold(spark, docs):
    """The distributed DSIR weight (broadcast bucket-count maps + per-doc
    in-order ratio product) must be BIT-equal to a sequential Python
    reimplementation using the same md5-derived feature hash — every
    multiply/divide is a correctly-rounded IEEE op with identical
    association, so == on floats is the right assertion."""
    import hashlib

    from prac_data_pipelines_spark.queries.corpus import (
        DSIR_B,
        DSIR_TARGET_LANG,
        doc_dsir_doc_weights,
    )

    rows = [(i, " ".join(toks) if toks else "", lang, "s")
            for i, (toks, lang) in enumerate(docs)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string")
    got = {r["doc_id"]: r["peso"]
           for r in doc_dsir_doc_weights(df).collect()}

    def h28(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:7], 16)

    toks_by_doc = {i: (t.strip().split() if t.strip() else [""])
                   for i, (_, t, _, _) in enumerate(rows)}
    buckets_by_doc = {
        i: [h28(f"{a} {b}") % DSIR_B for a, b in zip(toks, toks[1:])]
        for i, toks in toks_by_doc.items()}
    cr: dict[int, int] = {}
    ct: dict[int, int] = {}
    for i, bs in buckets_by_doc.items():
        for b in bs:
            cr[b] = cr.get(b, 0) + 1
            if rows[i][2] == DSIR_TARGET_LANG:
                ct[b] = ct.get(b, 0) + 1
    nr, nt = sum(cr.values()), sum(ct.values())
    for doc_id, bs in buckets_by_doc.items():
        peso = 1.0
        for b in bs:
            peso = peso * (float((ct.get(b, 0) + 1) * (nr + DSIR_B))
                           / float((cr.get(b, 0) + 1) * (nt + DSIR_B)))
        assert got[doc_id] == peso, (doc_id, got[doc_id], peso)


_winnow_docs = st.lists(
    st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=20),
    min_size=1, max_size=8)


@given(docs=_winnow_docs)
@settings(**SETTINGS)
def test_winnowing_fingerprints_equal_brute_force(spark, docs):
    """The packed-min winnowing selection (array_min over packed
    hash*2^30 + inverted-pos) must equal a literal implementation of the
    SIGMOD'03 algorithm: per window of FP_W shingle hashes, keep the
    rightmost minimal hash with its position, then dedupe — including
    short docs (single-window fallback) and hash-tie windows."""
    import hashlib

    from prac_data_pipelines_spark.queries.text import (
        FP_W,
        _FP_PACK,
        doc_winnow_fingerprints,
    )

    rows = [(i, " ".join(toks) if toks else "", "s") for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r["doc_id"]: (r["_nw"], sorted(r["fps"]))
           for r in doc_winnow_fingerprints(df).collect()}

    def h28(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:7], 16)

    for doc_id, (_, text, _src) in enumerate(rows):
        toks = text.strip().split() if text.strip() else [""]
        if len(toks) >= 3:
            grams = [" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)]
        else:
            grams = [text.strip()]
        g = [h28(s) for s in grams]
        m = len(g)
        nw = max(m - FP_W + 1, 1)
        sel = set()
        for w in range(nw):
            window = list(enumerate(g))[w:w + FP_W]
            mn = min(h for _, h in window)
            pos = max(j for j, h in window if h == mn)  # rightmost minimal
            sel.add(g[pos] * _FP_PACK + (_FP_PACK - 1 - pos))
        assert got[doc_id] == (nw, sorted(sel)), doc_id


_gopher_tokens = st.sampled_from(
    ["the", "and", "have", "with", "data", "#", "x...", "...", "-",
     "*item", "ab", "xyzzy", "12345", "a#b", "longwordindeed"])
_gopher_docs = st.lists(  # each doc: list of lines, each line: tokens
    st.lists(st.lists(_gopher_tokens, min_size=0, max_size=8),
             min_size=1, max_size=3),
    min_size=1, max_size=8)


@given(docs=_gopher_docs)
@settings(**SETTINGS)
def test_gopher_rules_equal_python_reference(spark, docs):
    """Every Gopher rule verdict (integer cross-multiplied comparisons
    over token/line folds) must match a literal Python reimplementation
    of the Rae et al. A1.1 rules — including empty-text docs (engine
    split yields [''] where Python's split yields []), '#'/ellipsis
    counting, bullet/ellipsis line shapes, and the stopword minimum."""
    import re

    from prac_data_pipelines_spark.queries.text import q_doc_gopher_quality  # noqa: F401  (import parity)
    from prac_data_pipelines_spark.queries.text import (
        _GOPHER_RULES,
        doc_gopher_flags,
    )

    rows = [(i, "\n".join(" ".join(line) for line in lines), str(i))
            for i, lines in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {int(r["source"]): {n: r[f"_r_{n}"] for n in _GOPHER_RULES}
           for r in doc_gopher_flags(df).collect()}

    stops = {"the", "be", "to", "of", "and", "that", "have", "with"}
    for i, (_, text, _src) in enumerate(rows):
        # mirror ENGINE tokenization: trim() strips spaces only (not \n),
        # and regex split keeps leading/trailing empty fields
        toks = re.split(r"\s+", text.strip(" "))
        n = len(toks)
        sumlen = sum(len(w) for w in toks)
        n_hash = text.count("#")
        n_ell = (len(text) - len(text.replace("...", ""))) // 3
        alfa = sum(1 for w in toks if re.search("[A-Za-z]", w))
        nstop = len(set(toks) & stops)
        lines = text.split("\n")
        nl = len(lines)
        bul = sum(1 for l in lines
                  if l.strip().startswith(("-", "*", "•")))
        fin = sum(1 for l in lines if l.strip().endswith("..."))
        want = {
            "palabras": int(50 <= n <= 100000),
            "long_media": int(3 * n <= sumlen <= 10 * n),
            "simbolos": int(10 * (n_hash + n_ell) < n),
            "alfabetico": int(5 * alfa >= 4 * n),
            "stopwords": int(nstop >= 2),
            "vinetas": int(10 * bul < 9 * nl),
            "elipsis": int(10 * fin < 3 * nl),
        }
        assert got[i] == want, (i, text, got[i], want)


_bpe_docs = st.lists(
    st.lists(st.sampled_from(["ab", "aba", "abab", "ba", "bb", "a", "abc",
                              "cab", "aabb"]),
             min_size=1, max_size=10),
    min_size=1, max_size=6)


@given(docs=_bpe_docs)
@settings(**SETTINGS)
def test_bpe_encode_curve_equals_python_reference(spark, docs):
    """The distributed train-rank-encode pipeline (wordcount → pair
    counts → (freq desc, pair asc) ranked merges → per-word in-order
    merge folds along the curve) must match a sequential Python BPE:
    same merge ranking, same leftmost non-overlapping pass semantics
    ("aaa" + (a,a) → [aa, a]), same totals and token-vocab sizes."""
    from collections import Counter

    from prac_data_pipelines_spark.queries.corpus import (
        BPE_CURVE,
        BPE_PAIRS,
        bpe_encode_curve_frame,
    )

    rows = [(i, " ".join(toks), "s") for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r["fusiones"]: (r["total_palabras"], r["total_tokens"],
                           r["vocab_tokens"])
           for r in bpe_encode_curve_frame(df).collect()}

    vocab = Counter(w for _, t, _ in rows for w in t.split())
    pairs = Counter()
    for w, f in vocab.items():
        for a, b in zip(w, w[1:]):
            pairs[(a, b)] += f
    merges = sorted(pairs, key=lambda p: (-pairs[p], p))[:BPE_PAIRS]

    def encode(word, m):
        toks = list(word)
        for a, b in merges[:m]:
            out = []
            for t in toks:
                if out and out[-1] == a and t == b:
                    out[-1] = a + b
                else:
                    out.append(t)
            toks = out
        return toks

    for m in BPE_CURVE:
        total_w = sum(vocab.values())
        enc = {w: encode(w, m) for w in vocab}
        total_t = sum(f * len(enc[w]) for w, f in vocab.items())
        vocab_t = len({t for ts in enc.values() for t in ts})
        assert got[m] == (total_w, total_t, vocab_t), (m, got[m])


_aniso_rows = st.lists(
    st.lists(st.integers(-4, 4), min_size=64, max_size=64),
    min_size=2, max_size=10)


@given(rows=_aniso_rows)
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
def test_anisotropy_audit_matches_python_power_iteration(spark, rows):
    """The distributed spectral audit must match a sequential Python
    run of the SAME algorithm (r6-rounded means/covariance, 4 unrolled
    power iterations from the exact unit vector) to within one rounding
    quantum, and its Rayleigh estimate can never exceed numpy's true
    top eigenvalue of the same rounded covariance."""
    import numpy as np

    from prac_data_pipelines_spark.queries.vector import (
        EMB_D,
        POWER_ITERS,
        emb_anisotropy_frame,
    )

    df = spark.createDataFrame(
        [(i, [float(v) for v in r]) for i, r in enumerate(rows)],
        "vec_id long, embedding array<float>")
    got = emb_anisotropy_frame(df).collect()[0]

    def r6(x):
        import math
        return math.floor(x * 1_000_000 + 0.5) / 1_000_000

    a = np.array(rows, dtype=np.float64)
    n = len(rows)
    mu = np.array([r6(float(a[:, d].sum()) / n) for d in range(EMB_D)])
    c = a - mu
    cov = np.empty((EMB_D, EMB_D))
    for i in range(EMB_D):
        for j in range(EMB_D):
            cov[i, j] = r6(float(c[:, i] @ c[:, j]) / (n - 1))
    x = np.full(EMB_D, 0.125)
    for _ in range(POWER_ITERS):
        y = cov @ x
        nr = float(np.sqrt((y * y).sum()))
        x = y if nr == 0.0 else y / nr
    l1 = float(x @ (cov @ x))
    tr = float(np.trace(cov))

    assert got["n_vectores"] == n
    assert abs(got["lambda1"] - r6(l1)) <= 2e-6
    assert abs(got["traza"] - r6(tr)) <= 2e-6
    lmax = float(np.linalg.eigvalsh(cov).max())
    assert got["lambda1"] <= lmax + 1e-4
    if tr > 0:
        assert 0.0 <= got["anisotropia"] <= 1.0 + 1e-9


_ntile_rows = st.lists(
    st.tuples(st.integers(0, 3), st.integers(-50, 50)),
    min_size=1, max_size=40)


@given(rows=_ntile_rows)
@settings(**SETTINGS)
def test_ccnet_bucket_formula_equals_ntile(spark, rows):
    """The integer bucket formula ((rank-1)*3) div n used by
    doc_ccnet_buckets must equal SQL NTILE(3) for every group size —
    including groups smaller than 3 and remainders in either spot."""
    df = spark.createDataFrame(
        [(i, g, v) for i, (g, v) in enumerate(rows)],
        "id long, g long, v long")
    w = Window.partitionBy("g").orderBy(F.desc("v"), F.asc("id"))
    got = (df.withColumn("_rn", F.row_number().over(w))
           .withColumn("_n", F.count(F.lit(1)).over(Window.partitionBy("g")))
           .withColumn("b", F.expr("((_rn - 1) * 3) div _n"))
           .withColumn("nt", F.ntile(3).over(w) - 1)
           .collect())
    for r in got:
        assert r["b"] == r["nt"], (r["g"], r["_rn"], r["_n"])


@given(docs=_bpe_docs)
@settings(**SETTINGS)
def test_bpe_train_steps_equals_python_trainer(spark, docs):
    """The distributed iterative BPE trainer (argmax + merge + RE-COUNT
    per step) must walk the exact merge trajectory of a sequential
    Python Sennrich-style trainer: same pair chosen each step (freq
    desc, pair asc), same frequencies, graceful stop when the corpus
    runs out of distinct pairs."""
    from collections import Counter

    from prac_data_pipelines_spark.queries.corpus import (
        BPE_STEPS,
        bpe_train_frame,
    )

    rows = [(i, " ".join(toks), "s") for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = [(r["paso"], r["s1"], r["s2"], r["frecuencia"])
           for r in bpe_train_frame(df).collect()]

    vocab = Counter(w for _, t, _ in rows for w in t.split())
    state = {w: list(w) for w in vocab}
    want = []
    for k in range(1, BPE_STEPS + 1):
        pairs = Counter()
        for w, f in vocab.items():
            toks = state[w]
            for a, b in zip(toks, toks[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        a, b = min(pairs, key=lambda p: (-pairs[p], p))
        want.append((k, a, b, pairs[(a, b)]))
        for w in state:
            toks, out = state[w], []
            for t in toks:
                if out and out[-1] == a and t == b:
                    out[-1] = a + b
                else:
                    out.append(t)
            state[w] = out
    assert got == want


_hh_users = st.lists(st.integers(0, 30), min_size=1, max_size=200)


@given(users=_hh_users)
@settings(**SETTINGS)
def test_count_min_audit_equals_python_sketch(spark, users):
    """The distributed Count-Min audit must match a sequential Python
    sketch with the same md5-derived hashes exactly (all-integer), and
    the one-sided guarantee estimado >= exacto must hold for every
    audited heavy hitter."""
    import hashlib
    from collections import Counter

    from prac_data_pipelines_spark.queries.events import (
        CM_D,
        CM_TOP,
        CM_W,
        q_events_heavy_hitters,
    )

    import os
    import tempfile

    d = tempfile.mkdtemp(prefix="cm_prop_")
    df = spark.createDataFrame(
        [(i, u, "t", float(0), "{}", None) for i, u in enumerate(users)],
        "event_id long, user_id long, event_type string, value double, "
        "props string, ts timestamp")
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    got = [(r["user_id"], r["exacto"], r["estimado"], r["sobreestima"])
           for r in q_events_heavy_hitters(spark, d).collect()]

    def h(dd, u):
        return int(hashlib.md5(f"{dd}:{u}".encode()).hexdigest()[:7],
                   16) % CM_W

    counts = Counter(users)
    sketch = Counter()
    for u in users:
        for dd in range(CM_D):
            sketch[(dd, h(dd, u))] += 1
    top = sorted(counts, key=lambda u: (-counts[u], u))[:CM_TOP]
    want = []
    for u in top:
        est = min(sketch[(dd, h(dd, u))] for dd in range(CM_D))
        want.append((u, counts[u], est, est - counts[u]))
    assert got == want
    for _, exacto, estimado, sobre in got:
        assert estimado >= exacto and sobre >= 0


_pq_rows = st.lists(
    st.lists(st.integers(-4, 4), min_size=64, max_size=64),
    min_size=5, max_size=12)


@given(rows=_pq_rows)
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
def test_pq_audit_matches_python_lloyd(spark, rows):
    """The distributed PQ trainer must match a sequential Python run of
    the same algorithm (init = first PQ_K vectors' slices, L2 argmin
    ties->lowest code, r6-rounded recentering, PQ_ITERS iterations):
    identical counts and utilization, distortion within a rounding
    quantum."""
    import math
    import os
    import tempfile

    from prac_data_pipelines_spark.queries.vector import (
        PQ_ITERS,
        PQ_K,
        PQ_M,
        PQ_SD,
        q_emb_pq_audit,
    )

    d = tempfile.mkdtemp(prefix="pq_prop_")
    df = spark.createDataFrame(
        [(i, [float(v) for v in r], 0) for i, r in enumerate(rows)],
        "vec_id long, embedding array<float>, label int")
    df.write.mode("overwrite").parquet(os.path.join(d, "embeddings.parquet"))
    got = {r["sub"]: (r["vectores"], r["codigos"], r["error_medio"],
                      r["error_max"])
           for r in q_emb_pq_audit(spark, d).collect()}

    def r6(x):
        return math.floor(x * 1_000_000 + 0.5) / 1_000_000

    for sub in range(PQ_M):
        svs = [r[sub * PQ_SD:(sub + 1) * PQ_SD] for r in rows]
        cb = {cid: [float(v) for v in svs[cid]] for cid in range(PQ_K)}

        def assign(cbk):
            out = []
            for v in svs:
                best = min(
                    (sum((a - b) * (a - b) for a, b in zip(v, cbk[c])), c)
                    for c in sorted(cbk))
                out.append(best)
            return out

        for _ in range(PQ_ITERS):
            a = assign(cb)
            newcb = {}
            for c in sorted(cb):
                members = [v for v, (_, cc) in zip(svs, a) if cc == c]
                # mirror ENGINE semantics: an empty cluster disappears
                # from the recentered codebook (groupBy sees no rows)
                if members:
                    newcb[c] = [r6(sum(col) / len(members))
                                for col in zip(*members)]
            cb = newcb
        fin = assign(cb)
        want_codes = len({c for _, c in fin})
        want_mean = r6(sum(dd for dd, _ in fin) / len(fin))
        want_max = r6(max(dd for dd, _ in fin))
        g = got[sub]
        assert g[0] == len(rows)
        assert g[1] == want_codes, (sub, g, want_codes)
        assert abs(g[2] - want_mean) <= 5e-6
        assert abs(g[3] - want_max) <= 5e-6


# --- doc_bloom_decontaminate: distributed Bloom audit == pure-Python ----

_bloom_docs = st.lists(
    st.lists(st.sampled_from(list("abcdef")), min_size=1, max_size=8),
    min_size=1, max_size=12)


@given(docs=_bloom_docs)
@settings(**SETTINGS)
def test_bloom_decontaminate_equals_python_reference(spark, docs):
    """The broadcast-bitmap Bloom probe (bits from the benchmark grams,
    ALL-K membership per corpus gram, doc/gram rollups) must equal a
    sequential Python Bloom over the same md5-derived hash family —
    including the no-false-negative guarantee (exact ⇒ bloom)."""
    import hashlib

    from prac_data_pipelines_spark.queries.corpus import (
        BENCH_MOD,
        BLOOM_K,
        BLOOM_M,
        DECON_K,
        _BLOOM_AB,
        _BLOOM_P,
        bloom_decontaminate_frame,
    )

    # doc_id 0 is always a bench doc (0 % BENCH_MOD == 0); give even ids
    # a second source so per-source grouping is exercised
    rows = [(i, " ".join(ws), "s" + str(i % 2)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r["source"]: r.asDict() for r in
           bloom_decontaminate_frame(df).collect()}

    def grams_of(text):
        ws = text.strip(" ").split(" ")
        if len(ws) >= DECON_K:
            return [" ".join(ws[i:i + DECON_K])
                    for i in range(len(ws) - DECON_K + 1)]
        return [text.strip(" ")]

    def positions(g):
        base = int(hashlib.md5(g.encode()).hexdigest()[:7], 16)
        return [(base * a + b) % _BLOOM_P % BLOOM_M for a, b in _BLOOM_AB]

    bench = {g for i, t, _ in rows if i % BENCH_MOD == 0
             for g in grams_of(t)}
    bits = {p for g in bench for p in positions(g)}
    corpus = [(i, t, s) for i, t, s in rows if i % BENCH_MOD != 0]
    want: dict[str, dict[str, int]] = {}
    gram_seen: dict[str, set] = {}
    for i, t, s in corpus:
        gs = grams_of(t)
        bl = {g for g in gs if all(p in bits for p in positions(g))}
        ex = {g for g in gs if g in bench}
        assert ex <= bl  # Bloom has no false negatives
        w = want.setdefault(s, {"docs_total": 0, "docs_bloom": 0,
                                "docs_exactos": 0})
        w["docs_total"] += 1
        w["docs_bloom"] += int(bool(bl))
        w["docs_exactos"] += int(bool(ex))
        gram_seen.setdefault(s, set()).update(gs)
    for s, w in want.items():
        gs = gram_seen[s]
        w["grams_probados"] = len(gs)
        w["grams_bloom"] = sum(
            1 for g in gs if all(p in bits for p in positions(g)))
        w["grams_exactos"] = sum(1 for g in gs if g in bench)

    assert set(got) == set(want)
    for s, w in want.items():
        for k, v in w.items():
            assert got[s][k] == v, (s, k, got[s], w)
        assert got[s]["docs_fp"] == w["docs_bloom"] - w["docs_exactos"]
        assert got[s]["grams_fp"] == w["grams_bloom"] - w["grams_exactos"]


# --- bpe_fertility: per-language fold == pure-Python BPE ----------------

_fert_docs = st.lists(
    st.tuples(
        st.sampled_from(["en", "zh"]),
        st.lists(st.sampled_from(["ab", "aba", "abab", "ba", "bb", "a",
                                  "abc", "cab", "aabb"]),
                 min_size=1, max_size=8)),
    min_size=1, max_size=6)


@given(docs=_fert_docs)
@settings(**SETTINGS)
def test_bpe_fertility_equals_python_reference(spark, docs):
    """Globally-trained merges applied per-language must match a
    sequential Python BPE: same global ranking, same fold semantics,
    per-lang token/char totals and the r4-rounded fertility ratios."""
    from collections import Counter

    from prac_data_pipelines_spark.queries.corpus import (
        BPE_PAIRS,
        bpe_fertility_frame,
    )

    rows = [(i, " ".join(ws), "s", lang)
            for i, (lang, ws) in enumerate(docs)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, source string, lang string")
    got = {r["lang"]: r.asDict() for r in bpe_fertility_frame(df).collect()}

    lang_vocab: Counter = Counter()
    for _, t, _, lang in rows:
        for w in t.split():
            lang_vocab[(lang, w)] += 1
    vocab: Counter = Counter()
    for (_, w), f in lang_vocab.items():
        vocab[w] += f
    pairs: Counter = Counter()
    for w, f in vocab.items():
        for a, b in zip(w, w[1:]):
            pairs[(a, b)] += f
    merges = sorted(pairs, key=lambda p: (-pairs[p], p))[:BPE_PAIRS]

    def encode(word):
        toks = list(word)
        for a, b in merges:
            out: list[str] = []
            for t in toks:
                if out and out[-1] == a and t == b:
                    out[-1] = a + b
                else:
                    out.append(t)
            toks = out
        return toks

    def rr(x):
        import math
        return math.floor(x * 10000 + 0.5) / 10000

    langs = {lang for (lang, _) in lang_vocab}
    assert set(got) == langs
    for lang in langs:
        vs = [(w, f) for (lg, w), f in lang_vocab.items() if lg == lang]
        total_w = sum(f for _, f in vs)
        total_t = sum(f * len(encode(w)) for w, f in vs)
        total_c = sum(f * len(w) for w, f in vs)
        g = got[lang]
        assert g["vocab_palabras"] == len(vs)
        assert g["total_palabras"] == total_w
        assert g["total_tokens"] == total_t
        assert g["total_chars"] == total_c
        assert g["tokens_por_palabra"] == rr(total_t / total_w)
        assert g["chars_por_token"] == rr(total_c / total_t)


# --- doc_length_buckets: two-level batch ranking == pure Python ---------

_bucket_docs = st.lists(
    st.tuples(st.sampled_from(["s0", "s1"]),
              st.integers(min_value=0, max_value=40)),
    min_size=1, max_size=60)


@given(docs=_bucket_docs)
@settings(**SETTINGS)
def test_doc_length_buckets_equals_python_reference(spark, docs):
    """The grouped_positions-ranked batching (arrival and length-sorted)
    must pay exactly the padding a sequential loader pays: per batch of
    BATCH_DOCS, (rows · max_len - sum_len), summed per source — for both
    policies, including ragged final batches and duplicate lengths."""
    from prac_data_pipelines_spark.queries.corpus import (
        BATCH_DOCS,
        doc_length_buckets_frame,
    )

    rows = [(i, " ".join(["w"] * n) if n else "", src)
            for i, (src, n) in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r["source"]: r.asDict()
           for r in doc_length_buckets_frame(df).collect()}

    def toks(text):
        # engine semantics: split('\s+') on space-trimmed text keeps one
        # empty field for the empty string -> size 1
        return len(text.strip(" ").split(" ")) if text else 1

    def waste(lens):
        total = 0
        for i in range(0, len(lens), BATCH_DOCS):
            b = lens[i:i + BATCH_DOCS]
            total += len(b) * max(b) - sum(b)
        return total

    by_src: dict[str, list[tuple[int, int]]] = {}
    for i, t, src in rows:
        by_src.setdefault(src, []).append((i, toks(t)))
    assert set(got) == set(by_src)
    for src, pairs in by_src.items():
        arrival = [n for _, n in sorted(pairs)]
        ordered = [n for n, _ in sorted((n, i) for i, n in pairs)]
        g = got[src]
        assert g["n_docs"] == len(pairs)
        assert g["tokens"] == sum(n for _, n in pairs)
        assert g["relleno_llegada"] == waste(arrival), (src, arrival)
        assert g["relleno_ordenado"] == waste(ordered), (src, ordered)


# --- corpus_snapshot_diff: full-outer diff == pure Python ---------------

_diff_docs = st.lists(
    st.tuples(st.integers(min_value=0, max_value=120),
              st.sampled_from(["s0", "s1"]),
              st.text(alphabet="ab ", min_size=1, max_size=8)),
    min_size=1, max_size=25, unique_by=lambda t: t[0])


@given(docs=_diff_docs)
@settings(**SETTINGS)
def test_corpus_snapshot_diff_equals_python_reference(spark, docs):
    """The slim-row full-outer diff must classify every id exactly like a
    sequential differ — including ids that are simultaneously removed
    (%13) and re-ingested (%11), and revision collisions where the
    ' rev' suffix happens to leave the hash-compared text unchanged."""
    from prac_data_pipelines_spark.queries.corpus import (
        q_corpus_snapshot_diff,
    )

    df = spark.createDataFrame(docs, "doc_id long, source string, text string")
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
        got = {r["source"]: r.asDict()
               for r in q_corpus_snapshot_diff(spark, d).collect()}

    a = {i: (s, t) for i, s, t in docs}
    b = {}
    for i, (s, t) in a.items():
        if i % 13 != 0:
            b[i] = (s, t + " rev" if i % 7 == 0 else t)
        if i % 11 == 0:
            b[i + 5000000] = (s, t + " nuevo")
    want: dict[str, dict[str, int]] = {}
    for i in set(a) | set(b):
        src = (a.get(i) or b.get(i))[0]
        w = want.setdefault(src, {"agregados": 0, "eliminados": 0,
                                  "modificados": 0, "sin_cambio": 0,
                                  "delta_chars": 0})
        la = len(a[i][1]) if i in a else 0
        lb = len(b[i][1]) if i in b else 0
        w["delta_chars"] += lb - la
        if i not in a:
            w["agregados"] += 1
        elif i not in b:
            w["eliminados"] += 1
        elif a[i][1] != b[i][1]:
            w["modificados"] += 1
        else:
            w["sin_cambio"] += 1
    assert set(got) == set(want)
    for s, w in want.items():
        for k, v in w.items():
            assert got[s][k] == v, (s, k, got[s], w)


# --- doc_signal_corr: one-pass moment sums == numpy corrcoef ------------

_corr_docs = st.lists(
    st.lists(st.sampled_from(["the", "a", "of", "xx", "yy", "zz", "ww"]),
             min_size=1, max_size=20),
    min_size=3, max_size=15)


@given(docs=_corr_docs)
@settings(**SETTINGS)
def test_doc_signal_corr_equals_numpy(spark, docs):
    """The single-aggregate moment-sum Pearson must match numpy's
    corrcoef over the identically-quantized signals (r4 per row, r6 on
    the result) — including zero-variance pairs nulling out."""
    import math
    import tempfile

    import numpy as np

    from prac_data_pipelines_spark.queries.text import (
        _CORR_SIGNALS,
        q_doc_signal_corr,
    )

    stop = {"the", "a", "of", "and", "is", "el", "la", "de", "los", "un"}
    rows = [(i, " ".join(ws), "s", "en") for i, ws in enumerate(docs)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, source string, lang string")
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
        got = {(r["senal_a"], r["senal_b"]): r["pearson_r"]
               for r in q_doc_signal_corr(spark, d).collect()}

    def r4q(x):
        return math.floor(x * 10000 + 0.5) / 10000

    sig = {k: [] for k in _CORR_SIGNALS}
    for _, text, _, _ in rows:
        ws = text.strip(" ").split(" ")
        n, u = len(ws), len(set(ws))
        s = sum(1 for w in ws if w in stop)
        c = len(text)
        sh = ([" ".join(ws[i:i + 3]) for i in range(n - 2)]
              if n >= 3 else [text.strip(" ")])
        sig["calidad"].append(r4q(min(c / 400, 1.0) * 0.4 + (u / n) * 0.4
                                  + (1 - abs(s / n - 0.2)) * 0.2))
        sig["toks"].append(r4q(float(n)))
        sig["rep3"].append(r4q(1 - len(set(sh)) / len(sh)))
        sig["stop"].append(r4q(s / n))

    for i, a in enumerate(_CORR_SIGNALS):
        for b in _CORR_SIGNALS[i + 1:]:
            xa, xb = np.array(sig[a]), np.array(sig[b])
            if xa.std() == 0 or xb.std() == 0:
                assert got[(a, b)] is None, (a, b)
            else:
                want = float(np.corrcoef(xa, xb)[0, 1])
                assert got[(a, b)] is not None, (a, b)
                assert abs(got[(a, b)] - want) <= 2e-6, (a, b, got[(a, b)],
                                                         want)


# --- doc_mixture_sample: hash-threshold mixture == pure Python ----------

_mix_docs = st.lists(
    st.tuples(st.integers(min_value=0, max_value=10_000),
              st.sampled_from(["s0", "s1", "s2"]),
              st.integers(min_value=1, max_value=900)),
    min_size=2, max_size=30, unique_by=lambda t: t[0])


@given(docs=_mix_docs)
@settings(**SETTINGS)
def test_doc_mixture_sample_equals_python_reference(spark, docs):
    """The broadcast-rate + hash-threshold sampler must keep exactly the
    docs a sequential sampler keeps: same sqrt-dampened rates (capped at
    1), same md5-keyed threshold, same per-source rollup — a pure
    function of the corpus, no RNG."""
    import hashlib
    import math
    import tempfile

    from prac_data_pipelines_spark.queries.corpus import (
        MIX_BUDGET,
        q_doc_mixture_sample,
    )

    rows = [(i, "t", s, n) for i, s, n in docs]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, source string, n_chars long")
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
        got = {r["source"]: r.asDict()
               for r in q_doc_mixture_sample(spark, d).collect()}

    chars = {}
    for i, _, s, n in rows:
        chars[s] = chars.get(s, 0) + n
    tchars = sum(chars.values())
    tsqrt = sum(math.sqrt(c) for c in chars.values())
    rate = {s: min(1.0, math.sqrt(c) / tsqrt * MIX_BUDGET * tchars / c)
            for s, c in chars.items()}

    def key(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:7],
                   16) % 1000000

    want = {}
    for i, _, s, n in rows:
        w = want.setdefault(s, {"docs_total": 0, "docs_muestra": 0,
                                "chars_total": 0, "chars_muestra": 0})
        w["docs_total"] += 1
        w["chars_total"] += n
        if key(i) < math.floor(rate[s] * 1000000):
            w["docs_muestra"] += 1
            w["chars_muestra"] += n
    assert set(got) == set(want)
    for s, w in want.items():
        for k, v in w.items():
            assert got[s][k] == v, (s, k, got[s], w)
        assert abs(got[s]["tasa_objetivo"]
                   - math.floor(rate[s] * 1e6 + 0.5) / 1e6) <= 1e-6


# --- global_running_max: two-level prefix max == plain global window ----

_runmax_rows = st.lists(
    st.tuples(st.integers(0, 50), st.integers(-100, 100)),
    min_size=1, max_size=60)


@given(rows=_runmax_rows, parts=st.integers(1, 5))
@settings(**SETTINGS)
def test_global_running_max_equals_plain_window(spark, rows, parts):
    """The range-partition + local-window + triangular-broadcast prefix
    max must equal the single-partition global running max for every
    input partitioning — duplicate order keys, negative values, and
    1-row inputs included (ties broken by the unique id key)."""
    from prac_data_pipelines_spark.operators.sorting import global_running_max

    df = (spark.createDataFrame(
        [(i, a, v) for i, (a, v) in enumerate(rows)],
        "id long, a long, v long")
        .repartition(parts))

    keys = [F.col("a").asc(), F.col("id").asc()]
    got = {r["id"]: r["rm"]
           for r in global_running_max(df, keys, "v", out_col="rm")
           .collect()}

    want = {}
    cur = None
    for i, (a, v) in sorted(enumerate(rows), key=lambda t: (t[1][0], t[0])):
        cur = v if cur is None else max(cur, v)
        want[i] = cur
    assert got == want


# --- doc_c4_filters: injected-line rule battery == pure Python ----------

_c4_docs = st.lists(
    st.tuples(st.integers(0, 10_000),
              st.lists(st.sampled_from(["aa", "bb", "cc"]),
                       min_size=1, max_size=40)),
    min_size=1, max_size=25, unique_by=lambda t: t[0])


@given(docs=_c4_docs)
@settings(**SETTINGS)
def test_doc_c4_filters_equals_python_reference(spark, docs):
    """The closed-form C4 battery (pseudo-lines, punctuation residue,
    blocklist residues) must match a sequential Python evaluation of the
    same rules — line-boundary word counts (last short line) included."""
    import math
    import os
    import tempfile

    from prac_data_pipelines_spark.queries.corpus import (
        C4_BRACE_MOD,
        C4_LINE_W,
        C4_LOREM_MOD,
        C4_MIN_LINE_WORDS,
        C4_MIN_LINES,
        q_doc_c4_filters,
    )

    d = tempfile.mkdtemp(prefix="c4_prop_")
    rows = [(i, " ".join(ws), "s") for i, ws in docs]
    spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    got = q_doc_c4_filters(spark, d).collect()[0].asDict()

    tot = cons = pocas = bloq = ltot = lcons = 0
    for i, ws in docs:
        nw = len(ws)
        nl = (nw + C4_LINE_W - 1) // C4_LINE_W
        kl = sum(1 for j in range(nl)
                 if (i + j) % 3 != 0
                 and min(C4_LINE_W, nw - j * C4_LINE_W)
                 >= C4_MIN_LINE_WORDS)
        bl = int(i % C4_LOREM_MOD == 0 or i % C4_BRACE_MOD == 0)
        tot += 1
        cons += int(kl >= C4_MIN_LINES and bl == 0)
        pocas += int(kl < C4_MIN_LINES)
        bloq += bl
        ltot += nl
        lcons += kl
    assert got["docs_total"] == tot
    assert got["docs_conservados"] == cons
    assert got["docs_pocas_lineas"] == pocas
    assert got["docs_bloqueados"] == bloq
    assert got["lineas_total"] == ltot
    assert got["lineas_conservadas"] == lcons
    assert got["tasa_lineas"] == math.floor(lcons / ltot * 1e6 + 0.5) / 1e6


# --- doc_readability: vowel-run syllables == pure Python ----------------

_read_docs = st.lists(
    st.tuples(st.integers(0, 10_000),
              st.lists(st.sampled_from(
                  ["aa", "bcd", "queue", "rhythm", "xyz", "aeiouy",
                   "banana", "strength", "ya"]),
                  min_size=1, max_size=30)),
    min_size=1, max_size=20, unique_by=lambda t: t[0])


@given(docs=_read_docs)
@settings(**SETTINGS)
def test_doc_readability_equals_python_reference(spark, docs):
    """The aggregate-ratio Flesch must match a Python evaluation of the
    identical vowel-group heuristic (floor 1 syllable; vowel-less words
    count as monosyllables) and the same single-division score."""
    import math
    import os
    import re
    import tempfile

    from prac_data_pipelines_spark.queries.corpus import (
        C4_LINE_W,
        q_doc_readability,
    )

    d = tempfile.mkdtemp(prefix="read_prop_")
    rows = [(i, " ".join(ws), "s") for i, ws in docs]
    spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    got = q_doc_readability(spark, d).collect()[0].asDict()

    def syl(w):
        return max(1, sum(1 for s in re.split("[^aeiouy]+", w) if s))

    ndocs = len(docs)
    pal = sum(len(ws) for _, ws in docs)
    sil = sum(syl(w) for _, ws in docs for w in ws)
    ora = sum(max(1, len(ws) // C4_LINE_W) for _, ws in docs)
    mono = sum(1 for _, ws in docs for w in ws if syl(w) == 1)

    def q(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    assert got["docs"] == ndocs
    assert got["palabras"] == pal
    assert got["silabas"] == sil
    assert got["oraciones"] == ora
    assert got["monosilabas"] == mono
    assert got["silabas_por_palabra"] == q(sil / pal)
    assert got["palabras_por_oracion"] == q(pal / ora)
    assert got["tasa_monosilabas"] == q(mono / pal)
    assert abs(got["flesch"]
               - q(206.835 - 1.015 * (pal / ora) - 84.6 * (sil / pal))
               ) <= 2e-6


# --- doc_hash_classifier: hashed-bigram linear gate == pure Python ------

_clf_docs = st.lists(
    st.tuples(st.integers(0, 10_000),
              st.lists(st.sampled_from(
                  ["the", "of", "data", "spark", "xx", "yy"]),
                  min_size=1, max_size=25)),
    min_size=1, max_size=20, unique_by=lambda t: t[0])


@given(docs=_clf_docs)
@settings(**SETTINGS)
def test_doc_hash_classifier_equals_python_reference(spark, docs):
    """The arithmetic-weight bigram scorer must match a sequential
    Python scorer with the same md5-derived integer weights — 1-word
    documents (zero bigrams) scoring exactly 0 included."""
    import hashlib
    import math
    import os
    import tempfile

    from prac_data_pipelines_spark.queries.corpus import (
        q_doc_hash_classifier,
    )

    d = tempfile.mkdtemp(prefix="clf_prop_")
    rows = [(i, " ".join(ws), "s") for i, ws in docs]
    spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    got = q_doc_hash_classifier(spark, d).collect()[0].asDict()

    def w(a, b):
        return int(hashlib.md5(f"{a} {b}".encode()).hexdigest()[:7],
                   16) % 2001 - 1000

    scores, sis, gis = [], [], []
    for _, ws in docs:
        gi = max(0, len(ws) - 1)
        si = sum(w(ws[j], ws[j + 1]) for j in range(len(ws) - 1))
        gis.append(gi)
        sis.append(si)
        scores.append(0.0 if gi == 0 else si / (1000.0 * gi))

    def q(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    gsum = sum(gis)
    assert got["docs_total"] == len(docs)
    assert got["docs_conservados"] == sum(1 for s in sis if s > 0)
    assert got["puntaje_medio"] == q(
        0.0 if gsum == 0 else sum(sis) / (1000.0 * gsum))
    assert got["puntaje_max"] == q(max(scores))
    assert got["puntaje_min"] == q(min(scores))


# --- corpus_compaction_audit: greedy byte bins == pure Python -----------

_compact_docs = st.lists(
    st.tuples(st.integers(0, 10_000),
              st.sampled_from(["s0", "s1"]),
              st.text(alphabet="ab é", min_size=0, max_size=400)),
    min_size=1, max_size=30, unique_by=lambda t: t[0])


@given(docs=_compact_docs)
@settings(**SETTINGS)
def test_corpus_compaction_audit_equals_python_reference(spark, docs):
    """The two-level-cumsum bin planner must match a sequential greedy
    binning over the same synthesized file manifest — UTF-8 octet
    lengths (multi-byte chars), empty files, and single-file sources."""
    import math
    import os
    import tempfile
    from collections import defaultdict

    from prac_data_pipelines_spark.queries.corpus import (
        COMPACT_FILES_MOD,
        COMPACT_TARGET,
        q_corpus_compaction_audit,
    )

    d = tempfile.mkdtemp(prefix="compact_prop_")
    rows = [(i, t, s) for i, s, t in docs]
    spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    got = {r["source"]: r.asDict()
           for r in q_corpus_compaction_audit(spark, d).collect()}

    files = defaultdict(int)
    for i, s, t in docs:
        files[(s, i % COMPACT_FILES_MOD)] += len(t.encode("utf-8"))
    per_src = defaultdict(list)
    for (s, fid), b in files.items():
        per_src[s].append((fid, b))

    def q(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    for s, fl in per_src.items():
        fl.sort()
        bins = defaultdict(lambda: [0, 0])
        cum = 0
        for _, b in fl:
            bins[cum // COMPACT_TARGET][0] += 1
            bins[cum // COMPACT_TARGET][1] += b
            cum += b
        g = got[s]
        assert g["archivos"] == len(fl)
        assert g["bins"] == len(bins)
        assert g["bytes_total"] == cum
        assert g["bytes_bin_max"] == max(v[1] for v in bins.values())
        assert g["archivos_bin_max"] == max(v[0] for v in bins.values())
        assert g["factor_compactacion"] == q(len(fl) / len(bins))
        assert g["llenado_medio"] == q(
            cum / (len(bins) * float(COMPACT_TARGET)))


# --- doc_bm25_topk: distributed BM25 == pure Python ---------------------

_bm25_docs = st.lists(
    st.tuples(st.integers(0, 10_000),
              st.lists(st.sampled_from(
                  ["the", "of", "data", "spark", "scan", "xx", "yy",
                   "zz"]),
                  min_size=1, max_size=20)),
    min_size=2, max_size=20, unique_by=lambda t: t[0])


@given(docs=_bm25_docs)
@settings(**SETTINGS)
def test_doc_bm25_topk_equals_python_reference(spark, docs):
    """The shuffled tf/df/dl BM25 must match a sequential Python scorer
    with the identical rational-idf contribution, identical 1e-6
    pre-summation quantization, and the same (-score, doc_id) top-k
    tiebreak."""
    import hashlib
    import math
    import os
    import tempfile
    from collections import Counter

    from prac_data_pipelines_spark.queries.corpus import (
        BM25_B,
        BM25_K1,
        BM25_QMOD,
        BM25_TOP,
        q_doc_bm25_topk,
    )

    d = tempfile.mkdtemp(prefix="bm25_prop_")
    rows = [(i, " ".join(ws), "s") for i, ws in docs]
    spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    got = [(r["doc_id"], r["terminos"], r["puntaje"])
           for r in q_doc_bm25_topk(spark, d).collect()]

    tf = {i: Counter(ws) for i, ws in docs}
    dl = {i: len(ws) for i, ws in docs}
    n = len(docs)
    sumdl = sum(dl.values())
    dft = Counter(w for c in tf.values() for w in c)

    def is_q(w):
        return int(hashlib.md5(w.encode()).hexdigest()[:7],
                   16) % BM25_QMOD == 0

    scored = []
    for i, c in tf.items():
        ci = 0
        terms = 0
        for w, f in c.items():
            if not is_q(w):
                continue
            terms += 1
            idf = (2.0 * n - 2.0 * dft[w] + 1.0) / (2.0 * dft[w] + 1.0)
            sat = (f * (BM25_K1 + 1)) / (
                f + BM25_K1 * ((1 - BM25_B)
                               + BM25_B * (float(dl[i]) * n / sumdl)))
            ci += math.floor(idf * sat * 1_000_000 + 0.5)
        if terms:
            scored.append((i, terms, ci))
    scored.sort(key=lambda t: (-t[2], t[0]))
    want = [(i, t, math.floor(c / 1e6 * 1e6 + 0.5) / 1e6)
            for i, t, c in scored[:BM25_TOP]]
    assert got == want


# --- events_watermark_audit: jittered lateness == pure Python -----------

_wm_events = st.lists(
    st.tuples(st.integers(0, 10_000), st.integers(0, 5_000)),
    min_size=1, max_size=50, unique_by=lambda t: t[0])


@given(events=_wm_events)
@settings(**SETTINGS)
def test_events_watermark_audit_equals_python_reference(spark, events):
    """The two-level prefix-max lateness histogram must match a
    sequential arrival-order replay — ties in the arrival key resolved
    by event_id on both sides."""
    import math
    import os
    import tempfile
    from collections import defaultdict

    from prac_data_pipelines_spark.queries.events import (
        WM_JITTER_MOD,
        WM_JITTER_STEP,
        q_events_watermark_audit,
    )

    d = tempfile.mkdtemp(prefix="wm_prop_")
    df = spark.createDataFrame(
        [(i, 0, "t", 0.0, "{}", s) for i, s in events],
        "event_id long, user_id long, event_type string, value double, "
        "props string, sec long")
    (df.withColumn("ts", F.timestamp_seconds("sec")).drop("sec")
     .write.mode("overwrite").parquet(os.path.join(d, "events.parquet")))
    got = {r["retraso"]: (r["n_eventos"], r["retraso_max_seg"], r["tasa"])
           for r in q_events_watermark_audit(spark, d).collect()}

    off = WM_JITTER_STEP * (WM_JITTER_MOD - 1) // 2
    order = sorted(events,
                   key=lambda t: (t[1] + (t[0] % WM_JITTER_MOD)
                                  * WM_JITTER_STEP - off, t[0]))
    buckets = defaultdict(lambda: [0, 0])
    rm = None
    for _, es in order:
        rm = es if rm is None else max(rm, es)
        late = rm - es
        b = ("1_a_tiempo" if late == 0 else
             "2_hasta_1m" if late <= 60 else
             "3_hasta_5m" if late <= 300 else
             "4_hasta_1h" if late <= 3600 else "5_mas_1h")
        buckets[b][0] += 1
        buckets[b][1] = max(buckets[b][1], late)
    total = len(events)
    want = {b: (c, m, math.floor(c / total * 1e6 + 0.5) / 1e6)
            for b, (c, m) in buckets.items()}
    assert got == want


# --- emb_decontaminate: broadcast cosine probe == pure Python -----------

_decon_rows = st.lists(
    st.lists(st.integers(-4, 4), min_size=6, max_size=6)
    .filter(lambda v: any(v)),
    min_size=1, max_size=15)


@given(rows=_decon_rows)
@settings(**SETTINGS)
def test_emb_decontaminate_equals_python_reference(spark, rows):
    """The broadcast semantic-decontamination probe must match a
    sequential Python scan with the same rotated-mix benchmark
    synthesis, the same sequential-fold cosine, and the same r6-then-
    threshold contamination rule."""
    import math
    import os
    import tempfile

    from prac_data_pipelines_spark.queries.vector import (
        EMB_DECON_COS,
        EMB_DECON_MOD,
        q_emb_decontaminate,
    )

    d = tempfile.mkdtemp(prefix="decon_prop_")
    df = spark.createDataFrame(
        [(i, [float(v) for v in r], i % 2) for i, r in enumerate(rows)],
        "vec_id long, embedding array<float>, label int")
    df.write.mode("overwrite").parquet(os.path.join(d, "embeddings.parquet"))
    got = {r["label"]: r.asDict()
           for r in q_emb_decontaminate(spark, d).collect()}

    def cos(a, b):
        dot = 0.0
        for x, y in zip(a, b):
            dot += x * y
        na = 0.0
        for x in a:
            na += x * x
        nb = 0.0
        for y in b:
            nb += y * y
        return dot / (math.sqrt(na) * math.sqrt(nb))

    bench = []
    for bid, r in enumerate(rows):
        if bid % EMB_DECON_MOD:
            continue
        a = [float(v) for v in r]
        rot = a[1:] + a[:1]
        alpha = {0: 0.0, 1: 0.2, 2: 0.6}[bid % 3]
        bench.append([x + alpha * y for x, y in zip(a, rot)])

    want = {}
    for i, r in enumerate(rows):
        a = [float(v) for v in r]
        mc = math.floor(max(cos(a, b) for b in bench) * 1e6 + 0.5) / 1e6
        w = want.setdefault(i % 2, {"vecs_total": 0, "vecs_contaminados": 0,
                                    "vecs_conservados": 0, "cos_max": -2.0})
        w["vecs_total"] += 1
        w["vecs_contaminados"] += int(mc >= EMB_DECON_COS)
        w["vecs_conservados"] += int(mc < EMB_DECON_COS)
        w["cos_max"] = max(w["cos_max"], mc)
    assert set(got) == set(want)
    for lbl, w in want.items():
        g = got[lbl]
        for k in ("vecs_total", "vecs_contaminados", "vecs_conservados"):
            assert g[k] == w[k], (lbl, k, g, w)
        assert abs(g["cos_max"] - w["cos_max"]) <= 2e-6


# --- doc_ngram_novelty: window-min attribution == pure Python -----------

_novel_docs = st.lists(
    st.tuples(st.integers(0, 10_000),
              st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]),
                       min_size=1, max_size=12)),
    min_size=1, max_size=20, unique_by=lambda t: t[0])


@given(docs=_novel_docs)
@settings(**SETTINGS)
def test_doc_ngram_novelty_equals_python_reference(spark, docs):
    """The gram-partitioned window-min first-occurrence attribution must
    match a sequential doc_id-order replay: distinct 3-shingles per doc
    (short-doc fallback = whole text), a gram is novel in the LOWEST
    doc_id containing it, per-source rollup identical."""
    import hashlib
    import math
    import os
    import tempfile

    from prac_data_pipelines_spark.queries.text import (
        q_doc_ngram_novelty,
    )

    d = tempfile.mkdtemp(prefix="novel_prop_")
    rows = [(i, " ".join(ws), "s") for i, ws in docs]
    spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    got = q_doc_ngram_novelty(spark, d).collect()[0].asDict()

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:7], 16)

    grams = {}
    for i, ws in docs:
        gs = ({h(" ".join(ws[j:j + 3])) for j in range(len(ws) - 2)}
              if len(ws) >= 3 else {h(" ".join(ws))})
        grams[i] = gs
    first = {}
    for i in sorted(grams):
        for g in grams[i]:
            first.setdefault(g, i)

    totals = {i: len(gs) for i, gs in grams.items()}
    news = {i: sum(1 for g in gs if first[g] == i)
            for i, gs in grams.items()}
    n = len(docs)
    assert got["n_docs"] == n
    assert got["ngramas"] == sum(totals.values())
    assert got["ngramas_nuevos"] == sum(news.values())
    assert got["docs_todo_nuevo"] == sum(
        1 for i in grams if news[i] == totals[i])
    assert got["docs_sin_novedad"] == sum(1 for i in grams if news[i] == 0)
    want_mean = math.floor(
        sum(news[i] / totals[i] for i in grams) / n * 10000 + 0.5) / 10000
    assert abs(got["novedad_media"] - want_mean) <= 2e-4


# --- ann_hard_negatives: label-filtered top-k == pure Python ------------

_hn_rows = st.lists(
    st.tuples(st.lists(st.integers(-4, 4), min_size=6, max_size=6)
              .filter(lambda v: any(v)),
              st.integers(0, 2)),
    min_size=9, max_size=20)


@given(rows=_hn_rows)
@settings(**SETTINGS)
def test_ann_hard_negatives_equals_python_reference(spark, rows):
    """The broadcast label-filtered mining must match a sequential scan:
    same r6-before-rank cosine, same different-label filter, same
    (cos desc, cid asc) tiebreak, same top-HN_K cut."""
    import math
    import os
    import tempfile

    from prac_data_pipelines_spark.queries.vector import (
        HN_K,
        q_ann_hard_negatives,
    )

    d = tempfile.mkdtemp(prefix="hn_prop_")
    df = spark.createDataFrame(
        [(i, [float(v) for v in r], lb) for i, (r, lb) in enumerate(rows)],
        "vec_id long, embedding array<float>, label int")
    df.write.mode("overwrite").parquet(os.path.join(d, "embeddings.parquet"))
    got = [(r["qid"], r["cid"], r["neg_label"], r["cos"], r["rango"])
           for r in q_ann_hard_negatives(spark, d).collect()]

    def cos(a, b):
        dot = na = nb = 0.0
        for x, y in zip(a, b):
            dot += x * y
            na += x * x
            nb += y * y
        return dot / (math.sqrt(na) * math.sqrt(nb))

    want = []
    for qid in range(min(8, len(rows))):
        qv = [float(v) for v in rows[qid][0]]
        ql = rows[qid][1]
        cands = []
        for cid in range(8, len(rows)):
            cv, cl = rows[cid]
            if cl == ql:
                continue
            c = math.floor(cos(qv, [float(v) for v in cv]) * 1e6
                           + 0.5) / 1e6
            cands.append((cid, cl, c))
        cands.sort(key=lambda t: (-t[2], t[0]))
        for rank, (cid, cl, c) in enumerate(cands[:HN_K], start=1):
            want.append((qid, cid, cl, c, rank))
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[:3] == w[:3] and g[4] == w[4], (g, w)
        assert abs(g[3] - w[3]) <= 2e-6


# --- events_bot_detection: sliding peak rate == pure Python -------------

_bot_events = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 400)),
    min_size=1, max_size=60)


@given(events=_bot_events)
@settings(**SETTINGS)
def test_events_bot_detection_equals_python_reference(spark, events):
    """The range-frame peak rate must match a sequential per-user sweep
    (window anchored at each event, ties included on both sides), and
    the bucket rollup must match exactly — integer counts only."""
    import math
    import os
    import tempfile
    from collections import defaultdict

    from prac_data_pipelines_spark.queries.events import (
        BOT_RATE,
        BOT_WINDOW_SEC,
        q_events_bot_detection,
    )

    d = tempfile.mkdtemp(prefix="bot_prop_")
    df = spark.createDataFrame(
        [(i, u, "t", 0.0, "{}", s) for i, (u, s) in enumerate(events)],
        "event_id long, user_id long, event_type string, value double, "
        "props string, sec long")
    (df.withColumn("ts", F.timestamp_seconds("sec")).drop("sec")
     .write.mode("overwrite").parquet(os.path.join(d, "events.parquet")))
    got = {r["ritmo"]: (r["usuarios"], r["eventos"], r["pico_max"],
                        r["tasa"])
           for r in q_events_bot_detection(spark, d).collect()}

    by_user = defaultdict(list)
    for u, s in events:
        by_user[u].append(s)
    buckets = defaultdict(lambda: [0, 0, 0])
    for u, secs in by_user.items():
        secs.sort()
        peak = max(sum(1 for t in secs
                       if s - (BOT_WINDOW_SEC - 1) <= t <= s)
                   for s in secs)
        b = ("1_individual" if peak <= 1 else
             "2_moderado" if peak <= 3 else
             "3_intenso" if peak < BOT_RATE else "4_bot")
        buckets[b][0] += 1
        buckets[b][1] += len(secs)
        buckets[b][2] = max(buckets[b][2], peak)
    total = len(by_user)
    want = {b: (us, ev, pk, math.floor(us / total * 1e6 + 0.5) / 1e6)
            for b, (us, ev, pk) in buckets.items()}
    assert got == want


# --- training_mix_epochs: recipe arithmetic == pure Python --------------

_mix_epoch_docs = st.lists(
    st.tuples(st.integers(0, 10_000),
              st.sampled_from(["s0", "s1", "s2"]),
              st.lists(st.sampled_from(["aa", "bb"]), min_size=1,
                       max_size=20)),
    min_size=2, max_size=25, unique_by=lambda t: t[0])


@given(docs=_mix_epoch_docs)
@settings(**SETTINGS)
def test_training_mix_epochs_equals_python_reference(spark, docs):
    """The recipe table must match a sequential computation of the same
    sqrt-dampened weights and floor-quantized token targets; the
    repetition flag is exact integer comparison."""
    import math
    import os
    import tempfile
    from collections import defaultdict

    from prac_data_pipelines_spark.queries.corpus import (
        MIX_EPOCHS_MULT,
        q_training_mix_epochs,
    )

    d = tempfile.mkdtemp(prefix="mixep_prop_")
    rows = [(i, " ".join(ws), s) for i, s, ws in docs]
    spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    got = {r["source"]: r.asDict()
           for r in q_training_mix_epochs(spark, d).collect()}

    toks = defaultdict(int)
    ndocs = defaultdict(int)
    for _, s, ws in docs:
        toks[s] += len(ws)
        ndocs[s] += 1
    ttok = sum(toks.values())
    ssqrt = sum(math.sqrt(t) for t in sorted(toks.values()))

    assert set(got) == set(toks)
    for s, t in toks.items():
        g = got[s]
        assert g["n_docs"] == ndocs[s]
        assert g["tokens"] == t
        assert abs(g["peso"]
                   - math.floor(math.sqrt(t) / ssqrt * 1e6 + 0.5) / 1e6
                   ) <= 2e-6
        obj = math.floor(MIX_EPOCHS_MULT * ttok
                         * (math.sqrt(t) / ssqrt) + 0.5)
        assert abs(g["tokens_objetivo"] - obj) <= 1
        assert abs(g["epocas"]
                   - math.floor(g["tokens_objetivo"] / t * 1e6 + 0.5) / 1e6
                   ) <= 2e-6
        assert g["repetido"] == (g["tokens_objetivo"] > t)


# --- doc_langmix_detect: chunk-level stopword votes == pure Python ------

_langmix_docs = st.lists(
    st.tuples(st.integers(0, 10_000),
              st.sampled_from(["en", "es"]),
              st.lists(st.sampled_from(
                  ["the", "of", "is", "el", "la", "de", "xx", "yy"]),
                  min_size=1, max_size=40)),
    min_size=1, max_size=20, unique_by=lambda t: t[0])


@given(docs=_langmix_docs)
@settings(**SETTINGS)
def test_doc_langmix_detect_equals_python_reference(spark, docs):
    """The positional-slice chunk votes must match a sequential chunker:
    same C4_LINE_W chunks (short tail included), same en/es stopword
    majority per chunk, same mixed-doc flag and per-lang rollup."""
    import math
    import os
    import tempfile
    from collections import defaultdict

    from prac_data_pipelines_spark.queries.corpus import (
        C4_LINE_W,
        q_doc_langmix_detect,
    )

    d = tempfile.mkdtemp(prefix="langmix_prop_")
    rows = [(i, " ".join(ws), "s", lg) for i, lg, ws in docs]
    spark.createDataFrame(
        rows, "doc_id long, text string, source string, lang string"
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    got = {r["lang"]: r.asDict()
           for r in q_doc_langmix_detect(spark, d).collect()}

    en = {"the", "and", "of", "is", "to", "in"}
    es = {"el", "la", "de", "los", "un", "en"}
    agg = defaultdict(lambda: {"docs": 0, "docs_mezclados": 0,
                               "trozos_en": 0, "trozos_es": 0,
                               "trozos_unk": 0})
    for _, lg, ws in docs:
        nl = (len(ws) + C4_LINE_W - 1) // C4_LINE_W
        cen = ces = 0
        for j in range(nl):
            chunk = ws[j * C4_LINE_W:(j + 1) * C4_LINE_W]
            ven = sum(1 for w in chunk if w in en)
            ves = sum(1 for w in chunk if w in es)
            if ven > ves:
                cen += 1
            elif ves > ven:
                ces += 1
        a = agg[lg]
        a["docs"] += 1
        a["docs_mezclados"] += int(cen > 0 and ces > 0)
        a["trozos_en"] += cen
        a["trozos_es"] += ces
        a["trozos_unk"] += nl - cen - ces
    assert set(got) == set(agg)
    for lg, w in agg.items():
        g = got[lg]
        for k, v in w.items():
            assert g[k] == v, (lg, k, g, w)
        assert g["tasa_mezcla"] == math.floor(
            w["docs_mezclados"] / w["docs"] * 1e6 + 0.5) / 1e6


# --- simhash_recall_audit: hamming curve == Python over primitives ------

_recall_texts = st.lists(
    st.sampled_from([
        "the quick brown fox jumps over the lazy dog today",
        "the quick brown fox jumps over the lazy dog tonight",
        "a completely different document about spark windows",
        "a completely different document about spark joins",
        "short one",
    ]),
    min_size=2, max_size=14)


@given(texts=_recall_texts)
@settings(**SETTINGS)
def test_simhash_recall_audit_equals_python_replay(spark, texts):
    """The audit must equal a sequential replay built from the engine's
    own (independently oracle-verified) primitives: LSH candidates via
    minhash_signatures bands, ground truth via exact shingle Jaccard at
    the r4-rounded CURATION_JACCARD rule, distances via the collected
    SimHashes, cumulative recall over the histogram."""
    import math
    import os
    import re
    import tempfile
    from collections import Counter

    from prac_data_pipelines_spark.queries.text import (
        CURATION_JACCARD,
        MAX_BAND_DOCS,
        N_BANDS,
        minhash_signatures,
        q_doc_simhash,
        q_simhash_recall_audit,
    )

    d = tempfile.mkdtemp(prefix="shr_prop_")
    rows = [(i, t, "s") for i, t in enumerate(texts)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string")
    docs.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    got = [(r["hamming"], r["pares"], r["pares_acum"], r["recall_acum"])
           for r in q_simhash_recall_audit(spark, d).collect()]

    sigs = {r["doc_id"]: tuple(r["sigs"])
            for r in minhash_signatures(docs).collect()}
    sims = {r["doc_id"]: r["simhash"]
            for r in q_doc_simhash(spark, d).collect()}

    def bandset(s):
        return {(b, s[2 * b], s[2 * b + 1]) for b in range(N_BANDS)}

    # hot-band guard: bands shared by > MAX_BAND_DOCS docs drop out
    band_n = Counter(b for i in sigs for b in bandset(sigs[i]))
    ok_bands = {b for b, n in band_n.items() if n <= MAX_BAND_DOCS}

    def shingles(t):
        ws = re.split(r"\s+", t.strip(" "))
        return (set(" ".join(ws[i:i + 3]) for i in range(len(ws) - 2))
                if len(ws) >= 3 else {t.strip(" ")})

    hist = Counter()
    ids = sorted(sigs)
    for i in ids:
        for j in ids:
            if not (i < j and bandset(sigs[i]) & bandset(sigs[j]) & ok_bands):
                continue
            si, sj = shingles(texts[i]), shingles(texts[j])
            inter = len(si & sj)
            jac = math.floor(inter / (len(si) + len(sj) - inter)
                             * 10000 + 0.5) / 10000
            if jac >= CURATION_JACCARD:
                hist[bin(sims[i] ^ sims[j]).count("1")] += 1
    total = sum(hist.values())
    want = []
    acum = 0
    for h in sorted(hist):
        acum += hist[h]
        want.append((h, hist[h], acum,
                     math.floor(acum / total * 1e6 + 0.5) / 1e6))
    assert got == want


# --- vocab_growth_curve: rank-quartile attribution == pure Python -------

_vocab_docs = st.lists(
    st.tuples(st.integers(0, 10_000),
              st.lists(st.sampled_from(["aa", "bb", "cc", "dd", "ee"]),
                       min_size=1, max_size=15)),
    min_size=1, max_size=25, unique_by=lambda t: t[0])


@given(docs=_vocab_docs)
@settings(**SETTINGS)
def test_vocab_growth_curve_equals_python_reference(spark, docs):
    """The global_positions rank-quartile bucketing and the min-quartile
    first-occurrence attribution must match a sequential doc_id-order
    replay — sparse doc_ids, fewer docs than quartiles, and words
    spanning quartile boundaries included."""
    import math
    import os
    import tempfile
    from collections import defaultdict

    from prac_data_pipelines_spark.queries.corpus import (
        VOCAB_QUARTILES,
        q_vocab_growth_curve,
    )

    d = tempfile.mkdtemp(prefix="vocab_prop_")
    rows = [(i, " ".join(ws), "s") for i, ws in docs]
    spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    got = {r["cuartil"]: r.asDict()
           for r in q_vocab_growth_curve(spark, d).collect()}

    n = len(docs)
    ordered = sorted(docs)
    agg = defaultdict(lambda: {"docs": 0, "palabras": 0, "vocab_nuevo": 0})
    seen = set()
    for pos, (_, ws) in enumerate(ordered, start=1):
        q = min(VOCAB_QUARTILES - 1,
                (pos - 1) * VOCAB_QUARTILES // n) + 1
        agg[q]["docs"] += 1
        agg[q]["palabras"] += len(ws)
        for w in ws:
            if w not in seen:
                seen.add(w)
                agg[q]["vocab_nuevo"] += 1
    assert set(got) == set(agg)
    acum = 0
    for q in sorted(agg):
        w = agg[q]
        acum += w["vocab_nuevo"]
        g = got[q]
        for k, v in w.items():
            assert g[k] == v, (q, k, g, w)
        assert g["vocab_acum"] == acum
        assert g["tasa_nuevas"] == math.floor(
            w["vocab_nuevo"] / w["palabras"] * 1e6 + 0.5) / 1e6


# --- events_cohort_value: cents-exact cohort LTV == pure Python ---------

_cohort_events = st.lists(
    st.tuples(st.integers(0, 4),                     # user
              st.integers(0, 604800 * 5 - 1),        # second (5 weeks)
              st.sampled_from(["purchase", "view"]),
              st.integers(1, 40_000)),               # value in cents
    min_size=1, max_size=50)


@given(events=_cohort_events)
@settings(**SETTINGS)
def test_events_cohort_value_equals_python_reference(spark, events):
    """The cohort LTV rollup must match a sequential replay: epoch-week
    cohorts, per-event cents quantization BEFORE summation, exact
    integer cumulative per cohort."""
    import math
    import os
    import tempfile
    from collections import defaultdict

    from prac_data_pipelines_spark.queries.events import (
        q_events_cohort_value,
    )

    d = tempfile.mkdtemp(prefix="cohort_prop_")
    df = spark.createDataFrame(
        [(i, u, t, c / 100.0, "{}", s)
         for i, (u, s, t, c) in enumerate(events)],
        "event_id long, user_id long, event_type string, value double, "
        "props string, sec long")
    (df.withColumn("ts", F.timestamp_seconds("sec")).drop("sec")
     .write.mode("overwrite").parquet(os.path.join(d, "events.parquet")))
    got = [(r["cohorte_semana"], r["desfase"], r["usuarios"], r["valor"],
            r["valor_acum"])
           for r in q_events_cohort_value(spark, d).collect()]

    first_wk = {}
    cell_users = defaultdict(set)
    cell_cents = defaultdict(int)
    for u, s, t, c in events:
        wk = s // 604800
        first_wk[u] = min(first_wk.get(u, wk), wk)
    for u, s, t, c in events:
        wk = s // 604800
        cell_users[(first_wk[u], wk - first_wk[u])].add(u)
        if t == "purchase":
            cents = math.floor((c / 100.0) * 100 + 0.5)
            cell_cents[(first_wk[u], wk - first_wk[u])] += cents
    want = []
    for coh in sorted({c for c, _ in cell_users}):
        acum = 0
        for off in sorted(o for c, o in cell_users if c == coh):
            cents = cell_cents[(coh, off)]
            acum += cents
            want.append((coh, off, len(cell_users[(coh, off)]),
                         math.floor(cents / 100.0 * 100 + 0.5) / 100,
                         math.floor(acum / 100.0 * 100 + 0.5) / 100))
    assert got == want


# --- multimodal_frame_dedup: hashed fan-out == pure Python --------------

_fd_texts = st.lists(
    st.text(alphabet="abcxyz ", min_size=0, max_size=40),
    min_size=1, max_size=25)


@given(texts=_fd_texts)
@settings(**SETTINGS)
def test_multimodal_frame_dedup_equals_python_reference(spark, texts):
    """The hashed Arrow fan-out + first-occurrence window must match a
    sequential replay of the frame-slicing stub: same slices, same
    md5-of-hex fingerprint, first occurrence = lowest (doc_id,
    frame_idx), per-doc counts and millionths fraction identical —
    empty payloads, zero-length frames, and single-frame docs included."""
    import math
    import os
    import tempfile
    from collections import defaultdict

    from prac_data_pipelines_spark.operators.multimodal import (
        frame_hash_stub,
    )
    from prac_data_pipelines_spark.queries.media import (
        q_multimodal_frame_dedup,
    )

    d = tempfile.mkdtemp(prefix="framededup_prop_")
    rows = [(i, t, "s") for i, t in enumerate(texts)]
    spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    got = {r["doc_id"]: (r["n_frames"], r["n_dup"], r["frac_dup"])
           for r in q_multimodal_frame_dedup(spark, d).collect()}

    frames = []  # (doc_id, frame_idx, hash) in (doc_id, idx) order
    for i, t in enumerate(texts):
        payload = t.encode("utf-8")
        n = len(payload)
        n_frames = n % 30 + 1
        stride = (n_frames + 7) // 8
        flen = n // n_frames
        for idx in range(0, n_frames, stride):
            start = idx * flen
            end = n if idx == n_frames - 1 else (idx + 1) * flen
            frames.append((i, idx, frame_hash_stub(payload[start:end])))
    seen: set[int] = set()
    per_doc = defaultdict(lambda: [0, 0])
    for i, idx, h in frames:  # already in (doc_id, frame_idx) order
        per_doc[i][0] += 1
        if h in seen:
            per_doc[i][1] += 1
        seen.add(h)
    want = {i: (nf, nd, math.floor(nd / nf * 1e6 + 0.5) / 1e6)
            for i, (nf, nd) in per_doc.items()}
    assert got == want


# --- events_interarrival: log2 gap histogram == pure Python -------------

_ia_events = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 1000),
              st.sampled_from(["a", "b"])),
    min_size=1, max_size=60)


@given(events=_ia_events)
@settings(**SETTINGS)
def test_events_interarrival_equals_python_reference(spark, events):
    """The lag-under-user-window histogram must match a sequential
    per-user sweep: gaps ordered by (sec, event_id), attributed to the
    LATER event's type, bucket = bit_length(gap+1) - 1 (the portable
    integer log2), power-of-two bounds, millionths fraction — zero gaps
    (ties) and single-event users included."""
    import math
    import os
    import tempfile
    from collections import defaultdict

    from prac_data_pipelines_spark.queries.events import (
        q_events_interarrival,
    )

    d = tempfile.mkdtemp(prefix="interarrival_prop_")
    df = spark.createDataFrame(
        [(i, u, t, 0.0, "{}", s) for i, (u, s, t) in enumerate(events)],
        "event_id long, user_id long, event_type string, value double, "
        "props string, sec long")
    (df.withColumn("ts", F.timestamp_seconds("sec")).drop("sec")
     .write.mode("overwrite").parquet(os.path.join(d, "events.parquet")))
    got = {(r["event_type"], r["cubo"]):
           (r["desde_s"], r["hasta_s"], r["n"], r["frac"])
           for r in q_events_interarrival(spark, d).collect()}

    by_user = defaultdict(list)
    for i, (u, s, t) in enumerate(events):
        by_user[u].append((s, i, t))
    hist = defaultdict(int)
    for u, evs in by_user.items():
        evs.sort()
        for (ps, _, _), (s, _, t) in zip(evs, evs[1:]):
            hist[(t, (s - ps + 1).bit_length() - 1)] += 1
    tot = defaultdict(int)
    for (t, b), n in hist.items():
        tot[t] += n
    want = {(t, b): ((1 << b) - 1, (2 << b) - 2, n,
                     math.floor(n / tot[t] * 1e6 + 0.5) / 1e6)
            for (t, b), n in hist.items()}
    assert got == want


# --- emb_label_outliers: centroid-margin queue == pure Python -----------

_lo_rows = st.lists(
    st.tuples(st.lists(st.integers(-4, 4), min_size=6, max_size=6)
              .filter(lambda v: any(v)),
              st.integers(0, 2)),
    min_size=2, max_size=20)


@given(rows=_lo_rows)
@settings(**SETTINGS)
def test_emb_label_outliers_equals_python_reference(spark, rows):
    """The broadcast-array argmax must match a sequential replay: same
    millionths-rounded centroids (per-dim mean), same sequential-fold
    cosine, best OTHER centroid with lowest-label tiebreak, margin
    ranking (desc, vec_id asc) — single-label corpora (no 'other' rows)
    included."""
    import math
    import os
    import tempfile
    from collections import defaultdict

    from prac_data_pipelines_spark.queries.vector import (
        OUTLIER_TOP_K,
        q_emb_label_outliers,
    )

    d = tempfile.mkdtemp(prefix="labelout_prop_")
    spark.createDataFrame(
        [(i, [float(x) for x in v], l) for i, (v, l) in enumerate(rows)],
        "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(os.path.join(d, "embeddings.parquet"))
    got = [(r["vec_id"], r["label"], r["otro"], r["cos_propio"],
            r["cos_otro"], r["margen"])
           for r in q_emb_label_outliers(spark, d).collect()]

    def rnd(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    def cos(a, b):
        dot = 0.0
        for x, y in zip(a, b):
            dot += x * y
        na = 0.0
        for x in a:
            na += x * x
        nb = 0.0
        for y in b:
            nb += y * y
        return dot / (math.sqrt(na) * math.sqrt(nb))

    by_label = defaultdict(list)
    for v, l in rows:
        by_label[l].append(v)
    cents = {l: [rnd(sum(col) / len(vs)) for col in zip(*vs)]
             for l, vs in by_label.items()}
    out = []
    for i, (v, l) in enumerate(rows):
        others = [(rnd(cos(v, ce)), -l2) for l2, ce in cents.items()
                  if l2 != l]
        if not others:
            continue
        c, nl = max(others)
        cp = rnd(cos(v, cents[l]))
        out.append((i, l, -nl, cp, c, rnd(c - cp)))
    out.sort(key=lambda r: (-r[5], r[0]))
    assert got == out[:OUTLIER_TOP_K]


# --- lsh_bucket_skew: bucket audit == pure Python replay ----------------

_bs_rows = st.lists(
    st.lists(st.integers(-3, 3), min_size=64, max_size=64),
    min_size=2, max_size=16)


@given(vecs=_bs_rows)
@settings(**SETTINGS)
def test_lsh_bucket_skew_equals_python_reference(spark, vecs):
    """The per-table bucket audit must match a sequential replay of the
    SAME hyperplane signs and bit packing (LSH_PLANES): bucket counts,
    max bucket, exact C(size,2) pair sums, and the millionths mean /
    pair-fraction — all-identical and all-distinct corpora included."""
    import math
    import os
    import tempfile
    from collections import Counter

    from prac_data_pipelines_spark.queries.vector import (
        LSH_BITS,
        LSH_PLANES,
        LSH_TABLES,
        q_lsh_bucket_skew,
    )

    d = tempfile.mkdtemp(prefix="bucketskew_prop_")
    spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(os.path.join(d, "embeddings.parquet"))
    got = {r["t"]: (r["n_cubos"], r["n_vecs"], r["max_cubo"], r["pares"],
                    r["media"], r["frac_pares"])
           for r in q_lsh_bucket_skew(spark, d).collect()}

    bits_per_vec = [[sum(x * s for x, s in zip(v, plane)) >= 0
                     for plane in LSH_PLANES] for v in vecs]
    n = len(vecs)
    want = {}
    for t in range(LSH_TABLES):
        keys = Counter()
        for bits in bits_per_vec:
            key = 0
            for b in bits[t * LSH_BITS:(t + 1) * LSH_BITS]:
                key = key * 2 + (1 if b else 0)
            keys[key] += 1
        pares = sum(sz * (sz - 1) // 2 for sz in keys.values())
        want[t] = (len(keys), n, max(keys.values()), pares,
                   math.floor(n / len(keys) * 1e6 + 0.5) / 1e6,
                   math.floor(pares / (n * (n - 1) / 2.0) * 1e6 + 0.5) / 1e6)
    assert got == want


# --- knn_mutual_pairs: graph invariants ----------------------------------

def test_knn_mutual_pairs_invariants(spark, sf_dir):
    """Every emitted edge must be genuinely mutual under the SAME
    candidate index: both rank columns within MUTUAL_K, undirected key
    canonical (a < b), no duplicates, and the pair's cosine must equal
    the r6 cosine recomputed from the raw vectors."""
    import math

    from prac_data_pipelines_spark.queries.vector import (
        MUTUAL_K,
        q_knn_mutual_pairs,
    )
    from prac_data_pipelines_spark.sources import load_table

    rows = q_knn_mutual_pairs(spark, sf_dir).collect()
    assert rows, "synthetic corpus should yield mutual pairs"
    keys = [(r["a"], r["b"]) for r in rows]
    assert len(keys) == len(set(keys))
    assert all(r["a"] < r["b"] for r in rows)
    assert all(1 <= r["rango_ab"] <= MUTUAL_K
               and 1 <= r["rango_ba"] <= MUTUAL_K for r in rows)
    emb = {r["vec_id"]: r["embedding"]
           for r in load_table(spark, sf_dir, "embeddings").collect()}

    def cos(a, b):
        dot = 0.0
        for x, y in zip(a, b):
            dot += float(x) * float(y)
        na = math.sqrt(sum(float(x) * float(x) for x in a))
        nb = math.sqrt(sum(float(y) * float(y) for y in b))
        return math.floor(dot / (na * nb) * 1e6 + 0.5) / 1e6

    for r in rows[:50]:
        assert abs(r["cos"] - cos(emb[r["a"]], emb[r["b"]])) <= 2e-6


# --- corpus_dedup_funnel: monotone containment + stage semantics --------

def test_corpus_dedup_funnel_monotone_and_stage_counts(spark, sf_dir):
    """The funnel must be monotone non-increasing in docs AND tokens,
    stage 2 must drop exactly the synthesized exact clones, and stage 3
    exactly the synthesized uppercased clones (the sf0.001 corpus has no
    natural exact or normalization dups — verified in-test)."""
    from pyspark.sql import functions as F

    from prac_data_pipelines_spark.queries.text import (
        _NORM,
        q_corpus_dedup_funnel,
    )
    from prac_data_pipelines_spark.sources import load_table

    got = {r["etapa"]: (r["docs"], r["tokens"])
           for r in q_corpus_dedup_funnel(spark, sf_dir).collect()}
    stages = sorted(got)
    assert stages == ["1_base", "2_exacto", "3_normalizado",
                      "4_near_dup", "5_calidad"]
    for s1, s2 in zip(stages, stages[1:]):
        assert got[s1][0] >= got[s2][0]
        assert got[s1][1] >= got[s2][1]
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    nat_exact = n - docs.select(F.md5("text")).distinct().count()
    nat_norm = n - docs.select(F.md5(F.expr(_NORM))).distinct().count()
    assert nat_exact == 0 and nat_norm == 0  # test premise
    n_clone_exact = docs.filter("doc_id < 40").count()
    n_clone_norm = docs.filter("doc_id >= 40 and doc_id < 70").count()
    assert got["1_base"][0] == n + n_clone_exact + n_clone_norm
    assert got["2_exacto"][0] == n + n_clone_norm
    assert got["3_normalizado"][0] == n


# --- doc_clf_calibration: confusion-matrix invariants --------------------

def test_doc_clf_calibration_invariants(spark, sf_dir):
    """Across the threshold sweep the confusion matrix must re-partition
    the SAME corpus (tp+fp+fn+tn constant = n_docs), predicted-positive
    counts must be non-increasing in tau (strict integer rule), recall
    non-increasing, and tp+fn (the reference positives) constant."""
    from prac_data_pipelines_spark.queries.corpus import (
        q_doc_clf_calibration,
    )
    from prac_data_pipelines_spark.sources import load_table

    rows = sorted(q_doc_clf_calibration(spark, sf_dir).collect(),
                  key=lambda r: r["tau_mili"])
    n = load_table(spark, sf_dir, "documents").count()
    assert all(r["tp"] + r["fp"] + r["fn"] + r["tn"] == n for r in rows)
    pos_ref = {r["tp"] + r["fn"] for r in rows}
    assert len(pos_ref) == 1
    preds = [r["tp"] + r["fp"] for r in rows]
    assert preds == sorted(preds, reverse=True)
    recalls = [r["recall"] for r in rows]
    assert recalls == sorted(recalls, reverse=True)


_contam_docs = st.lists(
    st.lists(st.sampled_from(["a", "b"]), min_size=0, max_size=30),
    min_size=2, max_size=12)


@given(docs=_contam_docs)
@settings(**SETTINGS)
def test_doc_eval_contamination_matches_python_reference(spark, docs):
    """The distributed audit (broadcast-semi filtered train grams,
    exact-integer ppm fractions and dirtiness buckets) must equal a
    sequential Python reimplementation over the same eval-slice rule —
    including gram-less short docs (the whole-text fallback gram),
    fully-contaminated docs (bucket 10), and fully-clean docs."""
    import re as _re

    from prac_data_pipelines_spark.queries.corpus import (
        DECON_K,
        EVAL_MAX_ID,
        EVAL_MOD,
        q_doc_eval_contamination,
    )

    # alternate ids on/off the eval slice so both classes always exist
    rows = [(11 * i if i % 2 == 0 else 11 * i + 1,
             " ".join(toks), "s", len(" ".join(toks)))
            for i, toks in enumerate(docs)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, source string, n_chars long")
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
        got = sorted(tuple(r) for r in
                     q_doc_eval_contamination(spark, d).collect())

    def grams(text: str) -> set[str]:
        ws = _re.split(r"\s+", text.strip())
        if len(ws) >= DECON_K:
            return {" ".join(ws[i:i + DECON_K])
                    for i in range(len(ws) - DECON_K + 1)}
        return {text.strip()}

    is_eval = lambda i: i % EVAL_MOD == 0 and i < EVAL_MAX_ID  # noqa: E731
    train = set().union(*(grams(t) for i, t, _, _ in rows if not is_eval(i)),
                        set())
    per_bucket: dict[int, list[int]] = {}
    for i, t, _, _ in rows:
        if not is_eval(i):
            continue
        gs = grams(t)
        total, matched = len(gs), len(gs & train)
        per_bucket.setdefault((10 * matched) // total, []).append(
            (1_000_000 * matched) // total)
    want = sorted((b, len(fs), sum(fs) // len(fs), max(fs))
                  for b, fs in per_bucket.items())
    assert got == want


_cc_pairs = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 30)),
    min_size=1, max_size=80)


@given(pairs=_cc_pairs)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
def test_min_label_components_equal_union_find(spark, pairs):
    """The distributed CC core must label every node of a random pair
    graph (self-loops, duplicate and reversed edges included) with the
    smallest node id in its component — checked against a driver-side
    union-find. Exercises the seeded first propagation step across
    arbitrary topologies, not just the near-dup star/pair shapes."""
    from prac_data_pipelines_spark.operators.graph import (
        min_label_components,
    )

    parent = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {x: find(x) for x in parent}

    df = spark.createDataFrame(pairs, "d1 long, d2 long")
    got = {r.doc_id: r.etiqueta
           for r in min_label_components(spark, df).collect()}
    assert got == want


@given(
    rows=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 50),
                            st.integers(1, 30)),
                  min_size=1, max_size=60),
    parts=st.integers(1, 7),
)
@settings(**SETTINGS)
def test_ranking_operators_materialize_invariant(spark, rows, parts):
    """materialize=True (localCheckpoint of the ranged frame, r10) must be
    a pure plan optimization: row-identical output to materialize=False
    for all four two-level ranking operators, under any input
    partitioning — including ties, single-row groups and one dominant
    group."""
    from prac_data_pipelines_spark.operators.sorting import (
        global_positions, global_running_max, grouped_positions)
    from prac_data_pipelines_spark.operators.windows import pareto_abc

    df = spark.createDataFrame(
        [(i, g, v) for i, (g, v) in enumerate((g, v) for g, v, _ in rows)],
        "id long, g int, v int").repartition(parts)

    def rows_of(frame):
        return sorted(tuple(r) for r in frame.collect())

    gp = lambda m: grouped_positions(  # noqa: E731
        df, ["g"], [F.desc("v"), F.asc("id")], pos_col="pos", n_col="n",
        cum_of=F.col("v"), cum_col="cum", total_col="tot", materialize=m)
    assert rows_of(gp(True)) == rows_of(gp(False))

    pos = lambda m: global_positions(  # noqa: E731
        df, [F.desc("v"), F.asc("id")], pos_col="pos", materialize=m)
    assert rows_of(pos(True)) == rows_of(pos(False))

    rmax = lambda m: global_running_max(  # noqa: E731
        df, [F.asc("id")], "v", out_col="rm", materialize=m)
    assert rows_of(rmax(True)) == rows_of(rmax(False))

    agg = df.groupBy("g").agg(F.sum("v").cast("double").alias("amt"))
    pab = lambda m: pareto_abc(  # noqa: E731
        agg, "amt", key_order=[F.col("g").asc()], materialize=m)
    assert rows_of(pab(True)) == rows_of(pab(False))
