"""Randomized cross-engine parity: the portable rounding and bucket-ladder
primitives must agree bit-for-bit between Spark and DuckDB over a large
seeded random sample spanning magnitudes, signs, and edge offsets — these
primitives are what every oracle hash-match rests on."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd


def _sample() -> pd.DataFrame:
    rng = np.random.default_rng(7)
    vals = np.concatenate([
        rng.uniform(-1e6, 1e6, 4000),
        rng.uniform(-1, 1, 2000),
        np.round(rng.uniform(-1000, 1000, 2000), 3),   # lots of .xx5 boundaries
        rng.uniform(-1e9, 1e9, 1000),
    ])
    days = rng.integers(-400, 800, len(vals))
    return pd.DataFrame({"x": vals, "d": days})


def test_rounding_and_bucket_parity(spark):
    from prac_data_pipelines_spark.config import RANGOS_ANTIGUEDAD
    from prac_data_pipelines_spark.operators.buckets import bucketize, bucketize_sql
    from prac_data_pipelines_spark.operators.rounding import r2, r4
    from pyspark.sql import functions as F

    pdf = _sample()
    sdf = spark.createDataFrame(pdf)
    got = (
        sdf.select(
            r2(F.col("x")).alias("x2"),
            r4(F.col("x")).alias("x4"),
            bucketize(F.col("d"), RANGOS_ANTIGUEDAD).alias("b"),
        )
        .toPandas()
    )

    con = duckdb.connect()
    con.register("t", pdf)
    want = con.execute(f"""
        SELECT floor(x * 100 + 0.5) / 100 AS x2,
               floor(x * 10000 + 0.5) / 10000 AS x4,
               {bucketize_sql('d', RANGOS_ANTIGUEDAD)} AS b
        FROM t
    """).df()

    assert (got["x2"].to_numpy() == want["x2"].to_numpy()).all()
    assert (got["x4"].to_numpy() == want["x4"].to_numpy()).all()
    assert (got["b"].to_numpy() == want["b"].to_numpy()).all()


def test_doc_lm_quality_matches_pure_python(spark, tmp_path):
    """The distributed bigram-LM scorer must equal an independent pure-
    Python reference (exact counts, add-1 smoothing) on a corpus with
    repeated bigrams, single-word docs (excluded), and cross-doc vocab."""
    import os
    from collections import Counter

    from prac_data_pipelines_spark.queries.corpus import q_doc_lm_quality

    texts = {
        1: "the cat sat on the mat",
        2: "the cat sat",
        3: "dog",                       # no bigram -> excluded
        4: "the mat the cat",
        5: "a completely different sentence here",
    }
    rows = [(i, t, "und", "s1" if i < 4 else "s2", len(t))
            for i, t in texts.items()]
    d = tmp_path / "lm"
    d.mkdir()
    (spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
     .write.mode("overwrite").parquet(os.path.join(str(d), "documents.parquet")))

    # independent reference
    words = {i: t.split() for i, t in texts.items()}
    bigrams = {i: list(zip(w, w[1:])) for i, w in words.items()}
    c2 = Counter(b for bs in bigrams.values() for b in bs)
    c1 = Counter(b[0] for bs in bigrams.values() for b in bs)
    vocab = len({w for ws in words.values() for w in ws})
    per_doc = {i: sum((c2[b] + 1) / (c1[b[0]] + vocab) for b in bs) / len(bs)
               for i, bs in bigrams.items() if bs}
    by_src = {}
    for i, p in per_doc.items():
        by_src.setdefault("s1" if i < 4 else "s2", []).append(p)

    got = {r["source"]: r for r in q_doc_lm_quality(spark, str(d)).collect()}
    assert set(got) == set(by_src)
    for src, ps in by_src.items():
        assert got[src]["n_docs"] == len(ps)
        assert abs(got[src]["media_prob"] - sum(ps) / len(ps)) < 1e-6
        assert abs(got[src]["min_prob"] - min(ps)) < 1e-6
