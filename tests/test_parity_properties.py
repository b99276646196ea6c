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
