"""Accuracy bounds for the sketch query (approx distinct + approx
quantiles). Approximate values are engine-specific so sketch_profile
compares sketch vs exact IN-QUERY and emits `*_ok` booleans alongside
the exact values — its DuckDB oracle expects literal TRUEs, so the
driver's hash match IS the accuracy check. This test asserts the same
contract directly and pins the exact columns to their oracle-checked
twins."""

from __future__ import annotations

from prac_data_pipelines_spark.queries import all_queries


def test_sketches_track_exact_values(spark, sf_dir):
    q = all_queries()
    sk = q["sketch_profile"](spark, sf_dir).collect()[0]
    exact_d = q["distinct_counts"](spark, sf_dir).collect()[0]

    # every sketch landed within tolerance of its exact twin (computed
    # in the same aggregate pass)
    for flag in ("clientes_hll_ok", "partes_hll_ok",
                 "p50_kll_ok", "p90_kll_ok"):
        assert sk[flag] is True, flag

    # the exact columns agree with the independently-computed exact query
    assert sk["clientes_activos"] == exact_d["clientes_activos"]
    assert sk["partes_vendidas"] == exact_d["partes_vendidas"]

    # and the global exact quantiles sit within the per-flag envelope of
    # the grouped quantiles query (sanity link between the two surfaces)
    exact_q = {r["l_returnflag"]: r
               for r in q["quantiles"](spark, sf_dir).collect()}
    p50s = [r["p50_precio"] for r in exact_q.values()]
    p90s = [r["p90_precio"] for r in exact_q.values()]
    assert min(p50s) <= sk["p50_precio"] <= max(p50s)
    assert min(p90s) <= sk["p90_precio"] <= max(p90s)


def test_emb_quantize_grid_exactness(spark, sf_dir):
    """Pinned semantics for the int8 quantization audit: values already
    ON the 255-step grid reconstruct exactly (rmse 0), constant dims
    cost nothing, and every per-element error is bounded by half a step
    of that dimension's scale."""
    import pyspark.sql.functions as F

    from prac_data_pipelines_spark.queries.vector import q_emb_quantize

    out = {r["label"]: r for r in q_emb_quantize(spark, sf_dir).collect()}
    from prac_data_pipelines_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    # global per-dim scale bound: max per-element error <= scale/2 + eps
    dims = (emb.select(F.posexplode("embedding").alias("dim", "v"))
            .groupBy("dim")
            .agg(((F.max(F.col("v").cast("double"))
                   - F.min(F.col("v").cast("double"))) / 255.0).alias("s")))
    max_half_step = dims.agg(F.max("s")).collect()[0][0] / 2
    for r in out.values():
        assert r["error_max"] <= max_half_step + 1e-9
        assert 0.0 <= r["rmse_media"] <= r["error_max"] + 1e-9

    # a grid-exact corpus reconstructs exactly
    grid = spark.createDataFrame(
        [(1, [0.0, 1.0], 0), (2, [255.0, 1.0], 0), (3, [51.0, 1.0], 1)],
        "vec_id long, embedding array<float>, label int")
    import prac_data_pipelines_spark.queries.vector as vec

    orig = vec._emb
    vec._emb = lambda s, d: grid
    try:
        res = {r["label"]: r for r in q_emb_quantize(spark, "").collect()}
    finally:
        vec._emb = orig
    assert res[0]["rmse_media"] == 0.0 and res[0]["error_max"] == 0.0
    assert res[1]["rmse_media"] == 0.0


def test_hll_union_merge_accuracy_and_order_invariance(spark):
    """events_uniques_sketch's contract: merging daily HLL sketches must
    estimate the weekly uniques within the 5% bound at a cardinality
    where HLL is genuinely estimating (50k uniques, far past sparse
    mode), and the merged estimate must be identical regardless of
    partitioning / merge order (Datasketches HLL union is
    order-independent — the property the partition sweeps rely on)."""
    from pyspark.sql import functions as F

    n, days = 50_000, 7
    # each user appears on 3 consecutive days -> weekly uniques = n,
    # sum of daily uniques ~ 3n
    rows = (spark.range(n).selectExpr(
        "id AS user_id", "explode(sequence(0, 2)) AS o")
        .selectExpr("user_id", "cast((user_id + o) % 7 as long) AS dia"))

    def merged_estimate(df):
        daily = df.groupBy("dia").agg(F.hll_sketch_agg("user_id").alias("sk"))
        return (daily.agg(F.hll_sketch_estimate(F.hll_union_agg("sk"))
                          .alias("est")).collect()[0]["est"])

    est1 = merged_estimate(rows)
    est2 = merged_estimate(rows.repartition(7, "user_id"))
    est3 = merged_estimate(rows.repartition(3, "dia"))
    assert est1 == est2 == est3, (est1, est2, est3)
    assert abs(est1 - n) <= 0.05 * n, est1


def test_quantile_histogram_sketch_merges_exactly(spark, sf_dir):
    """The quantile sketch's merge contract: per-shard fixed-bucket
    histograms summed bucket-wise must give EXACTLY the quantiles of
    the one-shot global histogram (integer adds — unlike HLL there is
    no merge error at all), for any shard split."""
    from collections import Counter

    from prac_data_pipelines_spark.queries.events import (
        QS_BUCKET_CENTS,
        q_events_quantile_sketch,
    )
    from prac_data_pipelines_spark.operators.timeops import epoch_sec  # noqa: F401
    from prac_data_pipelines_spark.sources import load_table
    from pyspark.sql import functions as F

    ev = (load_table(spark, sf_dir, "events")
          .selectExpr("event_id", "event_type",
                      "cast(floor(value * 100 + 0.5) as bigint) AS c")
          .collect())

    def quantiles_from_hist(hist: Counter, n: int):
        out = []
        for num, den in ((1, 2), (19, 20), (99, 100)):
            rank = (num * n + den - 1) // den
            cum = 0
            for b in sorted(hist):
                cum += hist[b]
                if cum >= rank:
                    out.append(b * QS_BUCKET_CENTS + QS_BUCKET_CENTS - 1)
                    break
        return out

    # shard 3 ways by event_id, build per-shard hists, merge by summing
    by_type_merged: dict[str, Counter] = {}
    by_type_n: dict[str, int] = {}
    for shard in range(3):
        for r in ev:
            if r["event_id"] % 3 != shard:
                continue
            h = by_type_merged.setdefault(r["event_type"], Counter())
            h[r["c"] // QS_BUCKET_CENTS] += 1
            by_type_n[r["event_type"]] = by_type_n.get(r["event_type"], 0) + 1

    got = {r["event_type"]: (r["p50_aprox"], r["p95_aprox"], r["p99_aprox"])
           for r in q_events_quantile_sketch(spark, sf_dir).collect()}
    for t, hist in by_type_merged.items():
        assert tuple(quantiles_from_hist(hist, by_type_n[t])) == got[t], t
