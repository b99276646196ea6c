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
