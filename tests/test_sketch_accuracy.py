"""Accuracy bounds for the sketch query (approx distinct + approx
quantiles). Approximate values are engine-specific so sketch_profile has
no SQL oracle; THIS is its correctness check — every estimate must land
within a small relative error of the exact oracle-checked twin."""

from __future__ import annotations

from prac_data_pipelines_spark.queries import all_queries


def test_sketches_track_exact_values(spark, sf_dir):
    q = all_queries()
    sk = q["sketch_profile"](spark, sf_dir).collect()[0]
    exact_d = q["distinct_counts"](spark, sf_dir).collect()[0]
    exact_q = {r["l_returnflag"]: r
               for r in q["quantiles"](spark, sf_dir).collect()}

    def rel_err(approx, exact):
        return abs(approx - exact) / max(exact, 1)

    # HLL++ at rsd=0.01: generous 5% bound (catches wiring bugs, not noise)
    assert rel_err(sk["clientes_activos_aprox"],
                   exact_d["clientes_activos"]) < 0.05
    assert rel_err(sk["partes_vendidas_aprox"],
                   exact_d["partes_vendidas"]) < 0.05

    # approx_percentile at accuracy=10000 over the whole table vs the
    # per-flag exact quantiles: the global quantile must sit within the
    # min/max envelope of the per-group quantiles, within 5%
    p50s = [r["p50_precio"] for r in exact_q.values()]
    p90s = [r["p90_precio"] for r in exact_q.values()]
    assert min(p50s) * 0.95 <= sk["p50_precio_aprox"] <= max(p50s) * 1.05
    assert min(p90s) * 0.95 <= sk["p90_precio_aprox"] <= max(p90s) * 1.05
