"""Per-query time budgets over the headline bench set.

These are NOT micro-benchmarks — the host shows sporadic multi-second
stalls (SCALING.md), so the budgets are set an order of magnitude above
normal cost. What they catch is the catastrophic regression class: an
accidental cartesian product, a lost broadcast, a collapsed-to-one-task
stage — which turn a sub-second query into minutes and would otherwise
only surface in the driver's bench run.
"""

from __future__ import annotations

import time

import pytest

PER_QUERY_BUDGET_SEC = 60.0
TOTAL_BUDGET_SEC = 420.0


@pytest.fixture(scope="module")
def headline_timings(spark, sf_dir):
    import bench
    from prac_data_pipelines_spark.queries import all_queries

    queries = all_queries()
    # warm the JVM once so the first query doesn't absorb startup cost
    queries["pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite").save()
    timings = {}
    for name in bench.HEADLINE:
        t0 = time.time()
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = time.time() - t0
    return timings


def test_headline_queries_exist():
    import bench
    from prac_data_pipelines_spark.queries import all_queries

    missing = [n for n in bench.HEADLINE if n not in all_queries()]
    assert not missing, f"bench HEADLINE references unknown queries: {missing}"


def test_per_query_budget(headline_timings):
    over = {n: round(t, 1) for n, t in headline_timings.items()
            if t > PER_QUERY_BUDGET_SEC}
    assert not over, f"queries over {PER_QUERY_BUDGET_SEC}s budget: {over}"


def test_bench_isolates_a_broken_query(spark, sf_dir):
    """One failing query = one error entry; every other query still times.
    This property IS the bench gate's crash-proofing — round 3 lost its
    perf record to a single analysis error."""
    import bench
    from prac_data_pipelines_spark.queries import all_queries

    real = all_queries()

    def boom(_spark, _sf):
        raise RuntimeError("synthetic analysis failure")

    queries = {"pricing_summary": real["pricing_summary"], "broken": boom,
               "distinct_counts": real["distinct_counts"]}
    timings, errors = bench.run_queries(
        spark, queries, ["pricing_summary", "broken", "distinct_counts"],
        sf_dir, reps=1)
    assert set(timings) == {"pricing_summary", "distinct_counts"}
    assert set(errors) == {"broken"}
    assert "RuntimeError" in errors["broken"]


def test_calibration_anchor_runs(spark):
    """The host-speed anchor must complete under the session defaults —
    it broke once in development on ANSI-mode long overflow (sum of
    full-range hashes), which only surfaces at execution time."""
    import bench

    sec = bench.run_calibration(spark)
    assert sec > 0
    assert bench.CALIBRATION_REF_SEC > 0


def test_total_budget(headline_timings):
    total = sum(headline_timings.values())
    assert total <= TOTAL_BUDGET_SEC, (
        f"headline total {total:.1f}s exceeds {TOTAL_BUDGET_SEC}s — "
        f"slowest: {sorted(headline_timings.items(), key=lambda kv: -kv[1])[:5]}")
