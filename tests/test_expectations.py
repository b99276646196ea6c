"""Expectations operator: one-pass row rules, uniqueness, referential
integrity, and the gate barrier."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_row_rules_single_pass_and_counts(spark, sf_dir):
    from prac_data_pipelines_spark.operators.expectations import check_rows
    from prac_data_pipelines_spark.sources import load_table

    orders = load_table(spark, sf_dir, "orders")
    rep = check_rows(orders, {
        "orderkey_not_null": F.col("o_orderkey").isNotNull(),
        "price_positive": F.col("o_totalprice") > 0,
        "status_known": F.col("o_orderstatus").isin("O", "F", "P"),
        "never_true": F.lit(False),
    })
    got = {r.regla: (r.violaciones, r.total) for r in rep.collect()}
    n = orders.count()
    assert got["orderkey_not_null"] == (0, n)
    assert got["price_positive"] == (0, n)
    assert got["status_known"] == (0, n)
    assert got["never_true"] == (n, n)
    # single aggregation pass: exactly one Aggregate pair, no join
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_unique_and_references(spark, sf_dir):
    from prac_data_pipelines_spark.operators.expectations import (
        check_references,
        check_unique,
    )
    from prac_data_pipelines_spark.sources import load_table

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")

    uniq = check_unique(orders, ["o_orderkey"]).collect()[0]
    assert uniq.violaciones == 0

    dup = orders.unionByName(orders.limit(5))
    assert check_unique(dup, ["o_orderkey"]).collect()[0].violaciones == 5

    ref = check_references(orders, "o_custkey", cust, "c_custkey").collect()[0]
    assert ref.violaciones == 0

    broken = orders.withColumn(
        "o_custkey", F.when(F.col("o_orderkey") % 100 == 0, F.lit(-1))
        .otherwise(F.col("o_custkey")))
    bad = check_references(broken, "o_custkey", cust, "c_custkey").collect()[0]
    assert bad.violaciones == broken.filter("o_custkey = -1").count()


def test_gate_raises_on_violations(spark, sf_dir):
    from prac_data_pipelines_spark.operators.expectations import (
        check_rows,
        gate,
    )
    from prac_data_pipelines_spark.sources import load_table

    orders = load_table(spark, sf_dir, "orders")
    ok = check_rows(orders, {"never_null": F.col("o_orderkey").isNotNull()})
    gate(ok)  # no raise
    bad = check_rows(orders, {"always_false": F.lit(False)})
    with pytest.raises(ValueError, match="always_false"):
        gate(ok, bad)


def _collect_counting_jobs(spark, rep, group):
    sc = spark.sparkContext
    sc.setJobGroup(group, group)
    rows = rep.collect()
    sc.setJobGroup(None, None)
    return rows, len(sc.statusTracker().getJobIdsForGroup(group))


def test_check_all_single_job_gate(spark, sf_dir):
    """The fused gate is ONE aggregation over the gated frame: the frame is
    scanned once per plan branch and the Spark-JOB count is CONSTANT in the
    number of rules (the pre-fusion shape ran count()+agg per
    unique/reference rule, so jobs scaled with the rule list).

    "One aggregation" is deliberately NOT "one job": under AQE every
    materialized query stage runs as its own job. Measured inventory for
    this fixture (all from the single collect): the union's limit branch,
    the broadcast-dim distinct build, the distinct-expand shuffle map
    stages, and the final reduce — 6 jobs, independent of rule count. The
    constancy assertion below is the contract; the absolute ceiling only
    guards against reintroducing per-rule actions."""
    from prac_data_pipelines_spark.operators.expectations import check_all
    from prac_data_pipelines_spark.sources import load_table

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    dup = orders.unionByName(orders.limit(5))
    broken = dup.withColumn(
        "o_custkey", F.when(F.col("o_orderkey") % 100 == 0, F.lit(-1))
        .otherwise(F.col("o_custkey")))

    rep = check_all(
        broken,
        rules={"price_positive": F.col("o_totalprice") > 0,
               "never_true": F.lit(False)},
        unique=["o_orderkey", ["o_orderkey", "o_custkey"]],
        references=[("o_custkey", cust, "c_custkey")],
    )
    rows, n_jobs = _collect_counting_jobs(spark, rep, "gate-fused")

    rep_wide = check_all(
        broken,
        rules={f"r{i}": F.col("o_totalprice") > i for i in range(8)},
        unique=["o_orderkey", ["o_orderkey", "o_custkey"],
                ["o_custkey", "o_orderdate"], ["o_orderkey", "o_orderstatus"]],
        references=[("o_custkey", cust, "c_custkey")],
    )
    _, n_jobs_wide = _collect_counting_jobs(spark, rep_wide, "gate-fused-wide")

    assert n_jobs_wide == n_jobs, \
        f"job count must not scale with rules: {n_jobs} -> {n_jobs_wide}"
    assert n_jobs <= 8, f"fused gate ran {n_jobs} jobs (AQE stages + limit " \
        "branch + broadcast build should stay <=8)"

    got = {r.regla: r.violaciones for r in rows}
    n = broken.count()
    n_orphan = broken.filter("o_custkey = -1").count()
    assert {r.total for r in rows} == {n}
    assert got["price_positive"] == 0
    assert got["never_true"] == n
    assert got["unique_o_orderkey"] == 5
    assert got["unique_o_orderkey_o_custkey"] == 5
    assert got["ref_o_custkey"] == n_orphan


def test_check_all_matches_per_family_checks(spark, sf_dir):
    from prac_data_pipelines_spark.operators.expectations import (
        check_all,
        check_references,
        check_unique,
    )
    from prac_data_pipelines_spark.sources import load_table

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    fused = {r.regla: r.violaciones
             for r in check_all(orders, unique=["o_orderkey"],
                                references=[("o_custkey", cust, "c_custkey")]
                                ).collect()}
    assert fused["unique_o_orderkey"] == \
        check_unique(orders, ["o_orderkey"]).collect()[0].violaciones
    assert fused["ref_o_custkey"] == \
        check_references(orders, "o_custkey", cust,
                         "c_custkey").collect()[0].violaciones
