"""Lake-layout sinks: partitioned and bucketed table writes.

At 100 TB the storage layout IS the query plan:

- ``write_partitioned`` — directory partitioning on low-cardinality keys
  (currency, date) so per-currency / per-day queries prune partitions at
  the scan instead of filtering rows.
- ``write_bucketed`` — hash bucketing on a join key. Two tables bucketed on
  the same key with the same bucket count join WITHOUT a shuffle (verified
  by the test: no Exchange above the scan in the physical plan). This is
  how the charges ⋈ payments join survives a 1000-executor deployment: the
  shuffle is paid once at write time, not on every query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str],
                      fmt: str = "parquet") -> None:
    (df.write.mode("overwrite")
     .partitionBy(*partition_cols)
     .format(fmt)
     .save(path))


def write_bucketed(df: DataFrame, table: str, bucket_col: str,
                   n_buckets: int = 16, sort_col: str | None = None) -> None:
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # A stale location without catalog metadata (e.g. an interrupted write)
    # blocks managed-table creation — clear it.
    import shutil
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{warehouse}/{table}", ignore_errors=True)
    writer = (df.write.mode("overwrite")
              .bucketBy(n_buckets, bucket_col))
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def bucketed_join_no_shuffle(spark: SparkSession, left_table: str,
                             right_table: str, key_left: str,
                             key_right: str) -> DataFrame:
    """Join two same-bucketed tables on their bucket keys. With matching
    bucket specs Spark plans a SortMergeJoin whose children read bucketed
    files directly — no shuffle Exchange. The merge hint keeps the planner
    from broadcasting a small side (which would hide the bucketing; at real
    scale neither side is broadcastable)."""
    left = spark.table(left_table).hint("merge")
    right = spark.table(right_table)
    return left.join(right, left[key_left] == right[key_right])
