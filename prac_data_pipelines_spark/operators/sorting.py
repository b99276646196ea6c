"""Stratified ("dual") sort.

Reference pattern (``src/analytics.py:238-242``, ``src/kpis.py:126-130``):
rows with balance > 0 ordered by balance descending, then rows with
balance <= 0 ordered by name ascending, concatenated. Spark-first: a single
``orderBy`` over computed keys — no union of two sorted halves, one shuffle,
fully parallel range-partitioned sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dual_sort_keys(amount: Column, name: Column) -> list[Column]:
    """Sort keys implementing the stratified sort as one total order."""
    in_tail = (amount <= 0) | amount.isNull()
    return [
        in_tail.cast("int").asc(),            # head stratum first
        F.when(~in_tail, -amount).asc(),       # head: amount desc
        F.when(in_tail, name).asc_nulls_last() # tail: name asc
    ]


def global_positions(df: DataFrame, keys: list[Column],
                     pos_col: str = "pos") -> DataFrame:
    """Global 1-based position under a total order — without the
    single-task collapse of ``row_number() OVER (ORDER BY ...)``.

    Plan shape (every stage parallel, no ``Exchange SinglePartition``):

    1. ``repartitionByRange`` on the sort keys — ordered ranges land in
       increasing partition ids.
    2. Local ``row_number`` partitioned by ``spark_partition_id()``.
    3. Per-partition counts prefix-summed via a triangular broadcast join
       (|partitions| rows, never the data), broadcast back, and added to
       the local rank.

    The range exchange is reused across the count/offset branches
    (ReusedExchange), so the input is shuffled once. ``keys`` must be a
    total order (include a unique tiebreaker) for deterministic output.
    """
    ranged = df.repartitionByRange(*keys).withColumn(
        "_pid", F.spark_partition_id())
    local = ranged.withColumn(
        "_lrn", F.row_number().over(Window.partitionBy("_pid").orderBy(*keys)))
    counts = local.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
    earlier = counts.select(F.col("_pid").alias("_bpid"),
                            F.col("_cnt").alias("_bcnt"))
    offsets = (counts.join(F.broadcast(earlier),
                           F.col("_bpid") < F.col("_pid"), "left")
               .groupBy("_pid")
               .agg(F.coalesce(F.sum("_bcnt"), F.lit(0)).alias("_off")))
    return (local.join(F.broadcast(offsets), "_pid")
            .withColumn(pos_col, (F.col("_off") + F.col("_lrn")).cast("long"))
            .drop("_pid", "_lrn", "_off"))
