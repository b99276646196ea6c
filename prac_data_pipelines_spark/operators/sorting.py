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
                     pos_col: str = "pos",
                     materialize: bool = False) -> DataFrame:
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

    ``materialize=True`` additionally ``localCheckpoint``s the ranged
    frame so the input subtree upstream of the exchange is computed
    exactly once even when per-branch column pruning makes the
    exchanges non-identical (which defeats ReusedExchange). Opt-in per
    call site — see ``pareto_abc``'s note.
    """
    ranged = df.repartitionByRange(*keys).withColumn(
        "_pid", F.spark_partition_id())
    if materialize:
        ranged = ranged.localCheckpoint()
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


def grouped_positions(df: DataFrame, group_cols: list[str],
                      order_keys: list[Column], pos_col: str = "pos",
                      n_col: str | None = None,
                      cum_of: Column | None = None, cum_col: str = "cum",
                      total_col: str | None = None,
                      materialize: bool = False) -> DataFrame:
    """Per-GROUP 1-based rank under a total order — without a
    ``Window.partitionBy(group)`` whose parallelism is capped at
    \\|groups\\| (one dominant group = one task at any data size).

    The two-level ``global_positions`` idiom, keyed by group:

    1. ``repartitionByRange(group, *order)`` — each group's rows land in
       order across one or MORE partitions (a huge group spans many);
    2. local ``row_number`` per (partition, group) — rows of a group
       inside a partition are contiguous and ordered by construction;
    3. per-(partition, group) counts prefix-summed via a triangular
       broadcast join (\\|partitions x groups-touching-them\\| rows, never
       data-sized) give each partition's starting offset within its
       group.

    ``order_keys`` must totally order rows WITHIN a group (unique
    tiebreaker). With ``n_col``, the group's total row count is attached
    from a broadcast of the same per-partition counts (no second scan).

    With ``cum_of``, the same machinery also produces the per-group
    RUNNING SUM of that value (as ``cum_col``; group grand total as
    ``total_col``) — the grouped form of ``pareto_abc``'s two-level
    cumsum. Exact for integral values (offsets re-associate the sum,
    which only matters for floats — see pareto_abc's regrouping note).

    ``materialize=True`` ``localCheckpoint``s the ranged frame: the
    counts/offsets/totals branches otherwise re-execute the input
    subtree up to four times (per-branch column pruning defeats
    exchange reuse). Opt-in per call site — see ``pareto_abc``'s note.
    """
    keys = [F.col(c).asc() for c in group_cols] + order_keys
    ranged = df.repartitionByRange(*keys).withColumn(
        "_pid", F.spark_partition_id())
    if cum_of is not None:
        ranged = ranged.withColumn("_val", cum_of)
    if materialize:
        ranged = ranged.localCheckpoint()
    wloc = Window.partitionBy("_pid", *group_cols).orderBy(*order_keys)
    local = ranged.withColumn("_lrn", F.row_number().over(wloc))
    aggs = [F.count(F.lit(1)).alias("_cnt")]
    if cum_of is not None:
        local = local.withColumn(
            "_lcum", F.sum("_val").over(
                wloc.rowsBetween(Window.unboundedPreceding,
                                 Window.currentRow)))
        aggs.append(F.sum("_val").alias("_vs"))
    counts = ranged.groupBy("_pid", *group_cols).agg(*aggs)
    bcols = [F.col("_pid").alias("_bpid"), F.col("_cnt").alias("_bcnt")]
    if cum_of is not None:
        bcols.append(F.col("_vs").alias("_bvs"))
    earlier = counts.select(
        *bcols, *[F.col(c).alias(f"_bg_{c}") for c in group_cols])
    before = F.col("_bpid") < F.col("_pid")
    for c in group_cols:
        before = before & (F.col(f"_bg_{c}") == F.col(c))
    offs = [F.coalesce(F.sum("_bcnt"), F.lit(0)).alias("_off")]
    if cum_of is not None:
        offs.append(F.coalesce(F.sum("_bvs"), F.lit(0)).alias("_voff"))
    offsets = (counts.join(F.broadcast(earlier), before, "left")
               .groupBy("_pid", *group_cols).agg(*offs))
    out = (local.join(F.broadcast(offsets), ["_pid", *group_cols])
           .withColumn(pos_col,
                       (F.col("_off") + F.col("_lrn")).cast("long")))
    if cum_of is not None:
        out = out.withColumn(cum_col, F.col("_voff") + F.col("_lcum"))
    if n_col is not None or total_col is not None:
        taggs = []
        if n_col is not None:
            taggs.append(F.sum("_cnt").cast("long").alias(n_col))
        if total_col is not None:
            taggs.append(F.sum("_vs").alias(total_col))
        totals = counts.groupBy(*group_cols).agg(*taggs)
        out = out.join(F.broadcast(totals), list(group_cols))
    drop = ["_pid", "_lrn", "_off"]
    if cum_of is not None:
        drop += ["_val", "_lcum", "_voff", "_vs"]
    return out.drop(*drop)


def global_running_max(df: DataFrame, keys: list[Column], value_col: str,
                       out_col: str = "runmax",
                       materialize: bool = False) -> DataFrame:
    """Global running MAX of ``value_col`` under a total order — the
    prefix-max sibling of ``global_positions``, with the same plan shape
    (no ``Exchange SinglePartition``):

    1. ``repartitionByRange`` on the order keys;
    2. local running max per partition;
    3. per-partition maxima prefix-combined via the triangular broadcast
       join (\\|partitions\\| rows) and merged with ``greatest``.

    Unlike a sum, max needs no re-association caveat — it is exact for
    any type with a total order. ``keys`` must totally order the rows
    for a deterministic result.

    ``materialize=True`` ``localCheckpoint``s the ranged frame (the
    local/pmax/earlier branches otherwise re-execute the input subtree;
    see ``pareto_abc``'s note). Opt-in per call site.
    """
    ranged = df.repartitionByRange(*keys).withColumn(
        "_pid", F.spark_partition_id())
    if materialize:
        ranged = ranged.localCheckpoint()
    wloc = (Window.partitionBy("_pid").orderBy(*keys)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    local = ranged.withColumn("_lmax", F.max(value_col).over(wloc))
    pmax = ranged.groupBy("_pid").agg(F.max(value_col).alias("_pm"))
    earlier = pmax.select(F.col("_pid").alias("_bpid"),
                          F.col("_pm").alias("_bpm"))
    offsets = (pmax.join(F.broadcast(earlier),
                         F.col("_bpid") < F.col("_pid"), "left")
               .groupBy("_pid").agg(F.max("_bpm").alias("_off")))
    return (local.join(F.broadcast(offsets), "_pid")
            .withColumn(out_col,
                        F.greatest(F.col("_lmax"),
                                   F.coalesce(F.col("_off"),
                                              F.col("_lmax"))))
            .drop("_pid", "_lmax", "_off"))
