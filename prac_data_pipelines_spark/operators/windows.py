"""Order-dependent operators: running balances, Pareto/ABC, presentation bands.

Determinism rule (SURVEY §4.1): every window ordering carries a unique final
tiebreaker key so cumulative results are stable under any partitioning — the
reference relies on incidental pandas row order, which a distributed engine
must never do.

Scale notes:
- ``running_balance`` partitions by the business key → fully parallel.
- ``pareto_abc`` is a global-ordered cumsum over an already-aggregated frame
  (one row per customer); cardinality = |customers|, collected output is
  report-sized. The aggregation below it is the scalable part.
- ``band_groups`` is a presentation-layer contract (alternating 0/1 Excel
  banding); it needs a total order, so it is only applied to final
  report-sized frames, partitioned by the leading sort key (groups never span
  a partition key by construction).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..config import ABC_UMBRAL_A, ABC_UMBRAL_B
from .rounding import r6, rn
from .timeops import epoch_sec


def running_balance(df: DataFrame, partition_by: list[str], order_by: list[Column],
                    signed_amount: Column, out_col: str = "SALDO_ACUMULADO",
                    round_to: int = 2) -> DataFrame:
    """Per-key running sum of a signed amount in a total order.

    Reference: ``SALDO_CLIENTE`` grouped cumsum (``src/reporte_cxc.py:362-373``):
    charges add, credits subtract, running per customer.
    """
    w = (Window.partitionBy(*partition_by).orderBy(*order_by)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return df.withColumn(out_col, rn(F.sum(signed_amount).over(w), round_to))


def pareto_abc(df: DataFrame, amount_col: str, key_order: list[Column] | None = None,
               pct_col: str = "PCT", cum_col: str = "PCT_ACUMULADO",
               abc_col: str = "CLASIFICACION_ABC",
               materialize: bool = False) -> DataFrame:
    """Cumulative-share Pareto with ABC classes over rows sorted by amount desc.

    Reference: ``src/kpis.py:124-151`` — pct of total, running cumulative pct
    (last row forced to 1.0 by construction of the sum), ABC ladder
    ``<=80% → A`` (first row always A), ``<=95% → B``, else ``C``.

    Two-level cumsum (same shape as ``operators.sorting.global_positions``)
    — no single-partition window at ANY input size, fully declarative:

    1. range-partition the rows in the total order (amount desc +
       tiebreakers) — ordered ranges land in increasing partition ids;
    2. each partition computes its LOCAL running sum / row_number in
       parallel (window partitioned by the range-partition id);
    3. per-partition (sum, count) — |partitions| rows, never data-sized —
       are prefix-summed via a triangular broadcast join and broadcast
       back as offsets; cum = (offset + local) / total.

    Float regrouping note: the offsets re-associate the running float sum
    (offset + local instead of strictly sequential). The drift is a few
    ulps of 1.0 (~1e-15) — three orders below the r6 rounding quantum,
    and DuckDB's window sum is itself segment-tree-associated, so strict
    sequential equality was never the contract. Verified by the oracle
    gate and the partition-count determinism sweep. The LAST row is the
    one value whose true cumulative share is known exactly (1.0 — the
    reference forces it by construction, ``src/kpis.py:135``), so it is
    pinned rather than summed: no association order can push it across a
    rounding quantum (ADVICE r5).

    ``materialize=True`` cuts the fan-out recompute: the ranged frame
    feeds THREE plan branches (local window, per-partition stats, and
    the stats' triangular self-join), and Spark re-executes the input
    subtree for each branch it cannot reuse at runtime. A
    ``localCheckpoint`` of the (already per-key-aggregated, narrow)
    ranked frame computes the upstream exactly once and truncates the
    plan (guide: materializing an intermediate truncates the plan;
    localCheckpoint when fault tolerance of the intermediate is not
    critical). Opt-in per call site: worth it when the input subtree is
    expensive (joins/aggregation), a wash for a bare scan.
    """
    order = [F.col(amount_col).desc()] + (key_order or [])
    ranged = (df.repartitionByRange(*order)
              .withColumn("_pid", F.spark_partition_id()))
    if materialize:
        ranged = ranged.localCheckpoint()
    wloc = Window.partitionBy("_pid").orderBy(*order)
    wcum = wloc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    local = (ranged
             .withColumn("_lcum", F.sum(amount_col).over(wcum))
             .withColumn("_lrn", F.row_number().over(wloc)))
    stats = (ranged.groupBy("_pid")
             .agg(F.sum(amount_col).alias("_s"),
                  F.count(F.lit(1)).alias("_c")))
    earlier = stats.select(F.col("_pid").alias("_bpid"),
                           F.col("_s").alias("_bs"),
                           F.col("_c").alias("_bc"))
    # |partitions| x |partitions| cross of the TINY stats frame computes the
    # prefix offsets AND the grand total in one groupBy — no global scalar
    # aggregate, so the whole plan is free of SinglePartition exchanges.
    before = F.col("_bpid") < F.col("_pid")
    offsets = (stats.crossJoin(F.broadcast(earlier))
               .groupBy("_pid")
               .agg(F.coalesce(F.sum(F.when(before, F.col("_bs"))),
                               F.lit(0.0)).alias("_aoff"),
                    F.coalesce(F.sum(F.when(before, F.col("_bc"))),
                               F.lit(0)).alias("_coff"),
                    F.sum("_bs").alias("_tot"),
                    F.sum("_bc").alias("_nall")))
    # null-out shares when the grand total is 0 (ANSI division guard;
    # a zero/empty portfolio has no meaningful percentage-of-total)
    tot = F.when(F.col("_tot") != 0, F.col("_tot"))
    out = (local.join(F.broadcast(offsets), "_pid")
           .withColumn(pct_col, r6(F.col(amount_col) / tot))
           .withColumn("_RN", F.col("_coff") + F.col("_lrn"))
           .withColumn(cum_col,
                       F.when((F.col("_RN") == F.col("_nall"))
                              & tot.isNotNull(), F.lit(1.0))
                        .otherwise(r6((F.col("_aoff") + F.col("_lcum")) / tot))))
    cum100 = F.col(cum_col) * 100
    abc = (F.when(F.col("_RN") == 1, "A")
             .when(cum100 <= ABC_UMBRAL_A, "A")
             .when(cum100 <= ABC_UMBRAL_B, "B")
             .otherwise("C"))
    return (out.withColumn(abc_col, abc)
            .drop("_RN", "_pid", "_lcum", "_lrn", "_aoff", "_coff", "_tot",
                  "_nall"))


def sharded_range_window(df: DataFrame, partition_cols: list[str], ts_col: str,
                         range_seconds: int,
                         window_cols: dict[str, "Callable[[Window], Column]"],
                         bucket_seconds: int | None = None) -> DataFrame:
    """Trailing time-RANGE window whose parallelism scales with TIME, not
    with the partition-key cardinality.

    A plain ``Window.partitionBy(key).rangeBetween(-R, 0)`` bounds
    parallelism at ``|key|`` — with single-digit event types, one hot type
    is one task at any data size. This operator shards each key by time
    bucket and heals the boundary with overlap rows:

    1. every row goes to its home shard ``(key, floor(sec / bucket))``;
    2. rows in the trailing ``range_seconds`` of a bucket are ALSO copied
       into the next shard as context-only rows (``_home = false``) — a
       single-scan ``explode`` of 1-or-2 shard entries, not a self-union;
    3. the RANGE window runs per ``(key, bucket)`` shard — every home row
       sees its complete trailing window because ``bucket >= range``
       guarantees the window never reaches past the previous bucket;
    4. context rows are dropped after the window computes.

    Cost: duplicated fraction = ``range/bucket`` (default 1/7 with weekly
    buckets over a 24 h window); parallelism = ``|key| x |buckets|``.
    ``window_cols`` maps output column name -> ``lambda w: <expr>.over(w)``.
    """
    exploded = _shard_explode(df, ts_col, range_seconds, bucket_seconds)
    w = (Window.partitionBy(*partition_cols, "_bucket")
         .orderBy("_sec").rangeBetween(-range_seconds, 0))
    out = exploded
    for name, fn in window_cols.items():
        out = out.withColumn(name, fn(w))
    return out.filter(F.col("_home")).drop("_home", "_bucket", "_sec")


def _shard_explode(df: DataFrame, ts_col: str, range_seconds: int,
                   bucket_seconds: int | None) -> DataFrame:
    """Shared shard fan-out for the time-sharded window operators: adds
    ``_sec`` (epoch seconds), ``_bucket`` (home or carried shard) and
    ``_home``; rows in the trailing ``range_seconds`` of a bucket are
    duplicated into the next shard as context-only rows."""
    bucket_seconds = int(bucket_seconds or 7 * range_seconds)
    if bucket_seconds < range_seconds:
        raise ValueError("bucket_seconds must be >= range_seconds "
                         "(the overlap only carries one bucket back)")
    sec = epoch_sec(ts_col)
    base = (df.withColumn("_sec", sec)
              .withColumn("_bucket",
                          F.floor(F.col("_sec") / bucket_seconds).cast("long")))
    near_edge = (F.col("_sec")
                 >= (F.col("_bucket") + 1) * bucket_seconds - range_seconds)
    home = F.struct(F.col("_bucket").alias("b"), F.lit(True).alias("h"))
    carry = F.struct((F.col("_bucket") + 1).alias("b"),
                     F.lit(False).alias("h"))
    shards = F.when(near_edge, F.array(home, carry)).otherwise(F.array(home))
    return (base.withColumn("_shard", F.explode(shards))
            .withColumn("_bucket", F.col("_shard.b"))
            .withColumn("_home", F.col("_shard.h"))
            .drop("_shard"))


def sharded_trailing_count_avg(df: DataFrame, partition_cols: list[str],
                               ts_col: str, range_seconds: int,
                               count_col: str, avg_col: str, value_col: str,
                               bucket_seconds: int | None = None) -> DataFrame:
    """Trailing time-RANGE ``count(*)`` + ``avg(value)`` via two
    INCREMENTAL prefix frames instead of one sliding frame.

    Spark's ``SlidingWindowFunctionFrame`` re-aggregates the ENTIRE frame
    buffer for every output row (aggregate functions have no retraction),
    so ``count/avg OVER (RANGE BETWEEN R PRECEDING AND CURRENT ROW)``
    costs O(rows x frame-size) per shard — at sf0.1 the 24 h frame
    averages ~655 events, and frame size grows linearly with event
    density, making the sliding frame quadratic in scale overall. Frames
    anchored at ``UNBOUNDED PRECEDING`` are evaluated incrementally
    (``UnboundedPrecedingWindowFunctionFrame`` only ever ADDS rows), and
    count/sum are subtractable, so the same result is a difference of two
    running frames computed in ONE WindowExec over ONE sort:

        frame [t-R, t]  =  [unbounded, t]  minus  [unbounded, t-R-1]

    (``_sec`` is integer epoch seconds, so ``-(R+1)`` is exact; RANGE
    frames include all order-value peers on both sides of the
    subtraction, so tie groups cancel exactly.) Exact for the count; the
    avg differs only in float-accumulation grouping (prefix-sum
    difference vs per-frame sum), which the oracle gate verifies
    hash-identical at every SF and under the determinism sweeps.

    Same sharding contract as ``sharded_range_window``: parallelism
    scales with |keys| x |time buckets|, boundary healed by overlap rows.
    """
    exploded = _shard_explode(df, ts_col, range_seconds, bucket_seconds)
    base = Window.partitionBy(*partition_cols, "_bucket").orderBy("_sec")
    w_now = base.rangeBetween(Window.unboundedPreceding, Window.currentRow)
    w_past = base.rangeBetween(Window.unboundedPreceding,
                               -(int(range_seconds) + 1))
    v = F.col(value_col)
    n = (F.count(F.lit(1)).over(w_now)
         - F.count(F.lit(1)).over(w_past)).cast("long")
    # materialize the value-count/sum differences as columns BEFORE the
    # avg expression references them twice: window expressions are
    # extracted per OCCURRENCE, so inlining n_vals in both the guard and
    # the divisor would evaluate count(value) over each frame twice
    out = (exploded
           .withColumn(count_col, n)
           .withColumn("_nv", F.count(v).over(w_now) - F.count(v).over(w_past))
           .withColumn("_sv", F.coalesce(F.sum(v).over(w_now), F.lit(0.0))
                       - F.coalesce(F.sum(v).over(w_past), F.lit(0.0))))
    # empty-value frame -> NULL, matching avg() over a frame with no
    # non-null values (the home row itself may carry a NULL value)
    avg_vals = F.when(F.col("_nv") > 0, F.col("_sv") / F.col("_nv"))
    return (out.withColumn(avg_col, avg_vals)
            .filter(F.col("_home"))
            .drop("_home", "_bucket", "_sec", "_nv", "_sv"))


def band_groups(df: DataFrame, group_key: Column, order_by: list[Column],
                partition_by: list[str] | None = None,
                out_col: str = "_BAND_GROUP") -> DataFrame:
    """Alternating 0/1 band index per run of equal ``group_key`` in sort order.

    Reference: Excel row banding of charge+its-payments groups
    (``src/reporte_cxc.py:442-462``): flag group changes with a lag, running
    count of changes mod 2.
    """
    part = partition_by or []
    w = Window.partitionBy(*part).orderBy(*order_by)
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    changed = (group_key != F.lag(group_key).over(w)) | F.lag(group_key).over(w).isNull()
    return df.withColumn(out_col, (F.sum(changed.cast("int")).over(wc) % 2).cast("int"))
