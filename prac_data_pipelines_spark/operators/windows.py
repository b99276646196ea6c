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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..config import ABC_UMBRAL_A, ABC_UMBRAL_B
from .rounding import r6, rn


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
               abc_col: str = "CLASIFICACION_ABC") -> DataFrame:
    """Cumulative-share Pareto with ABC classes over rows sorted by amount desc.

    Reference: ``src/kpis.py:124-151`` — pct of total, running cumulative pct
    (last row forced to 1.0 by construction of the sum), ABC ladder
    ``<=80% → A`` (first row always A), ``<=95% → B``, else ``C``.
    """
    total = F.sum(F.col(amount_col)).over(Window.partitionBy())
    order = [F.col(amount_col).desc()] + (key_order or [])
    w = (Window.orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    pct = F.col(amount_col) / total
    out = (df.withColumn(pct_col, r6(pct))
             .withColumn(cum_col, r6(F.sum(pct).over(w)))
             .withColumn("_RN", F.row_number().over(Window.orderBy(*order))))
    cum100 = F.col(cum_col) * 100
    abc = (F.when(F.col("_RN") == 1, "A")
             .when(cum100 <= ABC_UMBRAL_A, "A")
             .when(cum100 <= ABC_UMBRAL_B, "B")
             .otherwise("C"))
    return out.withColumn(abc_col, abc).drop("_RN")


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
