"""Z-score enrichment and outlier flagging.

Reference semantics (``src/reporte_cxc.py:219-281``, ``src/auditor.py:173-265``):
for a metric column and an optional row-subset predicate, compute the subset's
mean and *sample* std (pandas ``.std()`` is ddof=1 → ``stddev_samp``), then
standardize each subset row: ``Z = round(abs((x - mean)/std), 4)``, flag
``Z >= threshold``. Guards: need ``n >= min_obs`` non-null observations and
``std > 0``, else the z columns stay null.

Scale note: the subset mean/std/count is computed as a one-row ``df.agg`` and
attached with ``crossJoin(broadcast(...))`` — a map-side-combined partial
aggregate plus a broadcast nested-loop join of a single row. An unpartitioned
window would instead funnel the whole frame through one task
(``Exchange SinglePartition``); this formulation keeps every stage parallel.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import ANOMALIAS
from .rounding import r4


def zscore_columns(df: DataFrame, metric: str, subset: Column | None = None,
                   z_col: str | None = None, flag_col: str | None = None,
                   threshold: float | None = None,
                   min_obs: int | None = None) -> DataFrame:
    """Append ``z_col`` (|z| rounded 4) and ``flag_col`` (boolean) for rows in
    ``subset``; rows outside the subset (or when guards fail) get nulls."""
    threshold = ANOMALIAS["Z_SCORE_UMBRAL"] if threshold is None else threshold
    min_obs = ANOMALIAS["MIN_OBSERVACIONES"] if min_obs is None else min_obs
    z_col = z_col or f"Z_{metric}"
    flag_col = flag_col or f"ES_ATIPICO_{metric}"

    member = F.lit(True) if subset is None else subset
    x = F.when(member, F.col(metric).cast("double"))
    stats = df.agg(
        F.avg(x).alias("__z_mean"),
        F.stddev_samp(x).alias("__z_std"),
        F.count(x).alias("__z_n"),
    )
    mean, std, n = F.col("__z_mean"), F.col("__z_std"), F.col("__z_n")
    ok = (n >= F.lit(min_obs)) & (std > F.lit(0))
    z = F.when(ok & member & x.isNotNull(), r4(F.abs((x - mean) / std)))
    return (df.crossJoin(F.broadcast(stats))
              .withColumn(z_col, z)
              .withColumn(flag_col, F.when(z.isNotNull(), z >= F.lit(threshold)))
              .drop("__z_mean", "__z_std", "__z_n"))
