"""Z-score enrichment and outlier flagging.

Reference semantics (``src/reporte_cxc.py:219-281``, ``src/auditor.py:173-265``):
for a metric column and an optional row-subset predicate, compute the subset's
mean and *sample* std (pandas ``.std()`` is ddof=1 → ``stddev_samp``), then
standardize each subset row: ``Z = round(abs((x - mean)/std), 4)``, flag
``Z >= threshold``. Guards: need ``n >= min_obs`` non-null observations and
``std > 0``, else the z columns stay null.

Spark-first: the mean/std are a global aggregate broadcast back via an
unpartitioned window — one pass, no driver round-trip, no crossJoin shuffle
(Catalyst plans the empty-frame window as a single-stage broadcast of the
aggregate, and the subset predicate stays pushdown-eligible).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
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
    w = Window.partitionBy()  # global stats, broadcast back to every row
    mean = F.avg(x).over(w)
    std = F.stddev_samp(x).over(w)
    n = F.count(x).over(w)
    ok = (n >= F.lit(min_obs)) & (std > F.lit(0))
    z = F.when(ok & member & x.isNotNull(), r4(F.abs((x - mean) / std)))
    return (df.withColumn(z_col, z)
              .withColumn(flag_col, F.when(z.isNotNull(), z >= F.lit(threshold))))
