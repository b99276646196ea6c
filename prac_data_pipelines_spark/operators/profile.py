"""Column-profile (data-quality) aggregation: one output row per column.

Reference: ``src/auditor.py:349-376`` loops over columns computing nulls,
distinct count, pct-null, dtype. Spark-first: ONE wide aggregation over all
columns (single scan, map-side combined) then an unpivot via ``stack`` —
never one job per column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .rounding import r2


def column_profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Return (columna, tipo, nulos, pct_nulos, valores_unicos, total_filas)."""
    cols = cols or df.columns
    dtypes = dict(df.dtypes)
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"_null_{c}"))
        aggs.append(F.countDistinct(F.col(c)).alias(f"_dist_{c}"))
    wide = df.agg(*aggs)

    stack_args = ", ".join(
        f"'{c}', '{dtypes[c]}', _null_{c}, _dist_{c}" for c in cols
    )
    stacked = wide.selectExpr(
        "_n as total_filas",
        f"stack({len(cols)}, {stack_args}) as (columna, tipo, nulos, valores_unicos)",
    )
    return stacked.select(
        "columna", "tipo", "nulos",
        r2(F.col("nulos") / F.col("total_filas") * 100).alias("pct_nulos"),
        "valores_unicos", "total_filas",
    )
