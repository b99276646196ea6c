"""Data-quality expectations: declarative rules checked in one pass.

Generalizes the reference's null audit (``src/analytics.py`` null counts;
re-expressed here as P9/`cxc_auditoria_nulos`) into the standard
expectations surface a production pipeline gates on:

- row rules (not-null, range, set membership, regex …) — ALL evaluated in
  ONE aggregation pass over the frame: each rule is a conditional sum, so
  ten rules cost the same scan as one.
- ``unique`` rules — each needs its own keyed aggregation (a shuffle per
  rule; there is no single-pass distributed uniqueness check).
- ``references`` rules — left-anti join against the referenced dimension
  (broadcast when small).

Returns a tidy (regla, violaciones, total) frame; ``gate()`` raises when
any rule fails, for use as a pipeline barrier.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def check_rows(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Evaluate row-level rules in one aggregation pass. ``rules`` maps a
    rule name to a BOOLEAN Column that is True when the row SATISFIES the
    rule; violations are counted with null treated as a violation."""
    total = F.count(F.lit(1))
    aggs = [total.cast("long").alias("_total")]
    for name, cond in rules.items():
        aggs.append(
            F.sum(F.when(~F.coalesce(cond, F.lit(False)), 1).otherwise(0))
            .cast("long").alias(name))
    row = df.agg(*aggs)
    stacked = ", ".join(f"'{n}', {n}" for n in rules)
    return (row.selectExpr(
        "_total", f"stack({len(rules)}, {stacked}) AS (regla, violaciones)")
        .select("regla", "violaciones", F.col("_total").alias("total")))


def check_unique(df: DataFrame, cols: list[str],
                 name: str | None = None) -> DataFrame:
    """Violations = rows beyond the first per key (0 when key is unique)."""
    name = name or ("unique_" + "_".join(cols))
    total = df.count()
    dupes = (df.groupBy(*cols).agg(F.count(F.lit(1)).alias("_n"))
             .agg(F.coalesce(F.sum(F.col("_n") - 1), F.lit(0))
                  .cast("long").alias("violaciones"))
             .withColumn("regla", F.lit(name))
             .withColumn("total", F.lit(total).cast("long")))
    return dupes.select("regla", "violaciones", "total")


def check_references(df: DataFrame, col: str, dim: DataFrame,
                     dim_col: str, name: str | None = None) -> DataFrame:
    """Referential integrity: rows whose ``col`` has no match in the
    dimension. The dimension side broadcasts."""
    name = name or f"ref_{col}"
    total = df.count()
    orphans = (df.select(col)
               .join(broadcast(dim.select(F.col(dim_col).alias(col))),
                     col, "left_anti")
               .count())
    spark = df.sparkSession
    return spark.createDataFrame(
        [(name, orphans, total)], "regla string, violaciones long, total long")


def gate(*reports: DataFrame) -> None:
    """Raise if any rule reports violations (pipeline barrier)."""
    bad = []
    for rep in reports:
        bad += [(r["regla"], r["violaciones"])
                for r in rep.filter(F.col("violaciones") > 0).collect()]
    if bad:
        raise ValueError(f"expectations failed: {bad}")
