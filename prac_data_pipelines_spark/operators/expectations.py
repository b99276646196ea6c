"""Data-quality expectations: declarative rules checked in one pass.

Generalizes the reference's null audit (``src/analytics.py`` null counts;
re-expressed here as P9/`cxc_auditoria_nulos`) into the standard
expectations surface a production pipeline gates on:

- row rules (not-null, range, set membership, regex …) — conditional sums;
- ``unique`` rules — ``count(*) - count(distinct struct(keys))`` (equal to
  the sum of per-key excess rows, with null keys grouping like groupBy);
- ``references`` rules — a broadcast left join adds a match flag per
  dimension, violations are a conditional sum over the flag.

``check_all`` fuses EVERY family into ONE aggregation over the gated
frame (round-3: previously each unique/reference rule ran its own
count()+agg jobs): the frame is scanned once and the Spark-job count is
constant in the number of rules. (It is not literally one JOB — under AQE
each materialized shuffle stage runs as its own job, and the broadcast
builds of the small reference dimensions add theirs; what matters at
scale is that none of that grows with the rule list.) The per-family
``check_rows`` / ``check_unique`` / ``check_references`` remain for
composing reports across different frames.

Returns a tidy (regla, violaciones, total) frame; ``gate()`` raises when
any rule fails, for use as a pipeline barrier.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def check_all(df: DataFrame,
              rules: dict[str, Column] | None = None,
              unique: list[list[str] | str] | None = None,
              references: list[tuple[str, DataFrame, str]] | None = None,
              ) -> DataFrame:
    """Evaluate every expectation family over ``df`` in ONE aggregation.

    ``rules`` maps rule name -> boolean Column (True = row satisfies);
    ``unique`` lists key columns (string or list per rule);
    ``references`` lists ``(col, dim, dim_col)`` referential checks —
    each dimension is deduplicated and broadcast, never shuffled.
    """
    rules = dict(rules or {})
    unique = [[u] if isinstance(u, str) else list(u) for u in (unique or [])]
    references = list(references or [])

    work = df
    ref_names: list[tuple[str, str]] = []
    for i, (col, dim, dim_col) in enumerate(references):
        flag = f"_ref_match_{i}"
        d = (dim.select(F.col(dim_col).alias(col)).distinct()
             .withColumn(flag, F.lit(1)))
        work = work.join(broadcast(d), col, "left")
        ref_names.append((f"ref_{col}", flag))

    names: list[str] = []
    aggs = [F.count(F.lit(1)).cast("long").alias("_total")]
    for name, cond in rules.items():
        aggs.append(
            F.sum(F.when(~F.coalesce(cond, F.lit(False)), 1).otherwise(0))
            .cast("long").alias(name))
        names.append(name)
    for cols in unique:
        name = "unique_" + "_".join(cols)
        aggs.append(
            (F.count(F.lit(1))
             - F.countDistinct(F.struct(*[F.col(c) for c in cols])))
            .cast("long").alias(name))
        names.append(name)
    for name, flag in ref_names:
        aggs.append(
            F.sum(F.when(F.col(flag).isNull(), 1).otherwise(0))
            .cast("long").alias(name))
        names.append(name)

    row = work.agg(*aggs)
    stacked = ", ".join(f"'{n}', `{n}`" for n in names)
    return (row.selectExpr(
        "_total", f"stack({len(names)}, {stacked}) AS (regla, violaciones)")
        .select("regla", "violaciones", F.col("_total").alias("total")))


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
