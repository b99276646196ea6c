"""Config-driven bucketing compiled to a single CASE chain.

The reference implements each bucket ladder as a hand-written ``np.select``
block (``src/reporte_cxc.py:402-433``, ``src/analytics.py:113-127``,
``src/kpis.py:207-214``); here one compiler turns any ``(lo, hi, label)`` list
into a ``F.when`` chain that stays inside whole-stage codegen — no Python in
the row path, fully pushdown-friendly.

Bucket semantics: value in bucket iff ``lo < value <= hi`` (``None`` = open
end). Evaluated in declaration order, first match wins.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

Buckets = list[tuple[int | None, int | None, str]]


def _sql_str(s: str) -> str:
    """Render a Python string as a SQL literal (doubling embedded quotes —
    a label like "D'ORO" must not desynchronize the oracle SQL)."""
    return "'" + s.replace("'", "''") + "'"


def bucketize(value: Column, buckets: Buckets,
              default: str = "SIN CLASIFICAR") -> Column:
    """Compile buckets into one conditional expression."""
    expr: Column | None = None
    for lo, hi, label in buckets:
        if lo is None and hi is None:
            cond = value.isNotNull()
        elif lo is None:
            cond = value <= F.lit(hi)
        elif hi is None:
            cond = value > F.lit(lo)
        else:
            cond = (value > F.lit(lo)) & (value <= F.lit(hi))
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
    assert expr is not None, "empty bucket list"
    return expr.otherwise(F.lit(default))


def bucketize_sql(value_sql: str, buckets: Buckets,
                  default: str = "SIN CLASIFICAR") -> str:
    """The same ladder as ANSI SQL (for the DuckDB correctness oracle)."""
    arms = []
    for lo, hi, label in buckets:
        if lo is None and hi is None:
            cond = f"{value_sql} IS NOT NULL"
        elif lo is None:
            cond = f"{value_sql} <= {hi}"
        elif hi is None:
            cond = f"{value_sql} > {lo}"
        else:
            cond = f"({value_sql} > {lo} AND {value_sql} <= {hi})"
        arms.append(f"WHEN {cond} THEN {_sql_str(label)}")
    return "CASE " + " ".join(arms) + f" ELSE {_sql_str(default)} END"


def bucket_order_expr(label: Column, buckets: Buckets) -> Column:
    """Ordinal position of a bucket label, for categorical-order sorting
    (reference uses ``pd.Categorical(ordered=True)``,
    ``src/analytics.py:161-165``). Unknown labels sort last."""
    expr: Column | None = None
    for idx, (_, _, lbl) in enumerate(buckets):
        cond = label == F.lit(lbl)
        expr = F.when(cond, F.lit(idx)) if expr is None else expr.when(cond, F.lit(idx))
    assert expr is not None
    return expr.otherwise(F.lit(len(buckets)))


def bucket_order_sql(label_sql: str, buckets: Buckets) -> str:
    arms = " ".join(
        f"WHEN {label_sql} = {_sql_str(lbl)} THEN {idx}"
        for idx, (_, _, lbl) in enumerate(buckets)
    )
    return f"CASE {arms} ELSE {len(buckets)} END"
