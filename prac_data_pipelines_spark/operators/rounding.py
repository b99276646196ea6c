"""Engine-portable rounding.

Spark's ``round`` converts the double through its shortest decimal string and
applies HALF_UP; DuckDB (and most C engines) round the binary double directly.
On exact ``.xx5``-looking products the two disagree by one ulp of the target
scale. The engine therefore standardizes on ``floor(x * 10^n + 0.5) / 10^n`` —
a pure double computation that yields bit-identical results on any engine
evaluating it over the same input, which makes result hashes comparable across
Spark, DuckDB, and any future backend. (Semantics: round-half-toward-+∞.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def rn(col: Column, n: int) -> Column:
    scale = 10 ** n
    return F.floor(col * scale + F.lit(0.5)) / scale


def r2(col: Column) -> Column:
    return rn(col, 2)


def r4(col: Column) -> Column:
    return rn(col, 4)


def r6(col: Column) -> Column:
    return rn(col, 6)


def sql_rn(expr: str, n: int) -> str:
    scale = 10 ** n
    return f"floor(({expr}) * {scale} + 0.5) / {scale}"


def sql_r2(expr: str) -> str:
    return sql_rn(expr, 2)


def sql_r4(expr: str) -> str:
    return sql_rn(expr, 4)


def sql_r6(expr: str) -> str:
    return sql_rn(expr, 6)
