"""Shared correctness-checking utilities (used by tests/ and tools/).

Mirrors the driver's gate: run the Spark query and its DuckDB oracle twin on
the same parquet tables, compare row count, column set, and values
(order-insensitive, exact equality after each side's declared rounding).
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from .sources import TABLES


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype(str)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare_frames(spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty = equal)."""
    problems: list[str] = []
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        problems.append(f"columns differ: spark={sorted(spark_df.columns)} "
                        f"duck={sorted(duck_df.columns)}")
        return problems
    if len(spark_df) != len(duck_df):
        problems.append(f"row count differs: spark={len(spark_df)} duck={len(duck_df)}")
        return problems
    s, d = normalize(spark_df), normalize(duck_df)
    for c in s.columns:
        sv, dv = s[c].to_numpy(), d[c].to_numpy()
        if np.issubdtype(sv.dtype, np.floating) or np.issubdtype(dv.dtype, np.floating):
            sv = sv.astype(float)
            dv = dv.astype(float)
            both_nan = np.isnan(sv) & np.isnan(dv)
            eq = (sv == dv) | both_nan
            if not eq.all():
                bad = int((~eq).sum())
                maxdiff = np.nanmax(np.abs(np.nan_to_num(sv) - np.nan_to_num(dv)))
                problems.append(f"col {c}: {bad} values differ (max |Δ|={maxdiff:.3e})")
        else:
            eq = np.asarray((sv == dv) | (pd.isna(sv) & pd.isna(dv)))
            if not eq.all():
                idx = int(np.argmin(eq))
                problems.append(f"col {c}: mismatch at row {idx}: "
                                f"spark={sv[idx]!r} duck={dv[idx]!r}")
    return problems
