"""Driver-side report sinks.

Excel/PDF are inherently single-machine artifacts: views are collected
(after the distributed computation has reduced them to report size) and
written with plain Python. Multi-sheet styled Excel is produced when
``openpyxl`` is available; otherwise each view falls back to CSV — the
engine's outputs are identical either way, only the container differs.
Large row-level views are exported as Parquet, never collected.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

# Views small enough to collect into a workbook; everything else → Parquet.
COLLECT_LIMIT = 100_000

try:  # pragma: no cover - availability depends on environment
    import openpyxl  # noqa: F401
    HAS_OPENPYXL = True
except ImportError:
    HAS_OPENPYXL = False


def export_views(views: dict[str, DataFrame], out_dir: str) -> list[str]:
    os.makedirs(out_dir, exist_ok=True)
    written: list[str] = []
    small: dict[str, DataFrame] = {}
    for name, df in views.items():
        n = df.limit(COLLECT_LIMIT + 1).count()
        if n > COLLECT_LIMIT:
            path = os.path.join(out_dir, f"{name}.parquet")
            df.write.mode("overwrite").parquet(path)
            written.append(path)
        else:
            small[name] = df
    if HAS_OPENPYXL:
        written.append(_export_excel(small, os.path.join(out_dir, "reporte_cxc.xlsx")))
    else:
        for name, df in small.items():
            path = os.path.join(out_dir, f"{name}.csv")
            df.toPandas().to_csv(path, index=False)
            written.append(path)
    return written


def _export_excel(views: dict[str, DataFrame], path: str) -> str:
    """Multi-sheet workbook with header styling and banded rows (the
    styling contract of the reference's Excel sink, driver-side only)."""
    import pandas as pd
    from openpyxl.styles import Font, PatternFill

    with pd.ExcelWriter(path, engine="openpyxl") as writer:
        for name, df in views.items():
            sheet = name[:31]
            pdf = df.toPandas()
            pdf.to_excel(writer, sheet_name=sheet, index=False)
            ws = writer.sheets[sheet]
            header_fill = PatternFill("solid", fgColor="1F4E78")
            for cell in ws[1]:
                cell.font = Font(bold=True, color="FFFFFF")
                cell.fill = header_fill
            band = PatternFill("solid", fgColor="F2F2F2")
            for r in range(2, ws.max_row + 1, 2):
                for cell in ws[r]:
                    cell.fill = band
    return path
