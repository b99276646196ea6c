"""Minimal dependency-free PDF report sink.

The reference renders a landscape PDF dashboard with matplotlib charts;
this container has no plotting libraries, so the engine ships a small
PDF 1.4 writer (text pages, Helvetica) producing a tabular KPI report from
collected view frames. The distributed computation is unchanged — this is
a driver-side presentation artifact, like every PDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

PAGE_W, PAGE_H = 842, 595  # A4 landscape, points
MARGIN = 40
LINE_H = 14
FONT_SIZE = 9
TITLE_SIZE = 14
MAX_ROWS_PER_TABLE = 20


def _esc(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def _page_stream(title: str, lines: list[str]) -> bytes:
    parts = [
        "BT",
        f"/F1 {TITLE_SIZE} Tf",
        f"1 0 0 1 {MARGIN} {PAGE_H - MARGIN} Tm",
        f"({_esc(title)}) Tj",
        f"/F1 {FONT_SIZE} Tf",
    ]
    y = PAGE_H - MARGIN - 2 * LINE_H
    for line in lines:
        parts.append(f"1 0 0 1 {MARGIN} {y} Tm")
        parts.append(f"({_esc(line)}) Tj")
        y -= LINE_H
        if y < MARGIN:
            break
    parts.append("ET")
    return "\n".join(parts).encode("latin-1", "replace")


def write_pdf(pages: list[tuple[str, list[str]]], path: str) -> str:
    """Assemble a PDF from (title, text-lines) pages."""
    objects: list[bytes] = []

    def add(obj: bytes) -> int:
        objects.append(obj)
        return len(objects)  # 1-based object number

    font_n = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    page_ns: list[int] = []
    content_ns: list[int] = []
    for title, lines in pages:
        stream = _page_stream(title, lines)
        content_ns.append(add(
            b"<< /Length " + str(len(stream)).encode() + b" >>\nstream\n"
            + stream + b"\nendstream"))
    pages_n = len(objects) + len(pages) + 1  # forward ref to the Pages node
    for content_n in content_ns:
        page_ns.append(add(
            f"<< /Type /Page /Parent {pages_n} 0 R "
            f"/MediaBox [0 0 {PAGE_W} {PAGE_H}] "
            f"/Resources << /Font << /F1 {font_n} 0 R >> >> "
            f"/Contents {content_n} 0 R >>".encode()))
    kids = " ".join(f"{n} 0 R" for n in page_ns)
    actual_pages_n = add(
        f"<< /Type /Pages /Kids [{kids}] /Count {len(page_ns)} >>".encode())
    assert actual_pages_n == pages_n
    catalog_n = add(f"<< /Type /Catalog /Pages {pages_n} 0 R >>".encode())

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, obj in enumerate(objects, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + obj + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objects) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size {len(objects) + 1} /Root {catalog_n} 0 R >>\n"
            f"startxref\n{xref_at}\n%%EOF\n").encode()
    with open(path, "wb") as f:
        f.write(bytes(out))
    return path


def frame_to_lines(df: DataFrame, max_rows: int = MAX_ROWS_PER_TABLE) -> list[str]:
    """Fixed-width text rendering of a (small, collected) view frame,
    preserving a trailing TOTAL row when truncating."""
    cols = df.columns
    body = [r for r in df.limit(max_rows + 1).collect()
            if str(r[0]) != "TOTAL"][:max_rows]
    # fetch the TOTAL row explicitly — relying on it landing inside the
    # limit() loses it for views longer than the truncation window
    from pyspark.sql import functions as F
    total = df.filter(F.col(cols[0]).cast("string") == "TOTAL").collect()
    widths = [max(len(c), 12) for c in cols]

    def fmt(r) -> str:
        cells = []
        for c, w in zip(cols, widths):
            v = r[c]
            s = f"{v:,.2f}" if isinstance(v, float) else str(v)
            cells.append(s[:w].rjust(w))
        return "  ".join(cells)

    header = "  ".join(c[:w].rjust(w) for c, w in zip(cols, widths))
    return [header, "-" * len(header)] + [fmt(r) for r in body + total]


def export_pdf_report(views: dict[str, DataFrame], path: str) -> str:
    pages = [(name, frame_to_lines(df)) for name, df in views.items()]
    return write_pdf(pages, path)
