"""Dependency-free PDF dashboard sink with vector charts.

The reference renders a landscape PDF dashboard — styled financial
tables plus donut / horizontal-bar / Pareto dual-axis charts
(``/root/reference/src/reporte_pdf.py:200-393``) — via
matplotlib+reportlab. Neither library exists in this container, so the
engine ships a small PDF 1.4 writer that draws the same sections as raw
vector content streams: annular wedges and discs from Bézier arcs,
bars/grids/axes from rects and lines, rotated tick labels from text
matrices. The distributed computation is unchanged — this is a
driver-side presentation artifact over report-sized collected frames.

Sections mirrored (reference line anchors):
- KPI summary table page            (_seccion_kpis_macro, :202-216)
- vencido-vs-vigente donut + table  (_seccion_vencido_vs_vigente, :219-252)
- aging horizontal bars + table     (_seccion_antiguedad, :255-311)
- Pareto dual-axis top-10 + table   (_seccion_concentracion, :314-358)
- credit-limit wide table           (_seccion_limite_credito, :361-375)
- generic annex table pages         (_seccion_anexos_operativos, :378-387)
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PAGE_W, PAGE_H = 842, 595  # A4 landscape, points
MARGIN = 40
MAX_ROWS_PER_TABLE = 8
MAX_ROWS_WIDE_TABLE = 16

# Reference palette (reporte_pdf.py:54-59)
AZUL = (0x44 / 255, 0x72 / 255, 0xC4 / 255)
VERDE = (0x54 / 255, 0x82 / 255, 0x35 / 255)
AMARILLO = (0xFF / 255, 0xC0 / 255, 0x00 / 255)
ROJO = (0xC0 / 255, 0x00 / 255, 0x00 / 255)
GRIS = (0xA6 / 255, 0xA6 / 255, 0xA6 / 255)
FONDO = (0xF2 / 255, 0xF2 / 255, 0xF2 / 255)
BORDE = (0xB4 / 255, 0xC6 / 255, 0xE7 / 255)
TEXTO = (0x33 / 255, 0x33 / 255, 0x33 / 255)
BLANCO = (1.0, 1.0, 1.0)


def _esc(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def _fmt_num(v) -> str:
    if isinstance(v, float):
        return f"{v:,.2f}"
    return str(v)


class Canvas:
    """Accumulates PDF content-stream operators for one page."""

    CHAR_W = 0.52  # Helvetica average glyph width as a fraction of size

    def __init__(self) -> None:
        self.ops: list[str] = []

    # -- primitives ---------------------------------------------------------

    def _c(self, color: tuple[float, float, float]) -> str:
        return f"{color[0]:.3f} {color[1]:.3f} {color[2]:.3f}"

    def rect(self, x: float, y: float, w: float, h: float,
             fill=None, stroke=None, line_w: float = 0.5) -> None:
        if fill is not None:
            self.ops.append(f"{self._c(fill)} rg")
        if stroke is not None:
            self.ops.append(f"{self._c(stroke)} RG {line_w} w")
        if fill is not None and stroke is not None:
            op = "B"
        elif fill is not None:
            op = "f"
        else:
            op = "S"
        self.ops.append(f"{x:.2f} {y:.2f} {w:.2f} {h:.2f} re {op}")

    def line(self, x1: float, y1: float, x2: float, y2: float,
             color=TEXTO, width: float = 0.8, dash: str | None = None) -> None:
        if dash:
            self.ops.append(f"[{dash}] 0 d")
        self.ops.append(f"{self._c(color)} RG {width} w "
                        f"{x1:.2f} {y1:.2f} m {x2:.2f} {y2:.2f} l S")
        if dash:
            self.ops.append("[] 0 d")

    def polyline(self, pts: list[tuple[float, float]], color=ROJO,
                 width: float = 2.0) -> None:
        if len(pts) < 2:
            return
        path = f"{pts[0][0]:.2f} {pts[0][1]:.2f} m " + " ".join(
            f"{x:.2f} {y:.2f} l" for x, y in pts[1:])
        self.ops.append(f"{self._c(color)} RG {width} w {path} S")

    @staticmethod
    def _arc_segments(cx: float, cy: float, r: float, a0: float,
                      a1: float) -> list[str]:
        """Bezier approximation of the arc a0→a1 (radians), as `c` ops
        assuming the current point is already at the arc start."""
        ops = []
        n = max(1, math.ceil(abs(a1 - a0) / (math.pi / 2)))
        for i in range(n):
            s = a0 + (a1 - a0) * i / n
            e = a0 + (a1 - a0) * (i + 1) / n
            k = 4 / 3 * math.tan((e - s) / 4)
            x0, y0 = math.cos(s), math.sin(s)
            x3, y3 = math.cos(e), math.sin(e)
            x1, y1 = x0 - k * y0, y0 + k * x0
            x2, y2 = x3 + k * y3, y3 - k * x3
            ops.append(
                f"{cx + r * x1:.2f} {cy + r * y1:.2f} "
                f"{cx + r * x2:.2f} {cy + r * y2:.2f} "
                f"{cx + r * x3:.2f} {cy + r * y3:.2f} c")
        return ops

    def disc(self, cx: float, cy: float, r: float, color=ROJO) -> None:
        ops = [f"{self._c(color)} rg",
               f"{cx + r:.2f} {cy:.2f} m"]
        ops += self._arc_segments(cx, cy, r, 0, 2 * math.pi)
        ops.append("f")
        self.ops.append(" ".join(ops))

    def wedge(self, cx: float, cy: float, r_out: float, r_in: float,
              a0: float, a1: float, color) -> None:
        """Annular sector (donut slice), white-edged like the reference's
        wedgeprops(edgecolor='w')."""
        sx, sy = cx + r_out * math.cos(a0), cy + r_out * math.sin(a0)
        ops = [f"{self._c(color)} rg 1 1 1 RG 1.5 w", f"{sx:.2f} {sy:.2f} m"]
        ops += self._arc_segments(cx, cy, r_out, a0, a1)
        ix, iy = cx + r_in * math.cos(a1), cy + r_in * math.sin(a1)
        ops.append(f"{ix:.2f} {iy:.2f} l")
        ops += self._arc_segments(cx, cy, r_in, a1, a0)
        ops.append("h B")
        self.ops.append(" ".join(ops))

    def text(self, x: float, y: float, s: str, size: float = 9,
             bold: bool = False, color=TEXTO, align: str = "left",
             rotate_deg: float = 0.0) -> None:
        w = len(s) * size * self.CHAR_W
        if align == "center":
            x -= w / 2
        elif align == "right":
            x -= w
        font = "/F2" if bold else "/F1"
        if rotate_deg:
            a = math.radians(rotate_deg)
            tm = (f"{math.cos(a):.4f} {math.sin(a):.4f} "
                  f"{-math.sin(a):.4f} {math.cos(a):.4f} {x:.2f} {y:.2f} Tm")
        else:
            tm = f"1 0 0 1 {x:.2f} {y:.2f} Tm"
        self.ops.append(f"BT {font} {size} Tf {self._c(color)} rg {tm} "
                        f"({_esc(s)}) Tj ET")

    def text_width(self, s: str, size: float) -> float:
        return len(s) * size * self.CHAR_W

    def stream(self) -> bytes:
        return "\n".join(self.ops).encode("latin-1", "replace")


# ---------------------------------------------------------------------------
# chart + table components
# ---------------------------------------------------------------------------

def draw_table(c: Canvas, rows: list[list], headers: list[str],
               y_top: float, x: float = MARGIN,
               width: float = PAGE_W - 2 * MARGIN) -> float:
    """Reference _crear_tabla_estilo_financiero: blue header with white
    bold text, centered body, banded rows, gray bold TOTAL row, full
    grid in border blue. Returns the y below the table."""
    if not rows:
        return y_top
    n_cols = len(headers)
    raw_w = [max(len(str(h)),
                 max((len(_fmt_num(r[i])) for r in rows), default=1))
             for i, h in enumerate(headers)]
    total_w = sum(raw_w) or 1
    col_w = [max(34.0, width * w / total_w) for w in raw_w]
    scale = width / sum(col_w)
    col_w = [w * scale for w in col_w]
    row_h = 16.0

    y = y_top
    # header
    cx = x
    for i, h in enumerate(headers):
        c.rect(cx, y - row_h, col_w[i], row_h, fill=AZUL, stroke=BORDE)
        c.text(cx + col_w[i] / 2, y - row_h + 5, str(h)[:22], size=7,
               bold=True, color=BLANCO, align="center")
        cx += col_w[i]
    y -= row_h
    for r_idx, row in enumerate(rows):
        is_total = str(row[0]).strip().upper() == "TOTAL"
        if is_total:
            band = GRIS
        elif r_idx % 2 == 1:
            band = FONDO
        else:
            band = BLANCO
        cx = x
        for i in range(n_cols):
            c.rect(cx, y - row_h, col_w[i], row_h, fill=band, stroke=BORDE)
            val = _fmt_num(row[i]) if i < len(row) else ""
            c.text(cx + col_w[i] / 2, y - row_h + 5, val[:24], size=7,
                   bold=is_total, color=BLANCO if is_total else TEXTO,
                   align="center")
            cx += col_w[i]
        y -= row_h
    return y - 10


def draw_donut(c: Canvas, cx: float, cy: float, r: float,
               items: list[tuple[str, float, tuple]]) -> None:
    """Donut with percentage labels and an external legend (reference
    _seccion_vencido_vs_vigente: width-0.4 wedges, startangle 90,
    pctdistance 0.75)."""
    total = sum(v for _, v, _ in items) or 1.0
    a = math.pi / 2  # startangle=90, counterclockwise
    for label, value, color in items:
        sweep = 2 * math.pi * value / total
        if sweep <= 0:
            continue
        c.wedge(cx, cy, r, r * 0.6, a, a + sweep, color)
        mid = a + sweep / 2
        pr = r * 0.75
        c.text(cx + pr * math.cos(mid), cy + pr * math.sin(mid) - 3,
               f"{100 * value / total:.1f}%", size=9, bold=True,
               align="center")
        a += sweep
    ly = cy + 14 * (len(items) - 1) / 2
    for label, _, color in items:
        c.rect(cx + r + 24, ly - 4, 10, 10, fill=color, stroke=BORDE)
        c.text(cx + r + 40, ly - 2, str(label), size=8)
        ly -= 14


def draw_barh(c: Canvas, x: float, y_top: float, w: float, h: float,
              items: list[tuple[str, float, tuple]]) -> None:
    """Horizontal bars, first item on top (matplotlib invert_yaxis), with
    $-annotations at the bar ends (reference _seccion_antiguedad)."""
    if not items:
        return
    vmax = max(v for _, v, _ in items) or 1.0
    label_w = 110.0
    bar_area = w - label_w - 70
    slot = h / len(items)
    bar_h = slot * 0.62
    c.line(x + label_w, y_top - h, x + label_w, y_top, color=GRIS, width=0.8)
    for i, (label, value, color) in enumerate(items):
        y = y_top - (i + 1) * slot + (slot - bar_h) / 2
        bw = bar_area * value / vmax
        c.text(x + label_w - 6, y + bar_h / 2 - 2.5, str(label)[:24],
               size=7, align="right")
        c.rect(x + label_w, y, max(bw, 0.5), bar_h, fill=color)
        c.text(x + label_w + bw + 4, y + bar_h / 2 - 2.5,
               f"${value:,.0f}", size=7)


def draw_pareto(c: Canvas, x: float, y_bot: float, w: float, h: float,
                names: list[str], values: list[float],
                cum_pcts: list[float]) -> None:
    """Dual-axis Pareto: blue bars on the left axis, red cumulative-%
    polyline with disc markers on the right axis (0-105%), dashed 80%
    guide, 45-degree tick labels (reference _seccion_concentracion)."""
    if not names:
        return
    vmax = max(values) or 1.0
    n = len(names)
    slot = w / n
    bar_w = slot * 0.7
    # left axis (saldo) + right axis (%)
    c.line(x, y_bot, x, y_bot + h, color=AZUL, width=0.8)
    c.line(x + w, y_bot, x + w, y_bot + h, color=ROJO, width=0.8)
    c.line(x, y_bot, x + w, y_bot, color=GRIS, width=0.8)
    for frac in (0.0, 0.5, 1.0):
        c.text(x - 4, y_bot + h * frac - 2, f"{vmax * frac:,.0f}",
               size=6, color=AZUL, align="right")
    for pct in (0, 50, 100):
        c.text(x + w + 4, y_bot + h * pct / 105 - 2, f"{pct}%",
               size=6, color=ROJO)
    # 80% guide (right axis scale 0-105)
    y80 = y_bot + h * 80 / 105
    c.line(x, y80, x + w, y80, color=GRIS, width=0.7, dash="3 3")
    pts = []
    for i, (name, value, cum) in enumerate(zip(names, values, cum_pcts)):
        bx = x + i * slot + (slot - bar_w) / 2
        c.rect(bx, y_bot, bar_w, h * value / vmax, fill=AZUL)
        pts.append((x + i * slot + slot / 2, y_bot + h * min(cum, 105) / 105))
        c.text(bx + bar_w / 2 + 3, y_bot - 8, str(name)[:12] + "..",
               size=6, align="right", rotate_deg=45)
    c.polyline(pts, color=ROJO, width=1.8)
    for px, py in pts:
        c.disc(px, py, 2.4, color=ROJO)


def _title_block(c: Canvas, title: str, body: str) -> float:
    c.text(MARGIN, PAGE_H - MARGIN - 6, title, size=15, bold=True,
           color=AZUL)
    c.line(MARGIN, PAGE_H - MARGIN - 12, PAGE_W - MARGIN,
           PAGE_H - MARGIN - 12, color=BORDE, width=1.2)
    y = PAGE_H - MARGIN - 30
    # naive paragraph wrap at ~140 chars for 8pt Helvetica on A4 landscape
    words, line = body.split(), ""
    for word in words:
        if len(line) + len(word) + 1 > 140:
            c.text(MARGIN, y, line, size=8)
            y -= 11
            line = word
        else:
            line = f"{line} {word}".strip()
    if line:
        c.text(MARGIN, y, line, size=8)
        y -= 11
    return y - 8


# ---------------------------------------------------------------------------
# page sections (one per reference _seccion_*)
# ---------------------------------------------------------------------------

def _collect(df: DataFrame, max_rows: int) -> tuple[list[str], list[list]]:
    cols = df.columns
    body = [list(r) for r in df.limit(max_rows + 1).collect()
            if str(r[0]).strip().upper() != "TOTAL"][:max_rows]
    total = [list(r) for r in
             df.filter(F.col(cols[0]).cast("string") == "TOTAL").collect()]
    return cols, body + total


def _page_kpis(name: str, df: DataFrame) -> Canvas:
    c = Canvas()
    y = _title_block(
        c, f"Dashboard de Cuentas por Cobrar — {_moneda(name)}",
        "Los Indicadores Clave de Desempeno (KPIs) ofrecen una radiografia "
        "inmediata de la salud financiera y la efectividad del ciclo de "
        "cobranza. Un DSO elevado compromete el flujo de caja; un indice de "
        "morosidad en crecimiento demanda acciones de recuperacion.")
    cols, rows = _collect(df, MAX_ROWS_WIDE_TABLE)
    draw_table(c, rows, cols, y)
    return c

def _page_donut(name: str, df: DataFrame) -> Canvas:
    c = Canvas()
    y = _title_block(
        c, f"Cartera Vencida vs Vigente — {_moneda(name)}",
        "Esta vista clasifica el capital pendiente en dos bloques: dentro de "
        "los terminos de pago acordados (Vigente) y en incumplimiento "
        "(Vencido). Permite priorizar la estrategia de contacto con el "
        "cliente.")
    cols, rows = _collect(df, MAX_ROWS_PER_TABLE)
    label_i, value_i = _find(cols, "ESTATUS"), _find(cols, "SALDO")
    plot = [r for r in rows if str(r[label_i]).strip().upper() != "TOTAL"]
    items = [(str(r[label_i]),
              float(r[value_i] or 0.0),
              VERDE if "VIGENTE" in str(r[label_i]).upper() else ROJO)
             for r in plot]
    if sum(v for _, v, _ in items) > 0:
        c.text(PAGE_W / 2, y - 12, "Proporcion de Deuda", size=10,
               bold=True, align="center")
        draw_donut(c, PAGE_W / 2 - 60, y - 110, 80, items)
        y -= 215
    draw_table(c, rows, cols, y)
    return c


def _page_aging(name: str, df: DataFrame) -> Canvas:
    c = Canvas()
    y = _title_block(
        c, f"Antiguedad de Cartera (Aging) — {_moneda(name)}",
        "El analisis de antiguedad segmenta la deuda segun sus dias de mora. "
        "Facturas de 1-30 dias requieren gestion preventiva; saldos de mas "
        "de 90 dias poseen riesgo critico de incobrabilidad y exigen "
        "escalamiento.")
    cols, rows = _collect(df, MAX_ROWS_PER_TABLE)
    label_i = _find(cols, "RANGO")
    value_i = _find(cols, "SALDO_PENDIENTE", "SALDO")
    plot = [r for r in rows if str(r[label_i]).strip().upper() != "TOTAL"]
    items = [(str(r[label_i]), float(r[value_i] or 0.0),
              VERDE if "VIGENTE" in str(r[label_i]).upper() else ROJO)
             for r in plot]
    if sum(v for _, v, _ in items) > 0:
        c.text(PAGE_W / 2, y - 12, "Distribucion del Saldo por Rango",
               size=10, bold=True, align="center")
        draw_barh(c, MARGIN, y - 20, PAGE_W - 2 * MARGIN, 150, items)
        y -= 185
    draw_table(c, rows, cols, y)
    return c


def _page_pareto(name: str, df: DataFrame) -> Canvas:
    c = Canvas()
    y = _title_block(
        c, f"Concentracion de Cartera (Regla 80/20) — {_moneda(name)}",
        "Identifica la dependencia financiera evaluando que clientes "
        "acumulan la mayor parte de la deuda. La Clasificacion A agrupa a "
        "los deudores criticos que concentran el 80% del saldo total.")
    cols, rows = _collect(df, MAX_ROWS_PER_TABLE)
    name_i = _find(cols, "NOMBRE_CLIENTE")
    value_i = _find(cols, "SALDO_PENDIENTE", "SALDO")
    cum_i = _find(cols, "PCT_ACUMULADO")
    plot = [r for r in rows
            if str(r[name_i]).strip().upper() != "TOTAL"][:10]
    if plot:
        c.text(PAGE_W / 2, y - 12, "Analisis Pareto (Top 10 Clientes)",
               size=10, bold=True, align="center")
        draw_pareto(
            c, MARGIN + 60, y - 185, PAGE_W - 2 * MARGIN - 130, 140,
            [str(r[name_i]) for r in plot],
            [float(r[value_i] or 0.0) for r in plot],
            [100 * float(r[cum_i] or 0.0) for r in plot])
        y -= 230
    draw_table(c, rows, cols, y)
    return c


def _page_table(title: str, body: str, df: DataFrame,
                max_rows: int = MAX_ROWS_WIDE_TABLE) -> Canvas:
    c = Canvas()
    y = _title_block(c, title, body)
    cols, rows = _collect(df, max_rows)
    draw_table(c, rows, cols, y)
    return c


def _moneda(view_name: str) -> str:
    low = view_name.lower()
    if low.endswith("_usd"):
        return "USD"
    if low.endswith("_mxn"):
        return "MXN"
    return "MXN/USD"


def _find(cols: list[str], *candidates: str) -> int:
    for cand in candidates:
        for i, col in enumerate(cols):
            if col.upper() == cand:
                return i
    for cand in candidates:  # prefix fallback
        for i, col in enumerate(cols):
            if col.upper().startswith(cand):
                return i
    return 0


# ---------------------------------------------------------------------------
# document assembly (PDF 1.4, uncompressed streams)
# ---------------------------------------------------------------------------

def write_pdf(pages: list[Canvas], path: str) -> str:
    objects: list[bytes] = []

    def add(obj: bytes) -> int:
        objects.append(obj)
        return len(objects)  # 1-based object number

    f1 = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    f2 = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica-Bold >>")
    content_ns = []
    for canvas in pages:
        stream = canvas.stream()
        content_ns.append(add(
            b"<< /Length " + str(len(stream)).encode() + b" >>\nstream\n"
            + stream + b"\nendstream"))
    pages_n = len(objects) + len(pages) + 1  # forward ref to the Pages node
    page_ns = []
    for content_n in content_ns:
        page_ns.append(add(
            f"<< /Type /Page /Parent {pages_n} 0 R "
            f"/MediaBox [0 0 {PAGE_W} {PAGE_H}] "
            f"/Resources << /Font << /F1 {f1} 0 R /F2 {f2} 0 R >> >> "
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


def export_pdf_report(views: dict[str, DataFrame], path: str) -> str:
    """Render the view dictionary as the reference's dashboard PDF: one
    section page per view, chart type chosen by view family."""
    pages: list[Canvas] = []
    for name, df in views.items():
        low = name.lower()
        if low.startswith("kpis_resumen"):
            pages.append(_page_kpis(name, df))
        elif low.startswith("cartera_vencida_vs_vigente"):
            pages.append(_page_donut(name, df))
        elif low.startswith("antiguedad"):
            pages.append(_page_aging(name, df))
        elif low.startswith("kpis_concentracion"):
            pages.append(_page_pareto(name, df))
        elif low.startswith("kpis_limite_credito"):
            pages.append(_page_table(
                f"Utilizacion de Limite de Credito — {_moneda(name)}",
                "Mide la exposicion al riesgo comparando la deuda actual "
                "contra la linea de credito autorizada. Las cuentas en "
                "SOBRE_LIMITE operan fuera de politica corporativa.", df))
        else:
            pages.append(_page_table(name, "", df))
    if not pages:
        raise ValueError("export_pdf_report: no views to render")
    return write_pdf(pages, path)
