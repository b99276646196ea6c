"""Minimal self-contained .xlsx writer (stdlib ``zipfile`` + XML).

Implements the reference's Excel styling contract
(``/root/reference/main.py:205-416``) without openpyxl, which is absent in
this container: an ``.xlsx`` file is a ZIP of XML parts, so the writer
emits them directly. Styling implemented:

- header row: Cambria 11 bold white on blue (4472C4), centered, thin
  borders; calculated columns get the green header (548235)
  (``_aplicar_formato_encabezado``)
- body: Cambria 11 + thin borders everywhere (``_aplicar_bordes_y_fuente``)
- number formats per column family: money ``#,##0.00``, integer ``#,##0``,
  date ``DD/MM/YYYY``, percent ``0.00%`` (``_aplicar_formatos_columna``,
  including the VALOR-only-when-UNIDAD-is-'%' rule)
- semantic fills per column (cargos→blue, abonos→green, saldos→yellow,
  vencido→red), alternating band rows elsewhere, CLASIFICACION A/B/C
  overrides, muted zero-balance rows, TOTAL row override
  (``_aplicar_estilos_semanticos``)
- explicit band groups via a ``_BAND_GROUP`` helper column
  (``_aplicar_bandas_alternas``)
- auto column widths with the reference's x1.3 Cambria allowance and the
  wide wrapped INTERPRETACION/MOTIVO columns (``_autoajustar_ancho_columnas``)
- hidden gridlines; legacy-hash sheet protection (``_escribir_hoja``)

Everything here is driver-side presentation on report-sized frames — the
distributed engine reduces first, then this writer renders.
"""

from __future__ import annotations

import datetime as _dt
import zipfile
from typing import Any, Iterable
from xml.sax.saxutils import escape, quoteattr

import pandas as pd

# ---------------------------------------------------------------------------
# Column families (reference main.py:68-105)
# ---------------------------------------------------------------------------

COLUMNAS_MONEDA = {
    "CARGOS", "ABONOS", "IMPORTE", "IMPUESTO",
    "SALDO_FACTURA", "SALDO_CLIENTE",
    "IMPORTE_TOTAL", "IMPORTE_PROMEDIO", "IMPORTE_MAX",
    "TOTAL_CARGOS", "TOTAL_ABONOS", "SALDO",
    "MONTO_CARGO", "MONTO_ABONOS", "DISPONIBLE",
    "SALDO_TOTAL", "SALDO_VIGENTE", "SALDO_VENCIDO",
    "LIMITE_CREDITO", "SALDO_PENDIENTE", "FACTURAS_PAGADAS",
    "FACTURAS_VIGENTES", "IMPUESTO_TOTAL", "MONTO_TOTAL",
    "IMPORTE_AJUSTE", "VENDIDO", "PAGADO",
    "TOTAL_CARGOS_CANCELADOS", "TOTAL_ABONOS_CANCELADOS",
}
MONEDA_PREFIJOS = ("FACTURAS_VENCIDAS", "VIGENTE:", "VENCIDO:")
COLUMNAS_FECHA = {
    "FECHA_EMISION", "FECHA_VENCIMIENTO", "FECHA_HORA_CREACION",
    "FECHA_HORA_ULT_MODIF", "FECHA_HORA_CANCELACION",
}
COLUMNAS_ENTERO = {
    "NUM_DOCUMENTOS", "NUM_REGISTROS", "NUM_CARGOS", "NUM_ABONOS",
    "NUM_FACTURAS", "NUM_VENCIDAS", "DIAS_VENCIDO_MAX",
    "NUM_FACTURAS_PENDIENTES", "NUM_FACTURAS_TOTALES",
    "NUM_FACTURAS_VIGENTES", "NUM_FACTURAS_VENCIDAS",
}
COLUMNAS_PORCENTAJE = {"PCT_DEL_TOTAL", "UTILIZACION_PCT", "PCT_ACUMULADO",
                       "PCT_VENCIDO", "VALOR"}

_COLS_AZUL = {"TOTAL_CARGOS", "TOTAL_CARGOS_CANCELADOS", "LIMITE_CREDITO"}
_COLS_VERDE = {"TOTAL_ABONOS", "TOTAL_ABONOS_CANCELADOS", "SALDO_VIGENTE",
               "DISPONIBLE", "FACTURAS_PAGADAS"}
_COLS_AMARILLO = {"SALDO_PENDIENTE", "SALDO_TOTAL", "SALDO", "IMPORTE_AJUSTE"}
_COLS_ROJO = {"SALDO_VENCIDO", "DIAS_VENCIDO_MAX", "PCT_VENCIDO"}
_COLS_SALDO_CERO = ("SALDO_PENDIENTE", "SALDO_TOTAL", "SALDO", "IMPORTE_AJUSTE")
_COLS_WRAP = {"INTERPRETACION", "MOTIVO"}

BAND_COL = "_BAND_GROUP"

# ---------------------------------------------------------------------------
# Style tables. Fill/font indices are fixed; cell formats (xf) are interned
# on demand. Fill 0=none and 1=gray125 are mandated by the format.
# ---------------------------------------------------------------------------

_FONT_XML = [
    '<font><sz val="11"/><name val="Cambria"/></font>',                     # 0 normal
    '<font><b/><sz val="11"/><color rgb="FFFFFFFF"/><name val="Cambria"/></font>',  # 1 header
    '<font><b/><sz val="11"/><name val="Cambria"/></font>',                 # 2 total
    '<font><sz val="11"/><color rgb="FF808080"/><name val="Cambria"/></font>',      # 3 muted
]
F_NORMAL, F_HEADER, F_TOTAL, F_MUTED = range(4)

_FILL_COLORS = [None, None, "FFFFFF", "F2F2F2", "4472C4", "548235",
                "D9E1F2", "E2EFDA", "FFF2CC", "FCE4D6", "A6A6A6", "D9D9D9",
                "D9E2F3"]
(FILL_NONE, FILL_GRAY125, FILL_WHITE, FILL_BAND, FILL_HEADER, FILL_CALC,
 FILL_AZUL, FILL_VERDE, FILL_AMARILLO, FILL_ROJO, FILL_TOTAL, FILL_ZERO,
 FILL_BAND_AZUL) = range(13)

_NUMFMTS = {164: "#,##0.00", 165: "#,##0", 166: "DD/MM/YYYY", 167: "0.00%"}
NF_NONE, NF_MONEY, NF_INT, NF_DATE, NF_PCT = 0, 164, 165, 166, 167

AL_NONE, AL_CENTER, AL_WRAP = 0, 1, 2
_ALIGN_XML = {
    AL_NONE: "",
    AL_CENTER: '<alignment horizontal="center" vertical="center"/>',
    AL_WRAP: '<alignment horizontal="center" vertical="center" wrapText="1"/>',
}


def _col_letter(idx: int) -> str:
    """1-based column index → Excel letters."""
    out = ""
    while idx > 0:
        idx, rem = divmod(idx - 1, 26)
        out = chr(65 + rem) + out
    return out


def legacy_sheet_password_hash(password: str) -> str:
    """The legacy 16-bit worksheet-protection hash (public algorithm from
    the OOXML/BIFF specs; what openpyxl emits for ws.protection.password)."""
    h = 0
    for ch in reversed(password):
        h = (((h << 1) | (h >> 14)) & 0x7FFF) ^ ord(ch)
    h = ((h << 1) | (h >> 14)) & 0x7FFF
    return format(h ^ len(password) ^ 0xCE4B, "04X")


class _SharedStrings:
    """Workbook-global shared-string table: each distinct string is stored
    once in ``xl/sharedStrings.xml`` and cells reference it by index
    (``t="s"``). Report sheets repeat the same customer/concept/bucket
    labels thousands of times — interning them shrinks the file roughly
    by the duplication factor vs per-cell inline strings."""

    def __init__(self) -> None:
        self._idx: dict[str, int] = {}
        self._order: list[str] = []
        self.refs = 0  # total string-cell count (the <sst count> attribute)

    def index(self, text: str) -> int:
        self.refs += 1
        if text not in self._idx:
            self._idx[text] = len(self._order)
            self._order.append(text)
        return self._idx[text]

    def __len__(self) -> int:
        return len(self._order)

    def to_xml(self) -> str:
        items = "".join(
            f'<si><t xml:space="preserve">{escape(t)}</t></si>'
            for t in self._order)
        return (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/'
            f'2006/main" count="{self.refs}" uniqueCount="{len(self._order)}">'
            f"{items}</sst>"
        )


class _Styles:
    """Interns (numFmt, font, fill, align) combos into cellXfs indices."""

    def __init__(self) -> None:
        self._xfs: dict[tuple[int, int, int, int], int] = {}
        self._order: list[tuple[int, int, int, int]] = []
        self.xf(NF_NONE, F_NORMAL, FILL_NONE, AL_NONE)  # xf 0 = default

    def xf(self, numfmt: int, font: int, fill: int, align: int) -> int:
        key = (numfmt, font, fill, align)
        if key not in self._xfs:
            self._xfs[key] = len(self._order)
            self._order.append(key)
        return self._xfs[key]

    def to_xml(self) -> str:
        fmts = "".join(
            f'<numFmt numFmtId="{i}" formatCode={quoteattr(c)}/>'
            for i, c in _NUMFMTS.items())
        fills = []
        for i, color in enumerate(_FILL_COLORS):
            if i == 0:
                fills.append('<fill><patternFill patternType="none"/></fill>')
            elif i == 1:
                fills.append('<fill><patternFill patternType="gray125"/></fill>')
            else:
                fills.append(f'<fill><patternFill patternType="solid">'
                             f'<fgColor rgb="FF{color}"/>'
                             f'<bgColor indexed="64"/></patternFill></fill>')
        xfs = []
        for numfmt, font, fill, align in self._order:
            attrs = (f'numFmtId="{numfmt}" fontId="{font}" fillId="{fill}" '
                     f'borderId="1" applyNumberFormat="1" applyFont="1" '
                     f'applyFill="1" applyBorder="1"')
            body = _ALIGN_XML[align]
            if body:
                xfs.append(f'<xf {attrs} applyAlignment="1">{body}</xf>')
            else:
                xfs.append(f"<xf {attrs}/>")
        side = '<color rgb="FFB4C6E7"/>'
        return (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<styleSheet xmlns="http://schemas.openxmlformats.org/'
            'spreadsheetml/2006/main">'
            f'<numFmts count="{len(_NUMFMTS)}">{fmts}</numFmts>'
            f'<fonts count="{len(_FONT_XML)}">{"".join(_FONT_XML)}</fonts>'
            f'<fills count="{len(fills)}">{"".join(fills)}</fills>'
            '<borders count="2"><border><left/><right/><top/><bottom/>'
            "<diagonal/></border>"
            f'<border><left style="thin">{side}</left>'
            f'<right style="thin">{side}</right>'
            f'<top style="thin">{side}</top>'
            f'<bottom style="thin">{side}</bottom><diagonal/></border>'
            "</borders>"
            '<cellStyleXfs count="1"><xf numFmtId="0" fontId="0" fillId="0" '
            'borderId="0"/></cellStyleXfs>'
            f'<cellXfs count="{len(self._order)}">{"".join(xfs)}</cellXfs>'
            '<cellStyles count="1"><cellStyle name="Normal" xfId="0" '
            'builtinId="0"/></cellStyles>'
            "</styleSheet>"
        )


def _numfmt_for(col: str, row: dict[str, Any]) -> int:
    cu = col.upper()
    if cu in COLUMNAS_MONEDA or any(cu.startswith(p) for p in MONEDA_PREFIJOS):
        return NF_MONEY
    if cu in COLUMNAS_ENTERO:
        return NF_INT
    if cu in COLUMNAS_FECHA:
        return NF_DATE
    if cu in COLUMNAS_PORCENTAJE:
        # VALOR is only a percentage when the row's UNIDAD says so
        if cu == "VALOR" and "UNIDAD" in row:
            return NF_PCT if str(row.get("UNIDAD", "")).strip() == "%" else NF_NONE
        return NF_PCT
    return NF_NONE


def _semantic_fill(col: str, r_idx: int) -> int:
    cu = col.upper()
    if cu in _COLS_AZUL:
        return FILL_AZUL
    if cu in _COLS_VERDE:
        return FILL_VERDE
    if cu in _COLS_AMARILLO:
        return FILL_AMARILLO
    if cu in _COLS_ROJO:
        return FILL_ROJO
    return FILL_BAND if r_idx % 2 == 0 else FILL_WHITE


def _is_zero_saldo(row: dict[str, Any]) -> bool:
    for c in _COLS_SALDO_CERO:
        if c in row and row[c] is not None and str(row[c]).strip() != "":
            try:
                if float(row[c]) == 0.0:
                    return True
            except (TypeError, ValueError):
                pass
    return False


def _excel_serial(v: Any) -> float:
    if isinstance(v, pd.Timestamp):
        v = v.to_pydatetime()
    if isinstance(v, _dt.datetime):
        delta = v - _dt.datetime(1899, 12, 30)
        return delta.days + delta.seconds / 86400.0
    return (v - _dt.date(1899, 12, 30)).days


def _cell_xml(ref: str, v: Any, s: int,
              sst: _SharedStrings | None = None) -> str:
    if v is None or (isinstance(v, float) and v != v) or v is pd.NaT:
        return f'<c r="{ref}" s="{s}"/>'
    if isinstance(v, bool):
        return f'<c r="{ref}" s="{s}" t="b"><v>{int(v)}</v></c>'
    if isinstance(v, (_dt.date, _dt.datetime, pd.Timestamp)):
        return f'<c r="{ref}" s="{s}"><v>{_excel_serial(v)}</v></c>'
    if isinstance(v, (int, float)):
        return f'<c r="{ref}" s="{s}"><v>{v!r}</v></c>'
    if hasattr(v, "item"):  # numpy scalars
        return _cell_xml(ref, v.item(), s, sst)
    if sst is not None:
        return f'<c r="{ref}" s="{s}" t="s"><v>{sst.index(str(v))}</v></c>'
    text = escape(str(v))
    return (f'<c r="{ref}" s="{s}" t="inlineStr"><is><t xml:space="preserve">'
            f"{text}</t></is></c>")


def _display_len(v: Any, numfmt: int) -> int:
    """Reference _autoajustar_ancho_columnas's content-length heuristic."""
    if v is None or (isinstance(v, float) and v != v):
        return 0
    if numfmt == NF_DATE:
        return 10
    if numfmt in (NF_MONEY, NF_INT):
        try:
            return len(f"{float(v):,.2f}")
        except (TypeError, ValueError):
            return len(str(v))
    if numfmt == NF_PCT:
        try:
            return len(f"{float(v) * 100:.2f}%")
        except (TypeError, ValueError):
            return len(str(v))
    return len(str(v))


def _sheet_xml(df: pd.DataFrame, styles: _Styles, protected: bool,
               password: str, calc_cols: set[str] | None,
               sst: _SharedStrings | None = None) -> str:
    band_data = None
    if BAND_COL in df.columns:
        band_data = df[BAND_COL].tolist()
        df = df.drop(columns=[BAND_COL])
    columns = [str(c) for c in df.columns]
    calc_upper = {c.upper() for c in calc_cols} if calc_cols else set()
    records = df.to_dict("records")

    # column widths (reference: max display length x1.3 + 5, clamped 14..70;
    # INTERPRETACION/MOTIVO fixed wide + wrapped)
    widths = []
    for col in columns:
        if col.upper() in _COLS_WRAP:
            widths.append(60)
            continue
        max_len = len(col)
        for row in records:
            nf = _numfmt_for(col, row)
            max_len = max(max_len, _display_len(row.get(col), nf))
        widths.append(min(max(int(max_len * 1.3) + 5, 14), 70))
    cols_xml = "".join(
        f'<col min="{i}" max="{i}" width="{w}" customWidth="1"/>'
        for i, w in enumerate(widths, start=1))

    rows_xml = []
    header_cells = []
    for c_idx, col in enumerate(columns, start=1):
        fill = FILL_CALC if col.upper() in calc_upper else FILL_HEADER
        align = AL_WRAP if col.upper() in _COLS_WRAP else AL_CENTER
        s = styles.xf(NF_NONE, F_HEADER, fill, align)
        header_cells.append(_cell_xml(f"{_col_letter(c_idx)}1", col, s, sst))
    rows_xml.append(f'<row r="1">{"".join(header_cells)}</row>')

    for i, row in enumerate(records):
        r_idx = i + 2
        first_val = row.get(columns[0], "") if columns else ""
        is_total = str(first_val).strip().upper() == "TOTAL"
        is_zero = _is_zero_saldo(row)
        clasif = str(row.get("CLASIFICACION", ""))
        cells = []
        for c_idx, col in enumerate(columns, start=1):
            if band_data is not None:
                try:
                    fill = (FILL_BAND_AZUL if int(band_data[i]) == 0
                            else FILL_WHITE)
                except (TypeError, ValueError):
                    fill = FILL_WHITE
                font = F_NORMAL
            else:
                fill = _semantic_fill(col, r_idx)
                font = F_NORMAL
                if clasif == "A":
                    fill = FILL_VERDE
                elif clasif == "B":
                    fill = FILL_AMARILLO
                elif clasif == "C":
                    fill = FILL_ROJO
                if is_zero:
                    fill, font = FILL_ZERO, F_MUTED
                if is_total:
                    fill, font = FILL_TOTAL, F_TOTAL
            align = AL_WRAP if col.upper() in _COLS_WRAP else AL_NONE
            s = styles.xf(_numfmt_for(col, row), font, fill, align)
            cells.append(_cell_xml(f"{_col_letter(c_idx)}{r_idx}",
                                   row.get(col), s, sst))
        rows_xml.append(f'<row r="{r_idx}">{"".join(cells)}</row>')

    protection = ""
    if protected:
        pw = (f' password="{legacy_sheet_password_hash(password)}"'
              if password else "")
        protection = f'<sheetProtection sheet="1"{pw} objects="1" scenarios="1"/>'
    dim = f"A1:{_col_letter(max(len(columns), 1))}{len(records) + 1}"
    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main">'
        f'<dimension ref="{dim}"/>'
        '<sheetViews><sheetView workbookViewId="0" showGridLines="0"/>'
        "</sheetViews>"
        f"<cols>{cols_xml}</cols>"
        f'<sheetData>{"".join(rows_xml)}</sheetData>'
        f"{protection}"
        "</worksheet>"
    )


def write_styled_workbook(
    path: str,
    sheets: Iterable[tuple[str, pd.DataFrame]],
    protected_sheets: set[str] | None = None,
    password: str = "prac",
    calc_cols_by_sheet: dict[str, set[str]] | None = None,
) -> str:
    """Write an ordered multi-sheet styled workbook. ``sheets`` is an
    ordered iterable of (name, pandas frame); empty frames are skipped
    (reference ``_exportar_excel`` contract). Names are truncated to
    Excel's 31-char limit."""
    protected_sheets = protected_sheets or set()
    calc_cols_by_sheet = calc_cols_by_sheet or {}
    styles = _Styles()
    sst = _SharedStrings()
    parts: list[tuple[str, str]] = []
    names: list[str] = []
    for name, df in sheets:
        if df is None or df.empty:
            continue
        sheet_name = name[:31]
        names.append(sheet_name)
        parts.append((
            f"xl/worksheets/sheet{len(names)}.xml",
            _sheet_xml(df, styles, name in protected_sheets, password,
                       calc_cols_by_sheet.get(name), sst),
        ))
    if not names:
        raise ValueError("write_styled_workbook: no non-empty sheets")

    sheet_tags = "".join(
        f'<sheet name={quoteattr(n)} sheetId="{i}" r:id="rId{i}"/>'
        for i, n in enumerate(names, start=1))
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/'
        'relationships">'
        f"<sheets>{sheet_tags}</sheets></workbook>"
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships">'
        + "".join(
            f'<Relationship Id="rId{i}" Type="http://schemas.openxmlformats'
            '.org/officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheet{i}.xml"/>'
            for i in range(1, len(names) + 1))
        + f'<Relationship Id="rId{len(names) + 1}" '
          'Type="http://schemas.openxmlformats.org/officeDocument/2006/'
          'relationships/styles" Target="styles.xml"/>'
        + f'<Relationship Id="rId{len(names) + 2}" '
          'Type="http://schemas.openxmlformats.org/officeDocument/2006/'
          'relationships/sharedStrings" Target="sharedStrings.xml"/>'
        "</Relationships>"
    )
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/officeDocument" '
        'Target="xl/workbook.xml"/></Relationships>'
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
        'content-types">'
        '<Default Extension="rels" ContentType="application/vnd.'
        'openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/'
        'vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/styles.xml" ContentType="application/vnd.'
        'openxmlformats-officedocument.spreadsheetml.styles+xml"/>'
        '<Override PartName="/xl/sharedStrings.xml" ContentType="application/'
        'vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>'
        + "".join(
            f'<Override PartName="/xl/worksheets/sheet{i}.xml" '
            'ContentType="application/vnd.openxmlformats-officedocument.'
            'spreadsheetml.worksheet+xml"/>'
            for i in range(1, len(names) + 1))
        + "</Types>"
    )

    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", content_types)
        zf.writestr("_rels/.rels", root_rels)
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        zf.writestr("xl/styles.xml", styles.to_xml())
        zf.writestr("xl/sharedStrings.xml", sst.to_xml())
        for part_name, xml in parts:
            zf.writestr(part_name, xml)
    return path
