"""Vendored xlsx writer: structural + styling-contract assertions.

No spreadsheet library exists in this container, so the workbook is
verified the way Excel itself reads it: unzip, parse each XML part, and
assert the styling contract of the reference sink (sheet order, header
fills, calculated-column highlight, number formats, banded rows,
protection, hidden gridlines, auto widths).
"""

from __future__ import annotations

import datetime
import os
import tempfile
import xml.etree.ElementTree as ET
import zipfile

import pandas as pd
import pytest

from prac_data_pipelines_spark.sinks.xlsx import (
    legacy_sheet_password_hash,
    write_styled_workbook,
)

NS = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}


@pytest.fixture(scope="module")
def workbook_path():
    frame = pd.DataFrame({
        "NOMBRE_CLIENTE": ["TOTAL", "Ana's <Shop>", "Bob"],
        "TOTAL_CARGOS": [300.0, 200.0, 100.0],
        "SALDO_PENDIENTE": [150.0, 150.0, 0.0],
        "NUM_FACTURAS": [3, 2, 1],
        "FECHA_EMISION": [datetime.date(2024, 1, 2)] * 3,
        "PCT_DEL_TOTAL": [1.0, 0.66, 0.34],
        "CLASIFICACION": ["", "A", "C"],
    })
    banded = pd.DataFrame({
        "FOLIO": ["F1", "F2", "F3"],
        "IMPORTE": [10.0, 20.0, 30.0],
        "_BAND_GROUP": [0, 0, 1],
    })
    calc = pd.DataFrame({
        "FOLIO": ["F1"], "SALDO_FACTURA": [5.0], "Z_IMPORTE": [0.1],
    })
    d = tempfile.mkdtemp(prefix="xlsx_test_")
    path = os.path.join(d, "wb.xlsx")
    write_styled_workbook(
        path,
        [("resumen", frame), ("registros_totales_cxc", banded),
         ("movimientos_totales_cxc", calc),
         ("vacia", pd.DataFrame({"A": []}))],
        protected_sheets={"registros_totales_cxc"},
        calc_cols_by_sheet={"movimientos_totales_cxc": {"SALDO_FACTURA",
                                                        "Z_IMPORTE"}},
    )
    return path


def _part(path: str, name: str) -> str:
    with zipfile.ZipFile(path) as zf:
        return zf.read(name).decode()


def test_all_parts_are_well_formed_xml(workbook_path):
    with zipfile.ZipFile(workbook_path) as zf:
        assert zf.testzip() is None
        for name in zf.namelist():
            ET.fromstring(zf.read(name))  # raises on malformed XML


def test_sheet_names_and_order(workbook_path):
    root = ET.fromstring(_part(workbook_path, "xl/workbook.xml"))
    names = [s.get("name") for s in root.findall(".//m:sheet", NS)]
    # empty frame skipped, declared order preserved
    assert names == ["resumen", "registros_totales_cxc",
                     "movimientos_totales_cxc"]


def test_header_and_calc_fills_present(workbook_path):
    styles = _part(workbook_path, "xl/styles.xml")
    assert "FF4472C4" in styles          # header blue
    assert "FF548235" in styles          # calculated-column green header
    assert "FFF2F2F2" in styles          # band fill
    assert "FFD9E2F3" in styles          # explicit band-group fill
    assert "Cambria" in styles
    assert 'formatCode="#,##0.00"' in styles
    assert 'formatCode="DD/MM/YYYY"' in styles
    assert 'formatCode="0.00%"' in styles


def test_header_row_uses_header_style(workbook_path):
    styles_root = ET.fromstring(_part(workbook_path, "xl/styles.xml"))
    xfs = styles_root.findall(".//m:cellXfs/m:xf", NS)
    sheet = ET.fromstring(_part(workbook_path, "xl/worksheets/sheet1.xml"))
    row1 = sheet.find(".//m:row[@r='1']", NS)
    for cell in row1.findall("m:c", NS):
        xf = xfs[int(cell.get("s"))]
        assert xf.get("fillId") in ("4", "5")   # header blue / calc green
        assert xf.get("fontId") == "1"          # bold white header font
        assert xf.get("borderId") == "1"        # thin border


def test_calc_columns_get_green_header(workbook_path):
    styles_root = ET.fromstring(_part(workbook_path, "xl/styles.xml"))
    xfs = styles_root.findall(".//m:cellXfs/m:xf", NS)
    sheet = ET.fromstring(_part(workbook_path, "xl/worksheets/sheet3.xml"))
    row1 = sheet.find(".//m:row[@r='1']", NS)
    fills = [xfs[int(c.get("s"))].get("fillId") for c in row1.findall("m:c", NS)]
    assert fills == ["4", "5", "5"]  # FOLIO blue; both calc cols green


def test_semantic_and_override_fills(workbook_path):
    styles_root = ET.fromstring(_part(workbook_path, "xl/styles.xml"))
    xfs = styles_root.findall(".//m:cellXfs/m:xf", NS)
    sheet = ET.fromstring(_part(workbook_path, "xl/worksheets/sheet1.xml"))

    def fills_of(row_ref):
        row = sheet.find(f".//m:row[@r='{row_ref}']", NS)
        return [xfs[int(c.get("s"))].get("fillId")
                for c in row.findall("m:c", NS)]

    # row 2 is the TOTAL row: every cell gray (fill 10), bold font
    assert set(fills_of(2)) == {"10"}
    # row 3 CLASIFICACION=A: green override (7)
    assert set(fills_of(3)) == {"7"}
    # row 4 has SALDO_PENDIENTE == 0 → muted zero fill (11)
    assert set(fills_of(4)) == {"11"}


def test_band_group_rows(workbook_path):
    styles_root = ET.fromstring(_part(workbook_path, "xl/styles.xml"))
    xfs = styles_root.findall(".//m:cellXfs/m:xf", NS)
    sheet = ET.fromstring(_part(workbook_path, "xl/worksheets/sheet2.xml"))
    for r, expected in ((2, "12"), (3, "12"), (4, "2")):  # band blue, white
        row = sheet.find(f".//m:row[@r='{r}']", NS)
        fills = {xfs[int(c.get("s"))].get("fillId")
                 for c in row.findall("m:c", NS)}
        assert fills == {expected}, (r, fills)
    # the helper column must not leak into the sheet
    row1 = sheet.find(".//m:row[@r='1']", NS)
    headers = [t.text for t in row1.findall(".//m:t", NS)]
    assert "_BAND_GROUP" not in headers


def test_protection_and_gridlines(workbook_path):
    s2 = _part(workbook_path, "xl/worksheets/sheet2.xml")
    assert '<sheetProtection sheet="1"' in s2
    assert f'password="{legacy_sheet_password_hash("prac")}"' in s2
    for i in (1, 3):
        assert '<sheetProtection' not in _part(
            workbook_path, f"xl/worksheets/sheet{i}.xml")
    assert 'showGridLines="0"' in s2


def test_number_formats_applied_to_body(workbook_path):
    styles_root = ET.fromstring(_part(workbook_path, "xl/styles.xml"))
    xfs = styles_root.findall(".//m:cellXfs/m:xf", NS)
    sheet = ET.fromstring(_part(workbook_path, "xl/worksheets/sheet1.xml"))
    row3 = sheet.find(".//m:row[@r='3']", NS)
    cells = row3.findall("m:c", NS)
    fmt = [xfs[int(c.get("s"))].get("numFmtId") for c in cells]
    # NOMBRE, TOTAL_CARGOS($), SALDO_PENDIENTE($), NUM_FACTURAS(int),
    # FECHA(date), PCT(%), CLASIFICACION
    assert fmt == ["0", "164", "164", "165", "166", "167", "0"]


def test_dates_written_as_excel_serials(workbook_path):
    sheet = ET.fromstring(_part(workbook_path, "xl/worksheets/sheet1.xml"))
    cell = sheet.find(".//m:row[@r='2']/m:c[@r='E2']", NS)
    assert cell.get("t") is None
    assert float(cell.find("m:v", NS).text) == 45293.0  # 2024-01-02


def test_string_escaping(workbook_path):
    # strings are interned in the shared table; the cell carries its index
    raw = _part(workbook_path, "xl/sharedStrings.xml")
    assert "Ana's &lt;Shop&gt;" in raw


def _sst_strings(path):
    root = ET.fromstring(_part(path, "xl/sharedStrings.xml"))
    return [t.text or "" for t in root.findall(".//m:si/m:t", NS)]


def test_shared_strings_dedup_and_resolution(workbook_path):
    root = ET.fromstring(_part(workbook_path, "xl/sharedStrings.xml"))
    assert int(root.get("uniqueCount")) < int(root.get("count"))

    strings = _sst_strings(workbook_path)
    assert len(strings) == len(set(strings))  # each stored once

    # every string cell's index resolves, and A2 resolves to TOTAL
    for i in (1, 2, 3):
        sheet = ET.fromstring(
            _part(workbook_path, f"xl/worksheets/sheet{i}.xml"))
        for cell in sheet.findall(".//m:c[@t='s']", NS):
            idx = int(cell.find("m:v", NS).text)
            assert 0 <= idx < len(strings)
    sheet1 = ET.fromstring(_part(workbook_path, "xl/worksheets/sheet1.xml"))
    a2 = sheet1.find(".//m:row[@r='2']/m:c[@r='A2']", NS)
    assert a2.get("t") == "s"
    assert strings[int(a2.find("m:v", NS).text)] == "TOTAL"


def test_shared_strings_shrink_repetitive_workbook():
    import os
    import tempfile

    rep = pd.DataFrame({
        "NOMBRE_CLIENTE": ["DISTRIBUIDORA DEL CENTRO SA DE CV"] * 400,
        "CONCEPTO": ["FACTURA DE VENTA MOSTRADOR"] * 400,
        "IMPORTE": [float(i) for i in range(400)],
    })
    d = tempfile.mkdtemp(prefix="xlsx_sst_")
    path = os.path.join(d, "rep.xlsx")
    write_styled_workbook(path, [("hoja", rep)])
    root = ET.fromstring(_part(path, "xl/sharedStrings.xml"))
    # 800 string cells (+3 headers) intern to 5 distinct strings
    assert int(root.get("uniqueCount")) == 5
    assert int(root.get("count")) == 803
    # and the sheet part itself carries no inline text at all
    assert "inlineStr" not in _part(path, "xl/worksheets/sheet1.xml")


def test_column_widths_clamped(workbook_path):
    sheet = ET.fromstring(_part(workbook_path, "xl/worksheets/sheet1.xml"))
    widths = [int(c.get("width")) for c in sheet.findall(".//m:cols/m:col", NS)]
    assert all(14 <= w <= 70 for w in widths)
    assert all(c.get("customWidth") == "1"
               for c in sheet.findall(".//m:cols/m:col", NS))


def test_password_hash_known_value():
    # well-known legacy hash test vector
    assert legacy_sheet_password_hash("password") == "83AF"
