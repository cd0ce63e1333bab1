"""Minimal XLSX reader (stdlib only: zipfile + ElementTree).

An ``.xlsx`` file is a zip of XML: ``xl/workbook.xml`` names the sheets,
``xl/sharedStrings.xml`` interns string cells, ``xl/worksheets/
sheetN.xml`` holds rows of typed cells. This reader covers the subset
golden-workbook fixtures need — shared/inline strings, numbers, and
date serials (Excel epoch 1899-12-30) — so the engine can load
spreadsheet-shaped sources without optional dependencies (openpyxl is
not available in this environment).

Returns plain Python structures; Spark conversion happens at the
caller (``spark.createDataFrame``).
"""

from __future__ import annotations

import re
import zipfile
from datetime import datetime, timedelta
from xml.etree import ElementTree as ET

__all__ = ["read_workbook", "sheet_to_rows", "EXCEL_EPOCH"]

_NS = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
_REL_NS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"

EXCEL_EPOCH = datetime(1899, 12, 30)


def _col_index(cell_ref: str) -> int:
    """``B7`` → 1 (0-based column index)."""
    letters = re.match(r"[A-Z]+", cell_ref).group(0)
    idx = 0
    for ch in letters:
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def read_workbook(path: str) -> dict[str, list[list[object]]]:
    """Read every sheet into ``{sheet_name: [[cell, ...], ...]}``.

    Cells are ``str`` (shared/inline strings), ``float``/``int``
    (numbers), ``bool``, or ``None`` for gaps; rows are padded to the
    widest row of the sheet.
    """
    with zipfile.ZipFile(path) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root.findall("m:si", _NS):
                shared.append("".join(t.text or "" for t in si.iter(f"{{{_NS['m']}}}t")))

        rels = {}
        rel_root = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        for rel in rel_root:
            rels[rel.get("Id")] = rel.get("Target")

        wb = ET.fromstring(z.read("xl/workbook.xml"))
        sheets: dict[str, list[list[object]]] = {}
        for sheet in wb.find("m:sheets", _NS):
            name = sheet.get("name")
            target = rels[sheet.get(_REL_NS)]
            if not target.startswith("xl/"):
                target = f"xl/{target}"
            sheets[name] = _parse_sheet(z.read(target), shared)
        return sheets


def _parse_cell(c: ET.Element, shared: list[str]) -> object:
    ctype = c.get("t", "n")
    v = c.find("m:v", _NS)
    if ctype == "inlineStr":
        is_el = c.find("m:is", _NS)
        return "".join(t.text or "" for t in is_el.iter(f"{{{_NS['m']}}}t")) if is_el is not None else None
    if v is None or v.text is None:
        return None
    if ctype == "s":
        return shared[int(v.text)]
    if ctype == "b":
        return v.text == "1"
    if ctype == "str":
        return v.text
    num = float(v.text)
    return int(num) if num == int(num) and abs(num) < 1e15 else num


def _parse_sheet(xml: bytes, shared: list[str]) -> list[list[object]]:
    root = ET.fromstring(xml)
    rows: list[list[object]] = []
    width = 0
    for row in root.iter(f"{{{_NS['m']}}}row"):
        cells: list[object] = []
        for c in row.findall("m:c", _NS):
            idx = _col_index(c.get("r", "A1"))
            while len(cells) < idx:
                cells.append(None)
            cells.append(_parse_cell(c, shared))
        width = max(width, len(cells))
        rows.append(cells)
    for r in rows:
        while len(r) < width:
            r.append(None)
    return rows


def sheet_to_rows(
    sheet: list[list[object]],
    date_cols: set[str] | None = None,
) -> tuple[list[str], list[list[object]]]:
    """First row → header (dropping ``Unnamed``-style blanks), remaining
    rows → data; all-empty rows dropped; columns named in ``date_cols``
    get Excel date serials converted to ``datetime``."""
    if not sheet:
        return [], []
    header_raw = sheet[0]
    keep = [i for i, h in enumerate(header_raw) if h not in (None, "")]
    header = [str(header_raw[i]).split(".")[-1] for i in keep]
    out = []
    for row in sheet[1:]:
        vals = [row[i] if i < len(row) else None for i in keep]
        if all(v is None or v == "" for v in vals):
            continue
        if date_cols:
            vals = [
                EXCEL_EPOCH + timedelta(days=v)
                if header[j] in date_cols and isinstance(v, (int, float))
                else v
                for j, v in enumerate(vals)
            ]
        out.append(vals)
    return header, out
