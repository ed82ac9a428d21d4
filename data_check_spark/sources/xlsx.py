"""Minimal stdlib .xlsx reader for small aux files (keyword lists).

The reference loads keyword/customer lists directly from Excel sheets
(reference: dekispart.py:1178-1192 検索文字 extraction;
dekispart_school.py:130-153). Spark ships no Excel reader and this
environment has no openpyxl, so this module parses the OOXML container
directly with ``zipfile`` + ``xml.etree`` — sufficient for the flat
header-row sheets the aux files are (shared strings, inline strings and
number cells; no formula evaluation, no styles).

Scale note: aux keyword files are tiny by contract (the reference loads
them wholesale into pandas); this is a DRIVER-side read that feeds a
broadcast list / small DataFrame, never a distributed scan.
"""

from __future__ import annotations

import zipfile
from xml.etree import ElementTree as ET

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_NS_REL = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
_NS_PKG = "{http://schemas.openxmlformats.org/package/2006/relationships}"


def _col_index(cell_ref: str) -> int:
    """'BC12' -> zero-based column index 54."""
    idx = 0
    for ch in cell_ref:
        if ch.isalpha():
            idx = idx * 26 + (ord(ch.upper()) - 64)
        else:
            break
    return idx - 1


import re as _re

_OOXML_ESC = _re.compile(r"_x([0-9A-Fa-f]{4})_")


def _decode_ooxml_escapes(s: str) -> str:
    """Decode the _xHHHH_ escapes OOXML uses for XML-illegal characters
    (what Excel/openpyxl and our writer, reporting.export_xlsx, emit).
    A literal leading ``_x005F_`` escapes the underscore itself; a single
    left-to-right non-overlapping pass decodes both correctly."""
    return _OOXML_ESC.sub(lambda m: chr(int(m.group(1), 16)), s)


def _rich_text(el) -> str:
    """Concatenate the display text of an <si>/<is> element.

    Only plain <t> children and <t> inside run (<r>) children count —
    NOT descendants of <rPh> (phonetic ruby runs): Excel stores furigana
    alongside Japanese text typed via IME, and a blind ``iter('t')`` would
    silently corrupt 株式 into 株式カブシキ (openpyxl skips rPh the same way).
    """
    parts = []
    t = el.find(f"{_NS}t")
    if t is not None:
        parts.append(t.text or "")
    for r in el.findall(f"{_NS}r"):
        rt = r.find(f"{_NS}t")
        if rt is not None:
            parts.append(rt.text or "")
    return _decode_ooxml_escapes("".join(parts))


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        data = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    root = ET.fromstring(data)
    return [_rich_text(si) for si in root.findall(f"{_NS}si")]


def _sheet_path(zf: zipfile.ZipFile, sheet: str | None) -> str:
    """Resolve a sheet name to its worksheet part via workbook rels."""
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    target_by_rid = {
        r.get("Id"): r.get("Target") for r in rels.findall(f"{_NS_PKG}Relationship")
    }
    sheets = wb.findall(f"{_NS}sheets/{_NS}sheet")
    if not sheets:
        raise ValueError("xlsx has no sheets")
    chosen = sheets[0]
    if sheet is not None:
        by_name = {s.get("name"): s for s in sheets}
        if sheet not in by_name:
            raise ValueError(f"sheet {sheet!r} not found; have {sorted(by_name)}")
        chosen = by_name[sheet]
    target = target_by_rid[chosen.get(f"{_NS_REL}id")]
    return target if target.startswith("xl/") else f"xl/{target}"


def read_xlsx_rows(path: str, sheet: str | None = None) -> list[list[str | None]]:
    """All rows of one sheet as lists of cell strings (None = empty cell)."""
    with zipfile.ZipFile(path) as zf:
        strings = _shared_strings(zf)
        root = ET.fromstring(zf.read(_sheet_path(zf, sheet)))
        rows: list[list[str | None]] = []
        for row_el in root.iter(f"{_NS}row"):
            cells: list[str | None] = []
            for c in row_el.findall(f"{_NS}c"):
                idx = _col_index(c.get("r", ""))
                if idx < 0:
                    idx = len(cells)
                while len(cells) <= idx:
                    cells.append(None)
                ctype = c.get("t", "n")
                if ctype == "s":
                    v = c.find(f"{_NS}v")
                    cells[idx] = strings[int(v.text)] if v is not None else None
                elif ctype == "inlineStr":
                    is_el = c.find(f"{_NS}is")
                    cells[idx] = _rich_text(is_el) if is_el is not None else None
                else:  # n / str / b — take the raw value text
                    v = c.find(f"{_NS}v")
                    cells[idx] = v.text if v is not None else None
            rows.append(cells)
        return rows


def read_xlsx_df(spark, path: str, sheet: str | None = None):
    """Sheet → Spark DataFrame (first row = header, all columns string)."""
    rows = read_xlsx_rows(path, sheet)
    if not rows:
        raise ValueError(f"{path}: empty sheet")
    # Width = widest row, not the header: Excel omits trailing empty header
    # cells, and clamping to the header width would silently drop data
    # columns. Unheadered columns get generated _cN names.
    width_all = max(len(r) for r in rows)
    head_row = rows[0] + [None] * (width_all - len(rows[0]))
    header = [h if h is not None else f"_c{i}" for i, h in enumerate(head_row)]
    # Uniquify repeated header names (exported sheets repeat them routinely):
    # the first occurrence keeps the bare name, later ones gain _2, _3 … so
    # downstream F.col(name) never hits AMBIGUOUS_REFERENCE.
    seen: dict[str, int] = {}
    for i, h in enumerate(header):
        seen[h] = seen.get(h, 0) + 1
        if seen[h] > 1:
            header[i] = f"{h}_{seen[h]}"
    width = len(header)
    data = [tuple((r + [None] * width)[:width]) for r in rows[1:]]
    schema = ", ".join(f"`{h}` string" for h in header)
    return spark.createDataFrame(data, schema)
