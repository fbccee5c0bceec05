"""Minimal stdlib-only .xlsx codec (S2 read / S4 report write).

The reference loads ``.xlsx`` inputs via ``pd.read_excel``
(/root/reference/src/io/file_handler.py:56-57) and writes a
multi-sheet review workbook with a highlighted probability column via
openpyxl (/root/reference/src/core/reporting_engine.py:184-228).
Neither openpyxl nor xlrd is available here, but xlsx is just a zip of
SpreadsheetML parts, so both directions are implemented directly:

- :func:`write_xlsx` — multi-sheet workbook, inline strings, a shared
  header style, and an optional solid-fill highlight on one column per
  sheet (the reference's ``FFF2CC`` fill on ``prob``).
- :func:`read_xlsx` — parses sheet XML with ``xml.etree``; handles
  inline strings, sharedStrings (what pandas/openpyxl emit), booleans
  and numbers, and sparse rows via cell references.

Both run on the driver over SMALL frames only — same as the
reference, where Excel touches only the final review bands (dozens to
thousands of rows). Bulk data stays in parquet/Iceberg; this module
asserts a row cap rather than pretending xlsx is a cluster format.
"""

from __future__ import annotations

import math
import re
import zipfile
import xml.etree.ElementTree as ET
from xml.sax.saxutils import escape, quoteattr

import pandas as pd

_MAX_REPORT_ROWS = 1_048_575  # xlsx hard sheet limit minus header
_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_HIGHLIGHT_RGB = "FFF2CC"  # reference's PatternFill color


def _col_letter(i: int) -> str:
    s = ""
    i += 1
    while i:
        i, r = divmod(i - 1, 26)
        s = chr(65 + r) + s
    return s


_XML_ILLEGAL = re.compile(
    "[\x00-\x08\x0b\x0c\x0e-\x1f]")  # chars XML 1.0 cannot carry at all


def _cell_xml(ref: str, v, style: int) -> str:
    s = f' s="{style}"' if style else ""
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return f'<c r="{ref}"{s}/>'
    if isinstance(v, bool):
        return f'<c r="{ref}"{s} t="b"><v>{int(v)}</v></c>'
    if isinstance(v, (int, float)):
        return f'<c r="{ref}"{s}><v>{v!r}</v></c>'
    # escape() covers &<>; control chars are ILLEGAL in XML 1.0 even
    # escaped — one such byte would corrupt the whole workbook, so
    # replace with U+FFFD (openpyxl raises; for a report, lossy beats
    # losing the file)
    txt = escape(_XML_ILLEGAL.sub("�", str(v)))
    return (f'<c r="{ref}"{s} t="inlineStr"><is>'
            f'<t xml:space="preserve">{txt}</t></is></c>')


def _sheet_xml(df: pd.DataFrame, highlight_col: str | None) -> str:
    hi = (list(df.columns).index(highlight_col)
          if highlight_col and highlight_col in df.columns else -1)
    rows = ['<row r="1">' + "".join(
        _cell_xml(f"{_col_letter(j)}1", c, 1)
        for j, c in enumerate(df.columns)) + "</row>"]
    for i, tup in enumerate(df.itertuples(index=False), start=2):
        cells = "".join(
            _cell_xml(f"{_col_letter(j)}{i}", v, 2 if j == hi else 0)
            for j, v in enumerate(tup))
        rows.append(f'<row r="{i}">{cells}</row>')
    return ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<worksheet xmlns="http://schemas.openxmlformats.org/'
            'spreadsheetml/2006/main"><sheetData>'
            + "".join(rows) + "</sheetData></worksheet>")


_STYLES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
    '<fonts count="2"><font/><font><b/></font></fonts>'
    '<fills count="3"><fill><patternFill patternType="none"/></fill>'
    '<fill><patternFill patternType="gray125"/></fill>'
    f'<fill><patternFill patternType="solid">'
    f'<fgColor rgb="{_HIGHLIGHT_RGB}"/><bgColor indexed="64"/></patternFill></fill></fills>'
    '<borders count="1"><border/></borders>'
    '<cellStyleXfs count="1"><xf/></cellStyleXfs>'
    '<cellXfs count="3"><xf/>'
    '<xf fontId="1" applyFont="1"/>'            # style 1: bold header
    '<xf fillId="2" applyFill="1"/></cellXfs>'  # style 2: highlight fill
    '</styleSheet>')


def write_xlsx(path: str, sheets: dict[str, pd.DataFrame],
               highlight: dict[str, str] | None = None) -> None:
    """Write a multi-sheet workbook. ``highlight`` maps sheet name ->
    column name to solid-fill (reference: the ``prob`` column of
    ``manual_review``)."""
    if not sheets:
        raise ValueError("write_xlsx: no sheets")
    highlight = highlight or {}
    for name, df in sheets.items():
        if len(df) > _MAX_REPORT_ROWS:
            raise ValueError(
                f"sheet {name!r} has {len(df)} rows; xlsx is a driver-side "
                f"report format — band/limit the frame first")
    names = list(sheets)
    ct = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
          '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
          '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
          '<Default Extension="xml" ContentType="application/xml"/>'
          '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
          '<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>'
          + "".join(f'<Override PartName="/xl/worksheets/sheet{i+1}.xml" '
                    'ContentType="application/vnd.openxmlformats-officedocument.'
                    'spreadsheetml.worksheet+xml"/>' for i in range(len(names)))
          + "</Types>")
    rels = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
            'officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
            '</Relationships>')
    wb = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
          '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
          'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
          '<sheets>'
          + "".join(f'<sheet name={quoteattr(n)} sheetId="{i+1}" r:id="rId{i+1}"/>'
                    for i, n in enumerate(names))
          + "</sheets></workbook>")
    nrel = len(names)
    wb_rels = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
               '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
               + "".join(f'<Relationship Id="rId{i+1}" Type="http://schemas.'
                         'openxmlformats.org/officeDocument/2006/relationships/worksheet" '
                         f'Target="worksheets/sheet{i+1}.xml"/>' for i in range(nrel))
               + f'<Relationship Id="rId{nrel+1}" Type="http://schemas.'
                 'openxmlformats.org/officeDocument/2006/relationships/styles" '
                 'Target="styles.xml"/>'
               + "</Relationships>")
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", ct)
        z.writestr("_rels/.rels", rels)
        z.writestr("xl/workbook.xml", wb)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        z.writestr("xl/styles.xml", _STYLES)
        for i, n in enumerate(names):
            z.writestr(f"xl/worksheets/sheet{i+1}.xml",
                       _sheet_xml(sheets[n], highlight.get(n)))


_REF_RE = re.compile(r"([A-Z]+)(\d+)")


def _ref_to_col(ref: str) -> int:
    m = _REF_RE.match(ref)
    n = 0
    for ch in m.group(1):
        n = n * 26 + (ord(ch) - 64)
    return n - 1


def _cell_value(c: ET.Element, shared: list[str]):
    t = c.get("t", "n")
    if t == "inlineStr":
        # concatenate ALL <t> runs: rich-text cells are <is><r><t>…
        # (a direct <is>/<t> lookup silently reads them as "")
        is_el = c.find(f"{_NS}is")
        if is_el is None:
            return ""
        return "".join(tn.text or "" for tn in is_el.iter(f"{_NS}t"))
    v = c.find(f"{_NS}v")
    if v is None or v.text is None:
        return None
    if t == "s":
        return shared[int(v.text)]
    if t == "b":
        return bool(int(v.text))
    if t in ("str", "e", "d"):
        # formula-string / error (#DIV/0!) / ISO-date cells: surface
        # the raw text rather than crashing float() on it
        return v.text
    try:
        f = float(v.text)
    except ValueError:
        return v.text  # unknown cell type: raw text beats an abort
    return int(f) if f.is_integer() and abs(f) < 2**53 else f


def read_xlsx(path: str, sheet: str | int = 0) -> pd.DataFrame:
    """Driver-side xlsx read (S2): first row = header, like
    ``pd.read_excel`` defaults. ``sheet`` is a name or 0-based index."""
    with zipfile.ZipFile(path) as z:
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        sheet_names = [s.get("name")
                       for s in wb.find(f"{_NS}sheets").findall(f"{_NS}sheet")]
        rids = [s.get("{http://schemas.openxmlformats.org/officeDocument"
                      "/2006/relationships}id")
                for s in wb.find(f"{_NS}sheets").findall(f"{_NS}sheet")]
        rel_root = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        targets = {r.get("Id"): r.get("Target") for r in rel_root}
        idx = (sheet_names.index(sheet) if isinstance(sheet, str)
               else int(sheet))
        target = targets[rids[idx]].lstrip("/")
        part = target if target.startswith("xl/") else f"xl/{target}"
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            for si in ET.fromstring(z.read("xl/sharedStrings.xml")):
                shared.append("".join(t.text or ""
                                      for t in si.iter(f"{_NS}t")))
        root = ET.fromstring(z.read(part))
        rows: list[dict[int, object]] = []
        for row in root.iter(f"{_NS}row"):
            cells = {}
            auto = 0
            for c in row.findall(f"{_NS}c"):
                ref = c.get("r")
                j = _ref_to_col(ref) if ref else auto
                auto = j + 1
                cells[j] = _cell_value(c, shared)
            rows.append(cells)
    if not rows:
        return pd.DataFrame()
    width = max(max(r) + 1 for r in rows if r) if any(rows) else 0
    header = [str(rows[0].get(j, f"col{j}")) for j in range(width)]
    # pandas-style dedup of repeated headers (id, id.1, ...): duplicate
    # names are common in hand-authored sheets, and a duplicated column
    # label breaks per-column operations downstream
    seen: dict[str, int] = {}
    for j, h in enumerate(header):
        if h in seen:
            seen[h] += 1
            header[j] = f"{h}.{seen[h]}"
        else:
            seen[h] = 0
    data = [[r.get(j) for j in range(width)] for r in rows[1:]]
    return pd.DataFrame(data, columns=header)
