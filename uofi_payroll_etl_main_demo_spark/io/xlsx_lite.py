"""Minimal pure-stdlib .xlsx reader/writer (fallback for the Excel
bridge when openpyxl is absent).

An .xlsx file is a zip of XML parts (ECMA-376 / ISO 29500 SpreadsheetML,
public spec). This module implements the small subset the reference's
payroll workbooks need (etl_payroll_pipeline_demo.py:94,102,161 ingest;
460-461,780-781 sink): one worksheet of scalar cells — inline/shared
strings, numbers, booleans, blanks. No styles, formulas, merged cells,
or dates-as-serials (dates should be written as ISO strings).

Driver-side by design, exactly like the pandas/openpyxl bridge it
backs up: workbooks are human-sized artifacts, never the 100 TB path.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REL_NS = "{http://schemas.openxmlformats.org/package/2006/relationships}"
_DOC_REL = (
    "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
)

_CELL_REF = re.compile(r"([A-Z]+)(\d+)")


def _col_index(ref: str) -> int:
    """'A' -> 0, 'B' -> 1, ..., 'AA' -> 26 (cell ref column part)."""
    n = 0
    for ch in ref:
        n = n * 26 + (ord(ch) - 64)
    return n - 1


def _col_name(i: int) -> str:
    out = ""
    i += 1
    while i:
        i, r = divmod(i - 1, 26)
        out = chr(65 + r) + out
    return out


def read_xlsx(path: str, sheet: int | str = 0) -> list[list]:
    """Read one worksheet → list of rows (list of str/float/bool/None).

    ``sheet`` is a 0-based index or a sheet name. Rows are padded to the
    rectangular width implied by the right-most populated cell.
    """
    with zipfile.ZipFile(path) as z:
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        rid_to_target = {
            r.get("Id"): r.get("Target") for r in rels.iter(f"{_REL_NS}Relationship")
        }
        sheets = wb.find(f"{_NS}sheets")
        if sheets is None:
            raise ValueError(f"{path}: workbook has no sheets element")
        chosen = None
        for i, s in enumerate(sheets.iter(f"{_NS}sheet")):
            name = s.get("name")
            if (isinstance(sheet, int) and i == sheet) or name == sheet:
                chosen = s
                break
        if chosen is None:
            raise ValueError(f"{path}: sheet {sheet!r} not found")
        target = rid_to_target[chosen.get(f"{_DOC_REL}id")]
        if not target.startswith("/"):
            target = "xl/" + target
        else:
            target = target.lstrip("/")

        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            sst = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in sst.iter(f"{_NS}si"):
                # concatenate all text runs (plain or rich-text)
                shared.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))

        ws = ET.fromstring(z.read(target))
        rows: list[list] = []
        width = 0
        for row in ws.iter(f"{_NS}row"):
            out: list = []
            for cell in row.iter(f"{_NS}c"):
                ref = cell.get("r") or ""
                m = _CELL_REF.match(ref)
                col = _col_index(m.group(1)) if m else len(out)
                while len(out) < col:
                    out.append(None)
                ctype = cell.get("t", "n")
                v = cell.find(f"{_NS}v")
                if ctype == "inlineStr":
                    is_el = cell.find(f"{_NS}is")
                    val = (
                        "".join(t.text or "" for t in is_el.iter(f"{_NS}t"))
                        if is_el is not None
                        else None
                    )
                elif v is None or v.text is None:
                    val = None
                elif ctype == "s":
                    val = shared[int(v.text)]
                elif ctype == "b":
                    val = v.text == "1"
                elif ctype == "str":  # cached formula result
                    val = v.text
                else:  # "n"
                    val = float(v.text)
                out.append(val)
            width = max(width, len(out))
            rows.append(out)
        for r in rows:
            r.extend([None] * (width - len(r)))
        return rows


_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WORKBOOK = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets><sheet name="{name}" sheetId="1" r:id="rId1"/></sheets>
</workbook>"""

_WORKBOOK_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
</Relationships>"""


def write_xlsx(rows: list[list], path: str, sheet_name: str = "Sheet1") -> None:
    """Write rows (scalars: str/int/float/bool/None) to a one-sheet
    .xlsx. Strings are written inline (no sharedStrings part), numbers
    as numeric cells, booleans as boolean cells, None as a blank."""
    cells_xml: list[str] = []
    for ri, row in enumerate(rows, start=1):
        parts = [f'<row r="{ri}">']
        for ci, val in enumerate(row):
            ref = f"{_col_name(ci)}{ri}"
            if val is None:
                continue
            if isinstance(val, bool):
                parts.append(f'<c r="{ref}" t="b"><v>{1 if val else 0}</v></c>')
            elif isinstance(val, (int, float)):
                parts.append(f'<c r="{ref}"><v>{val!r}</v></c>')
            else:
                s = escape(str(val))
                parts.append(
                    f'<c r="{ref}" t="inlineStr"><is>'
                    f'<t xml:space="preserve">{s}</t></is></c>'
                )
        parts.append("</row>")
        cells_xml.append("".join(parts))
    sheet_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main"><sheetData>'
        + "".join(cells_xml)
        + "</sheetData></worksheet>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES)
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr("xl/workbook.xml", _WORKBOOK.format(name=escape(sheet_name)))
        z.writestr("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS)
        z.writestr("xl/worksheets/sheet1.xml", sheet_xml)
