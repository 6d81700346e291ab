"""Minimal stdlib xlsx codec (SURVEY §2.1 S6/S9).

The reference reads/writes Excel through pandas+openpyxl inside its
vendored converter (analisis-informe.ipynb:2806 c82) and report sink
(analisis-informe.ipynb:1052 c38). This container has no openpyxl, but
xlsx is just a zip of XML parts — a ~150-line stdlib codec covers the
reporting-table subset the reference uses: one sheet, header row, string
and numeric cells. Not supported (out of the reference's usage): dates,
formulas, styles, merged cells.

Excel is a driver-side small-table format; the Spark-facing wrappers in
readers.read_excel / writers.write_excel bound row counts accordingly.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REL_NS = "{http://schemas.openxmlformats.org/package/2006/relationships}"

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


def _col_letter(i: int) -> str:
    """0-based column index → A, B, ..., Z, AA, ..."""
    out = ""
    i += 1
    while i:
        i, rem = divmod(i - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def _col_index(ref: str) -> int:
    """Cell ref like 'BC12' → 0-based column index."""
    letters = re.match(r"[A-Z]+", ref).group(0)
    i = 0
    for ch in letters:
        i = i * 26 + (ord(ch) - ord("A") + 1)
    return i - 1


def _cell_xml(ref: str, value) -> str:
    if value is None:
        return ""
    if isinstance(value, bool):
        return f'<c r="{ref}" t="b"><v>{int(value)}</v></c>'
    if isinstance(value, (int, float)):
        return f'<c r="{ref}"><v>{value!r}</v></c>'
    return f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">{escape(str(value))}</t></is></c>'


def write_xlsx(
    path: str,
    header: list[str],
    rows: list[list],
    sheet_name: str = "Sheet1",
) -> None:
    """Write one worksheet: a header row of strings, then data rows of
    str/int/float/bool/None cells (inline strings — no sharedStrings
    part, so the file streams out row by row)."""
    lines = ["<sheetData>"]
    for r, row in enumerate([list(header)] + [list(x) for x in rows], start=1):
        cells = "".join(
            _cell_xml(f"{_col_letter(c)}{r}", v) for c, v in enumerate(row)
        )
        lines.append(f'<row r="{r}">{cells}</row>')
    lines.append("</sheetData>")
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        + "".join(lines)
        + "</worksheet>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES)
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr("xl/workbook.xml", _WORKBOOK.format(name=escape(sheet_name)))
        z.writestr("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS)
        z.writestr("xl/worksheets/sheet1.xml", sheet)


def _shared_strings(z: zipfile.ZipFile) -> list[str]:
    try:
        data = z.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    root = ET.fromstring(data)
    out = []
    for si in root.findall(f"{_NS}si"):
        out.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
    return out


def _sheet_target(z: zipfile.ZipFile, sheet: int | str) -> str:
    """Resolve a sheet index or name to its worksheet part path."""
    wb = ET.fromstring(z.read("xl/workbook.xml"))
    rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
    rid_ns = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"
    targets = {
        rel.get("Id"): rel.get("Target") for rel in rels.findall(f"{_REL_NS}Relationship")
    }
    sheets = wb.findall(f"{_NS}sheets/{_NS}sheet")
    if isinstance(sheet, str):
        match = [s for s in sheets if s.get("name") == sheet]
        if not match:
            raise KeyError(f"no sheet named {sheet!r}")
        chosen = match[0]
    else:
        chosen = sheets[sheet]
    target = targets[chosen.get(rid_ns)]
    return target if target.startswith("xl/") else f"xl/{target}"


def _cell_value(c: ET.Element, shared: list[str]):
    t = c.get("t", "n")
    if t == "inlineStr":
        return "".join(x.text or "" for x in c.iter(f"{_NS}t"))
    v = c.find(f"{_NS}v")
    if v is None or v.text is None:
        return None
    if t == "s":
        return shared[int(v.text)]
    if t == "str":
        return v.text
    if t == "b":
        return v.text == "1"
    num = float(v.text)
    return int(num) if num.is_integer() and "." not in v.text and "E" not in v.text.upper() else num


def read_xlsx(path: str, sheet: int | str = 0) -> tuple[list[str], list[list]]:
    """Read one worksheet → (header, rows). Handles inline and shared
    strings (so files from real Excel/openpyxl parse too), numbers, and
    bools; ragged rows are padded with None to the header width."""
    with zipfile.ZipFile(path) as z:
        shared = _shared_strings(z)
        root = ET.fromstring(z.read(_sheet_target(z, sheet)))
        grid: list[list] = []
        for row in root.find(f"{_NS}sheetData").findall(f"{_NS}row"):
            cells: dict[int, object] = {}
            for c in row.findall(f"{_NS}c"):
                cells[_col_index(c.get("r"))] = _cell_value(c, shared)
            width = max(cells) + 1 if cells else 0
            grid.append([cells.get(i) for i in range(width)])
    if not grid:
        return [], []
    header = [str(h) if h is not None else f"col{i}" for i, h in enumerate(grid[0])]
    width = len(header)
    rows = [r[:width] + [None] * (width - len(r)) for r in grid[1:]]
    return header, rows
