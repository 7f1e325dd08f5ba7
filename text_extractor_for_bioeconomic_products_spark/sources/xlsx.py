"""Minimal pure-stdlib XLSX writer (S10 fallback engine).

An ``.xlsx`` file is a ZIP of OOXML parts (ECMA-376, a public spec);
this module emits the smallest valid subset — one workbook, N
worksheets, inline strings (no sharedStrings table, no styles) — using
only ``zipfile`` and string formatting.  It exists so the S10
multi-sheet Excel sink (reference `src/storage/export_manager.py:251-321`)
produces a REAL workbook even in this container, which ships neither
openpyxl nor xlsxwriter; when a richer engine is importable the sink
prefers it.

Fidelity contract: cell VALUES and sheet STRUCTURE only — no styling,
column widths, or formulas (the reference's export is data-only too).
Output is deterministic: fixed timestamps in the ZIP entries, fixed
part order, no RNG/clock.
"""

from __future__ import annotations

import re
import zipfile
from typing import Any, Dict, List, Sequence, Tuple

# XML 1.0 forbids most control chars even escaped; strip rather than emit
# an unreadable workbook (mirrors what openpyxl's ILLEGAL_CHARACTERS_RE does)
_ILLEGAL_XML_RE = re.compile(
    "[\x00-\x08\x0b\x0c\x0e-\x1f\x7f\ud800-\udfff￾￿]"
)

_SHEET_NAME_BAD = re.compile(r"[][*?/\\:]")

# fixed ZIP entry timestamp (determinism: never the clock)
_ZIP_DATE = (2026, 1, 1, 0, 0, 0)

_CONTENT_TYPES_HEAD = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType='
    '"application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType='
    '"application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
)

_ROOT_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
    "</Relationships>"
)


def _xml_escape(s: str) -> str:
    s = _ILLEGAL_XML_RE.sub("", s)
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        .replace('"', "&quot;")
    )


def column_letter(idx: int) -> str:
    """0-based column index → A, B, …, Z, AA, AB, …"""
    letters = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        letters = chr(ord("A") + rem) + letters
    return letters


def _cell_xml(ref: str, v: Any) -> str:
    if v is None:
        return ""
    if isinstance(v, bool):
        return f'<c r="{ref}" t="b"><v>{int(v)}</v></c>'
    if isinstance(v, int):
        return f'<c r="{ref}"><v>{v}</v></c>'
    if isinstance(v, float):
        if v != v or v in (float("inf"), float("-inf")):  # NaN/inf: no XLSX number form
            return f'<c r="{ref}" t="inlineStr"><is><t>{v!r}</t></is></c>'
        return f'<c r="{ref}"><v>{v!r}</v></c>'
    if isinstance(v, (list, tuple)):
        v = ", ".join(str(x) for x in v)
    return f'<c r="{ref}" t="inlineStr"><is><t>{_xml_escape(str(v))}</t></is></c>'


def _sheet_xml(header: Sequence[str], rows: Sequence[Sequence[Any]]) -> str:
    parts = [
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main"><sheetData>'
    ]
    for r, row in enumerate([list(header)] + [list(r) for r in rows], start=1):
        cells = "".join(
            _cell_xml(f"{column_letter(c)}{r}", v) for c, v in enumerate(row)
        )
        parts.append(f'<row r="{r}">{cells}</row>')
    parts.append("</sheetData></worksheet>")
    return "".join(parts)


def sanitize_sheet_name(name: str, taken: set) -> str:
    """Excel sheet-name rules: ≤31 chars, no []*?/\\: and unique."""
    base = _SHEET_NAME_BAD.sub("_", name)[:31] or "Sheet"
    out, n = base, 1
    while out in taken:
        suffix = f"_{n}"
        out, n = base[: 31 - len(suffix)] + suffix, n + 1
    taken.add(out)
    return out


def write_xlsx(
    path: str,
    sheets: Dict[str, Tuple[Sequence[str], Sequence[Sequence[Any]]]],
) -> None:
    """Write ``{sheet_name: (header, rows)}`` as a valid minimal workbook."""
    if not sheets:
        raise ValueError("write_xlsx requires at least one sheet")
    taken: set = set()
    named: List[Tuple[str, Sequence[str], Sequence[Sequence[Any]]]] = [
        (sanitize_sheet_name(name, taken), header, rows)
        for name, (header, rows) in sheets.items()
    ]
    ct = [_CONTENT_TYPES_HEAD]
    wb = [
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
        ' xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        "<sheets>"
    ]
    wb_rels = [
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns='
        '"http://schemas.openxmlformats.org/package/2006/relationships">'
    ]
    for i, (name, _, _) in enumerate(named, start=1):
        ct.append(
            f'<Override PartName="/xl/worksheets/sheet{i}.xml" ContentType='
            '"application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        )
        wb.append(
            f'<sheet name="{_xml_escape(name)}" sheetId="{i}" r:id="rId{i}"/>'
        )
        wb_rels.append(
            f'<Relationship Id="rId{i}" Type="http://schemas.openxmlformats.org/'
            f'officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheet{i}.xml"/>'
        )
    ct.append("</Types>")
    wb.append("</sheets></workbook>")
    wb_rels.append("</Relationships>")

    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        def add(arcname: str, data: str) -> None:
            info = zipfile.ZipInfo(arcname, date_time=_ZIP_DATE)
            info.compress_type = zipfile.ZIP_DEFLATED
            z.writestr(info, data.encode("utf-8"))

        add("[Content_Types].xml", "".join(ct))
        add("_rels/.rels", _ROOT_RELS)
        add("xl/workbook.xml", "".join(wb))
        add("xl/_rels/workbook.xml.rels", "".join(wb_rels))
        for i, (_, header, rows) in enumerate(named, start=1):
            add(f"xl/worksheets/sheet{i}.xml", _sheet_xml(header, rows))
