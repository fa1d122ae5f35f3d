"""Self-contained XLSX read/write on the Python standard library
(zipfile + ElementTree) — no openpyxl/pandas-excel dependency.

An .xlsx file is a zip of SpreadsheetML XML parts; the subset a data
table needs (one worksheet, inline or shared strings, numeric cells) is
small enough to implement directly, which removes the optional-
dependency gate the reference carries for its xlnt backend
(src/IO.luna:94-123) — here XLSX works everywhere the engine does.

Scale posture matches feather: a spreadsheet is a single-machine
artifact by definition (one zip, one XML stream — Excel itself caps at
~1M rows), so both directions run driver-side on plot/interchange-sized
data; large data belongs in parquet. The writer guards with ``max_rows``
so a fact table cannot be serialized by mistake.

Writer output defaults to inline strings (``t="inlineStr"``) —
self-contained cells, no sharedStrings table to build;
``write_xlsx(..., shared_strings=True)`` switches to the deduplicated
workbook-level string table Excel itself writes (smaller files on
repetitive text). The reader handles both forms, any sheet count
(``sheet=`` name or index), and files from Excel/openpyxl.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

from pyspark.sql import DataFrame, SparkSession

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
</Types>"""

_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WORKBOOK = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
</workbook>"""

_WORKBOOK_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
</Relationships>"""


def _col_letter(idx: int) -> str:
    """0-based column index -> A, B, ..., Z, AA, ..."""
    s = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        s = chr(65 + rem) + s
    return s


def _col_index(ref: str) -> int:
    """A1-style cell reference -> 0-based column index."""
    n = 0
    for ch in ref:
        if not ch.isalpha():
            break
        n = n * 26 + (ord(ch.upper()) - 64)
    return n - 1


# NaN/±inf have no xlsx number representation; they travel as these
# canonical inline-string tokens, which the reader folds back into a
# DOUBLE column when they appear alongside (or instead of) numbers
_FLOAT_TOKENS = {"NaN": float("nan"), "INF": float("inf"), "-INF": float("-inf")}

_ESCAPE_SEQ = re.compile(r"_x([0-9A-Fa-f]{4})_")


def _esc_text(s: str) -> str:
    """Cell-text escaping: XML 1.0 cannot carry C0 control characters at
    all (not even as entities), so they use Excel's ``_xHHHH_``
    convention. EVERY literal underscore is escaped (``_x005F_``), not
    just those starting a candidate sequence: the selective form
    corrupts overlapping candidates like ``_x005F_x0001_`` (the shared
    underscore can only be escaped once), while with unconditional
    escaping every underscore in the output belongs to exactly one
    marker and the left-to-right unescape provably restores the
    original. The XML metacharacters &<> go through the normal entity
    escape."""
    s = s.replace("_", "_x005F_")
    s = "".join(
        f"_x{ord(ch):04X}_"
        if (ord(ch) < 0x20 and ch not in "\t\n\r") or ord(ch) == 0x7F
        else ch
        for ch in s
    )
    return escape(s)


def _unesc_text(s: str) -> str:
    return _ESCAPE_SEQ.sub(lambda m: chr(int(m.group(1), 16)), s)


def _cell_xml(ref: str, v, sst: dict | None = None) -> str:
    import datetime as _dt
    from decimal import Decimal

    if v is None:
        return ""
    if sst is not None and isinstance(v, str):
        # shared-strings mode: the cell stores an index into the
        # workbook-level string table — much smaller files when values
        # repeat (the reader handles t="s" and inlineStr alike)
        idx = sst.setdefault(v, len(sst))
        return f'<c r="{ref}" t="s"><v>{idx}</v></c>'
    if isinstance(v, bool):
        return f'<c r="{ref}" t="b"><v>{1 if v else 0}</v></c>'
    if isinstance(v, Decimal):
        # decimal text is a legal xlsx number; reads back as DOUBLE
        # (same INT64/DOUBLE conformance as the CSV path)
        return f'<c r="{ref}"><v>{v}</v></c>'
    if isinstance(v, (int, float)):
        if isinstance(v, float) and (v != v or v in (float("inf"), float("-inf"))):
            # t="str" (formula-string cell), NOT inlineStr: the cell
            # TYPE marks this as a float token, so a literal text value
            # "NaN" (always written as inlineStr) stays a string on read
            tok = "NaN" if v != v else ("INF" if v > 0 else "-INF")
            return f'<c r="{ref}" t="str"><v>{tok}</v></c>'
        return f'<c r="{ref}"><v>{v!r}</v></c>'
    if isinstance(v, (_dt.datetime, _dt.date)):
        # ISO-8601 string cell (no epoch-serial ambiguity; reads back as
        # a string column, parseable with to_timestamp)
        return (
            f'<c r="{ref}" t="inlineStr"><is><t>{v.isoformat(sep=" ") if isinstance(v, _dt.datetime) else v.isoformat()}'
            "</t></is></c>"
        )
    return f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">{_esc_text(str(v))}</t></is></c>'


_SST_CONTENT_TYPE = (
    '<Override PartName="/xl/sharedStrings.xml" ContentType="application/'
    'vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>'
)
_SST_REL = (
    '<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/>'
)


def write_xlsx(
    df: DataFrame,
    path: str,
    max_rows: int = 1_000_000,
    shared_strings: bool = False,
) -> None:
    """Write a DataFrame as a one-sheet .xlsx with a header row.
    Driver-side by design (a spreadsheet is a single-machine
    interchange artifact); ``max_rows`` guards against serializing a
    fact table — Excel's own sheet limit is 1,048,576 rows.

    ``shared_strings=True`` stores each distinct string ONCE in a
    workbook-level table and cells as indexes into it (the layout Excel
    itself writes) — smaller files when string values repeat; the
    default inline mode keeps cells self-contained. Both read back
    identically."""
    n = df.count()
    if n > max_rows:
        raise ValueError(
            f"xlsx write: {n} rows > max_rows={max_rows} (Excel caps at "
            "~1M rows; write parquet for data this size)"
        )
    rows = df.collect()
    cols = df.columns
    sst: dict | None = {} if shared_strings else None
    parts = ['<?xml version="1.0" encoding="UTF-8" standalone="yes"?>']
    parts.append(
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>'
    )
    header = "".join(
        _cell_xml(f"{_col_letter(j)}1", c, sst) for j, c in enumerate(cols)
    )
    parts.append(f'<row r="1">{header}</row>')
    for i, r in enumerate(rows, start=2):
        body = "".join(
            _cell_xml(f"{_col_letter(j)}{i}", r[j], sst) for j in range(len(cols))
        )
        parts.append(f'<row r="{i}">{body}</row>')
    parts.append("</sheetData></worksheet>")
    content_types = _CONTENT_TYPES
    wb_rels = _WORKBOOK_RELS
    if shared_strings:
        content_types = content_types.replace("</Types>", _SST_CONTENT_TYPE + "</Types>")
        wb_rels = wb_rels.replace("</Relationships>", _SST_REL + "</Relationships>")
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", content_types)
        z.writestr("_rels/.rels", _RELS)
        z.writestr("xl/workbook.xml", _WORKBOOK)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        z.writestr("xl/worksheets/sheet1.xml", "".join(parts))
        if sst is not None:
            sis = "".join(
                f'<si><t xml:space="preserve">{_esc_text(s)}</t></si>'
                for s in sst  # dict preserves insertion order = index order
            )
            # per OOXML spec count = TOTAL string-cell references in the
            # workbook, uniqueCount = distinct entries; each shared-string
            # cell emits exactly one t="s" token (and nothing else does —
            # t="str"/t="b"/t="inlineStr" don't match the closing quote)
            total_refs = sum(p.count(' t="s"') for p in parts)
            z.writestr(
                "xl/sharedStrings.xml",
                '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                '<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
                f' count="{total_refs}" uniqueCount="{len(sst)}">{sis}</sst>',
            )


def _shared_strings(z: zipfile.ZipFile) -> list[str]:
    try:
        data = z.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    out = []
    for si in ET.fromstring(data).iter(f"{_NS}si"):
        # an <si> may be one <t> or several <r><t> runs; concatenate
        out.append(
            _unesc_text("".join(t.text or "" for t in si.iter(f"{_NS}t")))
        )
    return out


def _first_sheet_name(z: zipfile.ZipFile) -> str:
    names = z.namelist()
    if "xl/worksheets/sheet1.xml" in names:
        return "xl/worksheets/sheet1.xml"
    sheets = sorted(
        n for n in names if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)
    )
    if not sheets:
        raise ValueError("xlsx: no worksheet part found")
    return sheets[0]


_R_NS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"


def sheet_names(z_or_path) -> list[str]:
    """Workbook sheet names in workbook order (pure stdlib)."""
    if isinstance(z_or_path, zipfile.ZipFile):
        return [name for name, _ in _sheet_parts(z_or_path)]
    with zipfile.ZipFile(z_or_path) as z:
        return [name for name, _ in _sheet_parts(z)]


def _sheet_parts(z: zipfile.ZipFile) -> list[tuple[str, str]]:
    """Ordered ``(sheet_name, part_path)`` for every worksheet, from
    xl/workbook.xml + its rels (the authoritative name->part mapping;
    part numbering need not match workbook order). Falls back to the
    filename scan for minimal producers without a workbook part."""
    try:
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
    except KeyError:
        return [("Sheet1", _first_sheet_name(z))]
    targets = {
        rel.get("Id"): rel.get("Target")
        for rel in rels.iter()
        if rel.tag.endswith("Relationship")
    }
    out = []
    for s in wb.iter(f"{_NS}sheet"):
        target = targets.get(s.get(f"{_R_NS}id"))
        if not target:
            continue
        # valid OOXML producers may emit absolute targets like
        # "/xl/worksheets/sheet1.xml" — strip the leading "/" BEFORE the
        # xl/ check, else the path doubles to "xl/xl/..." and the sheet
        # silently vanishes from the listing
        stripped = target.lstrip("/")
        part = stripped if stripped.startswith("xl/") else "xl/" + stripped
        if part in z.namelist():
            out.append((s.get("name") or f"Sheet{len(out) + 1}", part))
    return out or [("Sheet1", _first_sheet_name(z))]


def _resolve_sheet(z: zipfile.ZipFile, sheet) -> str:
    """``sheet=None`` -> first sheet; int -> 0-based workbook-order
    index; str -> sheet name (exact match)."""
    if sheet is None:
        return _sheet_parts(z)[0][1]
    parts = _sheet_parts(z)
    if isinstance(sheet, int):
        if not 0 <= sheet < len(parts):
            raise ValueError(
                f"xlsx: sheet index {sheet} out of range (workbook has "
                f"{len(parts)} sheet(s))"
            )
        return parts[sheet][1]
    for name, part in parts:
        if name == sheet:
            return part
    raise ValueError(
        f"xlsx: no sheet named {sheet!r}; workbook has "
        f"{[n for n, _ in parts]}"
    )


def read_xlsx_rows(path: str, sheet=None) -> tuple[list[str], list[list]]:
    """Parse one worksheet into (header, rows) of Python values:
    integral number cells -> int (exact, no 2^53 rounding), fractional
    -> float, boolean -> bool, strings (shared or inline, ``_xHHHH_``
    unescaped) -> str, absent cells -> None. Pure stdlib. ``sheet``
    selects the worksheet: None = first, int = 0-based workbook-order
    index, str = sheet name (``sheet_names`` lists them). Cell STYLES
    are not interpreted: a date-styled numeric serial from Excel comes
    back as its raw number (write dates as ISO strings, as
    ``write_xlsx`` does, to carry them through)."""
    with zipfile.ZipFile(path) as z:
        shared = _shared_strings(z)
        sheet_xml = ET.fromstring(z.read(_resolve_sheet(z, sheet)))
    raw: list[list] = []
    width = 0
    for row in sheet_xml.iter(f"{_NS}row"):
        cells: dict[int, object] = {}
        for c in row.iter(f"{_NS}c"):
            idx = _col_index(c.get("r", ""))
            if idx < 0:
                idx = max(cells, default=-1) + 1
            t = c.get("t", "n")
            if t == "inlineStr":
                is_el = c.find(f"{_NS}is")
                val = (
                    _unesc_text(
                        "".join(x.text or "" for x in is_el.iter(f"{_NS}t"))
                    )
                    if is_el is not None
                    else None
                )
            else:
                v_el = c.find(f"{_NS}v")
                if v_el is None or v_el.text is None:
                    val = None
                elif t == "s":
                    val = shared[int(v_el.text)]
                elif t == "b":
                    val = v_el.text == "1"
                elif t == "str":
                    # our writer emits NaN/inf as t="str" token cells;
                    # other producers' formula-string results pass
                    # through as text. CAVEAT (documented in read_xlsx):
                    # a third-party formula result whose text is exactly
                    # 'NaN'/'INF'/'-INF' is also decoded as the float —
                    # the price of roundtripping our own non-finite
                    # doubles; all other formula strings stay text
                    val = _FLOAT_TOKENS.get(
                        v_el.text, _unesc_text(v_el.text)
                    )
                elif re.fullmatch(r"-?\d+", v_el.text):
                    # integral text parses EXACTLY: float() would round
                    # 64-bit ids/hashes past 2^53 (silent off-by-one)
                    val = int(v_el.text)
                else:
                    val = float(v_el.text)
            cells[idx] = val
        width = max(width, max(cells, default=-1) + 1)
        raw.append([cells.get(j) for j in range(max(cells, default=-1) + 1)])
    if not raw:
        return [], []
    raw = [r + [None] * (width - len(r)) for r in raw]
    header = [str(v) if v is not None else f"_c{j}" for j, v in enumerate(raw[0])]
    return header, raw[1:]


def read_xlsx(spark: SparkSession, path: str, sheet=None) -> DataFrame:
    """XLSX -> DataFrame with the reference's type conformance (INT64 for
    whole-number columns, DOUBLE otherwise, string fallback on mixed
    columns — the same rule as CSV inference, csv.cpp:153-188; XLSX
    stores every number as a double, so int-ness is recovered by
    inspection).

    Non-finite tokens: formula-string (``t="str"``) cells whose text is
    exactly ``NaN``/``INF``/``-INF`` decode as the corresponding float —
    this is how ``write_xlsx``'s own non-finite doubles roundtrip, and
    it applies to third-party sheets too: a formula whose RESULT is the
    literal text 'NaN' becomes a number (and can tip an otherwise-text
    column to double under inference). Every other formula string stays
    text."""
    header, rows = read_xlsx_rows(path, sheet)
    if not header:
        raise ValueError(f"xlsx: {path} has no header row")
    cols: list[list] = list(map(list, zip(*rows))) if rows else [[] for _ in header]
    int64_min, int64_max = -(2**63), 2**63 - 1

    def is_num(v) -> bool:
        return isinstance(v, (int, float)) and not isinstance(v, bool)

    out_cols = []
    types = []
    for vals in cols:
        present = [v for v in vals if v is not None]
        # NaN/inf already arrive as floats (t="str" token cells decode
        # at parse time), so numeric inference is purely type-driven —
        # a literal "NaN" STRING (inlineStr) never flips a text column
        numericish = present and all(is_num(v) for v in present)
        if numericish and all(
            isinstance(v, int) and int64_min <= v <= int64_max for v in present
        ):
            out_cols.append(vals)
            types.append("long")
        elif numericish:
            out_cols.append(
                [None if v is None else float(v) for v in vals]
            )
            types.append("double")
        elif present and all(isinstance(v, bool) for v in present):
            out_cols.append(vals)
            types.append("boolean")
        else:
            out_cols.append(
                [str(v) if v is not None and not isinstance(v, str) else v for v in vals]
            )
            types.append("string")
    schema = ", ".join(
        f"`{c}` {t}" for c, t in zip(header, types)
    )
    data = [tuple(col[i] for col in out_cols) for i in range(len(rows))]
    return spark.createDataFrame(data, schema)
