"""Chunked Excel (.xlsx) source — SURVEY §2.1 S6.

The reference reads Excel with pandas/openpyxl in a driver-side chunk
loop that RE-OPENS the workbook per chunk with ``skiprows`` — an O(n²)
scan (``/root/reference/ingestion/file_client.py:259-285``; structure
inference incl. sheet names :120-145). This sandbox has no openpyxl, so
the parser here is stdlib-only: .xlsx is a ZIP of SpreadsheetML XML, and
``zipfile`` + ``xml.etree.iterparse`` stream the sheet in ONE pass with
O(chunk) memory.

Scale shape (100 TB): a single .xlsx is an unsplittable zip stream —
like gzip'd CSV, per-FILE parallelism is the unit of scale. The
distributed path (``read_excel_distributed``) maps a DataFrame of file
paths through ``mapInPandas``: each executor task parses its files
locally and emits Arrow record batches, so a directory of thousands of
workbooks scans with full cluster parallelism and no driver data path.
The driver-side chunked variant (``read_excel_chunked``) mirrors the
reference's single-file API for parity and small interactive loads.

A minimal writer (``write_xlsx``) exists so tests and oracle queries can
round-trip deterministically without external libraries; it emits real
SpreadsheetML (shared-strings table + numeric cells) that Excel,
pandas, and this reader all open.
"""

from __future__ import annotations

import os
import re
import zipfile
from collections.abc import Iterator
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

_NS = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_REL_NS = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"


def _col_index(ref: str) -> int:
    """'A'→0, 'Z'→25, 'AA'→26 (cell ref column letters)."""
    idx = 0
    for ch in ref:
        if not ch.isalpha():
            break
        idx = idx * 26 + (ord(ch.upper()) - ord("A") + 1)
    return idx - 1


# ---------------------------------------------------------------- reader


def xlsx_sheet_names(path: str) -> list[str]:
    """Sheet-name listing (reference file_client.py:123-125 parity)."""
    with zipfile.ZipFile(path) as zf, zf.open("xl/workbook.xml") as f:
        root = ET.parse(f).getroot()
    return [
        el.get("name", "")
        for el in root.iter(f"{{{_NS}}}sheet")
    ]


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    if "xl/sharedStrings.xml" not in zf.namelist():
        return []
    out: list[str] = []
    with zf.open("xl/sharedStrings.xml") as f:
        for _, el in ET.iterparse(f):
            if el.tag == f"{{{_NS}}}si":
                # concat all <t> descendants (rich-text runs)
                out.append("".join(t.text or "" for t in el.iter(f"{{{_NS}}}t")))
                el.clear()
    return out


def _cell_value(el: ET.Element, shared: list[str]):
    t = el.get("t", "n")
    if t == "inlineStr":
        return "".join(x.text or "" for x in el.iter(f"{{{_NS}}}t"))
    v = el.find(f"{{{_NS}}}v")
    if v is None or v.text is None:
        return None
    if t == "s":
        return shared[int(v.text)]
    if t == "str":
        return v.text
    if t == "b":
        return v.text == "1"
    if t == "e":
        # formula error cell (#DIV/0!, #N/A, ...) — no usable value; one
        # bad cell must not abort the whole distributed read
        return None
    # numeric: int when exact so ids survive the round-trip
    num = float(v.text)
    return int(num) if num.is_integer() and abs(num) < 2**53 else num


def iter_xlsx_rows(path: str, sheet_xml: str = "xl/worksheets/sheet1.xml") -> Iterator[list]:
    """Stream rows of one sheet as lists (None-padded to the max seen
    column). Single forward pass, O(row) memory — the scalable form of
    the reference's skiprows re-scan loop (file_client.py:262-275)."""
    with zipfile.ZipFile(path) as zf:
        shared = _shared_strings(zf)
        with zf.open(sheet_xml) as f:
            row: list = []
            col = 0
            for ev, el in ET.iterparse(f, events=("start", "end")):
                if ev == "start" and el.tag == f"{{{_NS}}}row":
                    row, col = [], 0
                elif ev == "end" and el.tag == f"{{{_NS}}}c":
                    ref = el.get("r")
                    idx = _col_index(ref) if ref else col
                    while len(row) < idx:
                        row.append(None)
                    row.append(_cell_value(el, shared))
                    col = idx + 1
                    el.clear()
                elif ev == "end" and el.tag == f"{{{_NS}}}row":
                    yield row
                    el.clear()


def _header_cols(path: str, header: bool) -> list[str] | None:
    first = next(iter_xlsx_rows(path), None)
    if first is None:
        return None
    if header:
        return [str(c) for c in first]
    return [f"c{i}" for i in range(len(first))]


def _data_rows(path: str, header: bool, max_rows) -> Iterator[list]:
    it = iter_xlsx_rows(path)
    if header:
        next(it, None)
    for n, r in enumerate(it):
        if max_rows is not None and n >= max_rows:
            return
        yield r


def _chunks(path: str, n_cols: int, chunk_size: int, max_rows, header: bool):
    """Yield lists of None-padded rows, ``chunk_size`` at a time."""
    buf: list[list] = []
    for r in _data_rows(path, header, max_rows):
        buf.append((r + [None] * n_cols)[:n_cols])
        if len(buf) >= chunk_size:
            yield buf
            buf = []
    if buf:
        yield buf


def _column_types(path: str, n_cols: int, max_rows, header: bool) -> list[str]:
    """One streamed O(1)-memory pass → per-column Spark type names.
    Lattice: all-None → string; any str (or bool mixed with numbers) →
    string; any float → double; ints only → bigint; bools only → boolean."""
    kinds: list[set] = [set() for _ in range(n_cols)]
    for r in _data_rows(path, header, max_rows):
        for i, v in enumerate(r[:n_cols]):
            if v is None:
                continue
            kinds[i].add(
                bool if isinstance(v, bool) else type(v) if isinstance(v, (int, float, str)) else str
            )
    out = []
    for ks in kinds:
        if ks == {bool}:
            out.append("boolean")
        elif not ks or str in ks or bool in ks:
            out.append("string")
        elif float in ks:
            out.append("double")
        else:
            out.append("bigint")
    return out


def _coerce(v, t: str):
    if v is None:
        return None
    if t == "string":
        return v if isinstance(v, str) else str(v)
    if t == "double":
        return float(v)
    if t == "bigint":
        return int(v)
    return v  # boolean


def read_excel_chunked(
    spark,
    path: str,
    chunk_size: int = 10_000,
    max_rows: int | None = None,
    header: bool = True,
):
    """Single-workbook chunked read → Spark DataFrame (reference
    load_file_chunked parity, file_client.py:259-285), in true O(chunk)
    driver memory: pass 1 streams the sheet once to settle a unified
    per-column type, pass 2 spills each ``chunk_size`` slice as an Arrow
    parquet part into a temp dir, and the returned DataFrame is a lazy
    parquet scan over the spill — the workbook is never whole in memory
    (a pd.concat of all chunks would be, defeating the chunking). The
    spill lives in the system temp dir for the DataFrame's lifetime. For
    fleets of files use ``read_excel_distributed`` — this variant is the
    driver-side parity API, bounded by one workbook."""
    import atexit
    import shutil
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    cols = _header_cols(path, header)
    if cols is None:
        raise ValueError(f"empty workbook: {path}")
    types = _column_types(path, len(cols), max_rows, header)
    ddl = ", ".join(f"`{c}` {t}" for c, t in zip(cols, types))
    pa_types = {
        "string": pa.string(),
        "bigint": pa.int64(),
        "double": pa.float64(),
        "boolean": pa.bool_(),
    }
    arrow_schema = pa.schema([(c, pa_types[t]) for c, t in zip(cols, types)])
    tmpdir = tempfile.mkdtemp(prefix="xlsx_spill_")
    atexit.register(shutil.rmtree, tmpdir, ignore_errors=True)
    n_parts = 0
    for i, buf in enumerate(_chunks(path, len(cols), chunk_size, max_rows, header)):
        arrays = [
            pa.array([_coerce(row[j], types[j]) for row in buf], type=pa_types[types[j]])
            for j in range(len(cols))
        ]
        pq.write_table(
            pa.Table.from_arrays(arrays, schema=arrow_schema),
            os.path.join(tmpdir, f"part-{i:05d}.parquet"),
        )
        n_parts += 1
    if n_parts == 0:
        # header-only workbook (a just-initialized export is valid)
        return spark.createDataFrame([], ddl)
    return spark.read.schema(ddl).parquet(tmpdir)


def read_excel_distributed(spark, paths: list[str], schema, header: bool = True):
    """Fleet-of-workbooks scan: parallelize the PATH LIST, parse each
    file executor-side, emit Arrow batches via ``mapInPandas``. Scales
    with file count (the correct unit — a .xlsx zip stream is
    unsplittable); no driver data path, O(row-chunk) memory per task."""
    import pandas as pd

    if not paths:  # empty glob: an empty frame of the requested schema
        return spark.createDataFrame([], schema)
    path_df = spark.createDataFrame([(p,) for p in paths], "path string").repartition(
        min(len(paths), 64), "path"
    )
    names = [f.name for f in schema.fields]

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            for p in b["path"]:
                it = iter_xlsx_rows(p)
                hdr = next(it, None)
                if hdr is None:
                    continue
                rows = it if header else iter_xlsx_rows(p)
                buf: list[list] = []
                for r in rows:
                    buf.append((r + [None] * len(names))[: len(names)])
                    if len(buf) >= 10_000:
                        yield pd.DataFrame(buf, columns=names)
                        buf = []
                if buf:
                    yield pd.DataFrame(buf, columns=names)

    return path_df.mapInPandas(parse, schema=schema)


def detect_excel_structure(path: str, n_sample: int = 100) -> dict:
    """Sheet names + columns + sampled rows + row estimate (reference
    detect_file_structure Excel branch, file_client.py:120-145). The row
    count comes from the sheet's <dimension> ref when present (free),
    else a streamed count."""
    with zipfile.ZipFile(path) as zf:
        dim = None
        with zf.open("xl/worksheets/sheet1.xml") as f:
            for _, el in ET.iterparse(f):
                if el.tag == f"{{{_NS}}}dimension":
                    dim = el.get("ref")
                    break
    m = re.search(r"(\d+)$", dim) if dim and ":" in dim else None
    if m:
        # NOT exact: external writers pad or leave <dimension> stale
        # (Excel itself keeps formatted-but-empty trailing rows in it)
        est = max(0, int(m.group(1)) - 1)  # data rows below the header row
        exact = False
    else:  # no usable <dimension> (e.g. column-only ref 'A:C'): stream-count
        # max(0, ...): an empty sheet has no header row to subtract
        est = max(0, sum(1 for _ in iter_xlsx_rows(path)) - 1)
        exact = True
    rows = []
    it = iter_xlsx_rows(path)
    header = next(it, [])
    for r in it:
        rows.append(r)
        if len(rows) >= n_sample:
            break
    return {
        "sheet_names": xlsx_sheet_names(path),
        "columns": [str(c) for c in header],
        "estimated_rows": est,
        "row_count_exact": exact,
        "sample": rows[:5],
    }


# ---------------------------------------------------------------- writer


def _cell_xml(ref: str, v, sst: dict[str, int]) -> str:
    if v is None:
        return ""
    if isinstance(v, bool):
        return f'<c r="{ref}" t="b"><v>{1 if v else 0}</v></c>'
    if isinstance(v, (int, float)):
        return f'<c r="{ref}"><v>{v!r}</v></c>'
    s = str(v)
    if s not in sst:
        sst[s] = len(sst)
    return f'<c r="{ref}" t="s"><v>{sst[s]}</v></c>'


def _col_ref(idx: int) -> str:
    out = ""
    idx += 1
    while idx:
        idx, r = divmod(idx - 1, 26)
        out = chr(ord("A") + r) + out
    return out


def write_xlsx(path: str, columns: list[str], rows: list[list], sheet_name: str = "Sheet1") -> str:
    """Minimal deterministic SpreadsheetML writer (stdlib only): shared
    strings for text, inline numerics. Exists so S6 tests/oracles can
    round-trip without openpyxl; not a general-purpose writer."""
    sst: dict[str, int] = {}
    body: list[str] = []
    for rnum, row in enumerate([columns, *rows], start=1):
        cells = "".join(
            _cell_xml(f"{_col_ref(i)}{rnum}", v, sst) for i, v in enumerate(row)
        )
        body.append(f'<row r="{rnum}">{cells}</row>')
    n_rows = len(rows) + 1
    last = f"{_col_ref(max(0, len(columns) - 1))}{n_rows}"
    sheet = (
        f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<worksheet xmlns="{_NS}"><dimension ref="A1:{last}"/>'
        f'<sheetData>{"".join(body)}</sheetData></worksheet>'
    )
    sst_items = "".join(
        f"<si><t xml:space=\"preserve\">{escape(s)}</t></si>"
        for s, _ in sorted(sst.items(), key=lambda kv: kv[1])
    )
    shared = (
        f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<sst xmlns="{_NS}" count="{len(sst)}" uniqueCount="{len(sst)}">{sst_items}</sst>'
    )
    workbook = (
        f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<workbook xmlns="{_NS}" xmlns:r="{_REL_NS}"><sheets>'
        f'<sheet name="{escape(sheet_name)}" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/'
        'relationships/worksheet" Target="worksheets/sheet1.xml"/>'
        '<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/'
        'relationships/sharedStrings" Target="sharedStrings.xml"/>'
        "</Relationships>"
    )
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/'
        'relationships/officeDocument" Target="xl/workbook.xml"/>'
        "</Relationships>"
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.'
        'relationships+xml"/><Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-'
        'officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.'
        'openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        '<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.'
        'openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>'
        "</Types>"
    )
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        # fixed date_time → byte-deterministic archives for test hashing
        for name, data in [
            ("[Content_Types].xml", content_types),
            ("_rels/.rels", root_rels),
            ("xl/workbook.xml", workbook),
            ("xl/_rels/workbook.xml.rels", wb_rels),
            ("xl/sharedStrings.xml", shared),
            ("xl/worksheets/sheet1.xml", sheet),
        ]:
            zi = zipfile.ZipInfo(name, date_time=(2020, 1, 1, 0, 0, 0))
            zi.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(zi, data)
    return path
