"""S6 Excel source: stdlib SpreadsheetML writer/reader roundtrip, chunked
scan boundaries, distributed fleet read, structure inference."""

import zipfile

from pyspark.sql import types as T

from fao_elt_pipelines_spark.sources import excel as X

COLS = ["id", "name", "score"]
ROWS = [[i, f"name-{i % 7}", i * 1.5 if i % 3 else None] for i in range(1, 251)]


def _wb(tmp_path, name="wb.xlsx", rows=ROWS):
    return X.write_xlsx(str(tmp_path / name), COLS, rows)


def test_roundtrip_values_and_types(tmp_path):
    p = _wb(tmp_path)
    got = list(X.iter_xlsx_rows(p))
    assert got[0] == COLS
    assert got[1] == [1, "name-1", 1.5]
    # None cell is simply absent in the XML; padded by the chunker
    assert got[3][:2] == [3, "name-3"] and len(got[3]) <= 3
    assert len(got) == 251
    # ints survive as ints (not floats) so keys join cleanly
    assert all(isinstance(r[0], int) for r in got[1:])


def test_writer_emits_real_spreadsheetml(tmp_path):
    p = _wb(tmp_path)
    with zipfile.ZipFile(p) as zf:
        names = set(zf.namelist())
    assert {"[Content_Types].xml", "xl/workbook.xml",
            "xl/worksheets/sheet1.xml", "xl/sharedStrings.xml"} <= names
    assert X.xlsx_sheet_names(p) == ["Sheet1"]


def test_chunked_read_boundaries(spark, tmp_path):
    p = _wb(tmp_path)
    df = X.read_excel_chunked(spark, p, chunk_size=64)  # 250 rows -> 4 chunks
    assert df.count() == 250
    assert df.columns == COLS
    assert df.filter("id = 17").first()["name"] == "name-3"


def test_chunked_read_max_rows(spark, tmp_path):
    p = _wb(tmp_path)
    df = X.read_excel_chunked(spark, p, chunk_size=10, max_rows=25)
    assert df.count() == 25


def test_chunked_read_headerless(spark, tmp_path):
    p = X.write_xlsx(str(tmp_path / "h.xlsx"), ["9", "x"], [[1, "a"], [2, "b"]])
    df = X.read_excel_chunked(spark, p, header=False)
    assert df.columns == ["c0", "c1"]
    assert df.count() == 3  # header row is data when header=False


def test_distributed_fleet_read(spark, tmp_path):
    paths = [
        X.write_xlsx(
            str(tmp_path / f"part{i}.xlsx"), COLS,
            [[i * 1000 + j, f"f{i}", float(j)] for j in range(40)],
        )
        for i in range(5)
    ]
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
    df = X.read_excel_distributed(spark, paths, schema)
    assert df.count() == 200
    assert df.select("name").distinct().count() == 5
    assert df.filter("id = 3005").first()["score"] == 5.0


def test_detect_structure(tmp_path):
    p = _wb(tmp_path)
    info = X.detect_excel_structure(p)
    assert info["sheet_names"] == ["Sheet1"]
    assert info["columns"] == COLS
    assert info["estimated_rows"] == 250
    assert len(info["sample"]) == 5


def test_writer_deterministic_bytes(tmp_path):
    p1 = _wb(tmp_path, "a.xlsx")
    p2 = _wb(tmp_path, "b.xlsx")
    assert open(p1, "rb").read() == open(p2, "rb").read()


def test_unicode_and_escaping(tmp_path):
    rows = [[1, "béta & <tag> \"q\"", 0.5], [2, "日本語", None]]
    p = X.write_xlsx(str(tmp_path / "u.xlsx"), ["id", "s", "v"], rows)
    got = list(X.iter_xlsx_rows(p))
    assert got[1][1] == 'béta & <tag> "q"'
    assert got[2][1] == "日本語"


def test_header_only_workbook_reads_empty(spark, tmp_path):
    p = X.write_xlsx(str(tmp_path / "empty.xlsx"), COLS, [])
    df = X.read_excel_chunked(spark, p)
    assert df.columns == COLS
    assert df.count() == 0


def test_distributed_empty_path_list(spark):
    schema = T.StructType([T.StructField("id", T.LongType())])
    df = X.read_excel_distributed(spark, [], schema)
    assert df.count() == 0 and df.schema == schema
