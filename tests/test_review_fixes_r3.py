"""Round-3 review-fix regressions: schema widening (dead _WIDEN keys),
MOR NULL-seq corruption, expire(keep_last=0) no-op, sorted-LWW key-string
collisions, LSH band truncation, encoding-sniff boundary, Excel error
cells, chunked-Excel typing, and global_rank's long output."""

from xml.etree import ElementTree as ET

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fao_elt_pipelines_spark.functions import similarity as SIM
from fao_elt_pipelines_spark.lake import schema_evo as SE
from fao_elt_pipelines_spark.lake.table import LakeTable
from fao_elt_pipelines_spark.operators.rank import global_rank
from fao_elt_pipelines_spark.sources import excel as X
from fao_elt_pipelines_spark.sources.readers import sniff_encoding

STATE = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content", T.StringType()),
        T.StructField("content_sha256", T.StringType()),
        T.StructField("last_seq", T.LongType()),
    ]
)

DELTA_DDL = (
    "seq long, epoch long, op string, repo string, path string, "
    "commit string, lang string, content string"
)


# ---------------------------------------------------------- schema widening


def test_reconcile_widens_int_to_bigint():
    reg = SE.schema_to_registry(T.StructType([T.StructField("x", T.IntegerType())]))
    out = SE.reconcile(reg, T.StructType([T.StructField("x", T.LongType())]))
    assert out[0]["type"] == "bigint"


def test_reconcile_narrow_batch_into_wide_field():
    reg = SE.schema_to_registry(T.StructType([T.StructField("x", T.LongType())]))
    out = SE.reconcile(reg, T.StructType([T.StructField("x", T.IntegerType())]))
    assert out[0]["type"] == "bigint"


def test_reconcile_widens_legacy_registry_spellings():
    # registries written before the simpleString normalization
    out = SE.reconcile(
        [{"id": 1, "name": "x", "type": "integer"}],
        T.StructType([T.StructField("x", T.LongType())]),
    )
    assert out[0]["type"] == "bigint"
    out = SE.reconcile(
        [{"id": 1, "name": "x", "type": "float"}],
        T.StructType([T.StructField("x", T.DoubleType())]),
    )
    assert out[0]["type"] == "double"


def test_widening_end_to_end_through_append(spark, tmp_path):
    schema = T.StructType(
        [
            T.StructField("repo", T.StringType()),
            T.StructField("path", T.StringType()),
            T.StructField("size", T.IntegerType()),
        ]
    )
    table = LakeTable.create(spark, str(tmp_path / "t"), schema, n_buckets=2)
    table.append(spark.createDataFrame([("r", "p", 1)], schema))
    wide = spark.createDataFrame([("r", "q", 2**40)], "repo string, path string, size long")
    table.append(wide)
    got = table.read()
    assert dict(got.dtypes)["size"] == "bigint"
    assert got.filter("path = 'q'").first()["size"] == 2**40
    assert got.filter("path = 'p'").first()["size"] == 1


# ------------------------------------------------- MOR NULL-seq corruption


def test_mor_read_keeps_appended_rows_with_null_seq(spark, tmp_path):
    """append()-sourced rows carry last_seq NULL; a MOR delta in the same
    bucket must not collapse them to NULL structs (max_by skips NULL
    ordering values)."""
    table = LakeTable.create(spark, str(tmp_path / "t"), STATE, n_buckets=1)
    appended = spark.createDataFrame(
        [("r1", "p1", "c1", "py", "body1")],
        "repo string, path string, commit string, lang string, content string",
    )
    table.append(appended)
    delta = spark.createDataFrame(
        [(1, 0, "insert", "r2", "p2", "c2", "py", "body2")], DELTA_DDL
    )
    table.merge_changes(delta, epoch_id=0, mode="mor")
    got = {r["path"]: r for r in table.read().collect()}
    assert set(got) == {"p1", "p2"}
    assert got["p1"]["content"] == "body1"  # was silently NULLed pre-fix
    assert got["p2"]["content"] == "body2"
    # a real delta seq still outranks the appended row's NULL seq
    upd = spark.createDataFrame(
        [(2, 1, "insert", "r1", "p1", "c9", "py", "body1-v2")], DELTA_DDL
    )
    table.merge_changes(upd, epoch_id=1, mode="mor")
    assert table.read().filter("path = 'p1'").first()["content"] == "body1-v2"


# -------------------------------------------------- expire keep_last=0


def test_expire_keep_last_zero_age_only_retention(spark, tmp_path):
    table = LakeTable.create(spark, str(tmp_path / "t"), STATE, n_buckets=1)
    for e in range(3):
        d = spark.createDataFrame(
            [(e + 1, e, "insert", "r", f"p{e}", "c", "py", f"b{e}")], DELTA_DDL
        )
        table.merge_changes(d, epoch_id=e)
    res = table.expire_snapshots(keep_last=0, older_than_ms=1, _now_ms=2**60)
    assert res["expired"] == 2  # everything except the current head
    assert len(table.snapshots()) == 1
    assert table.read().count() == 3  # head still readable


# ------------------------------------------- sorted-LWW key collisions


def test_sorted_lww_separator_collision_keys(spark, tmp_path):
    """Distinct keys whose concat_ws('\\x00') encodings collide must both
    survive the sorted merge."""
    table = LakeTable.create(spark, str(tmp_path / "t"), STATE, n_buckets=1)
    rows = [
        (1, 0, "insert", "a", "b\x00c", "c1", "py", "one"),
        (2, 0, "insert", "a\x00b", "c", "c2", "py", "two"),
    ]
    table.merge_changes(
        spark.createDataFrame(rows, DELTA_DDL), epoch_id=0, strategy="sorted"
    )
    got = sorted((r["repo"], r["path"], r["content"]) for r in table.read().collect())
    assert got == [("a", "b\x00c", "one"), ("a\x00b", "c", "two")]


def test_sorted_lww_null_key_components_stay_distinct(spark, tmp_path):
    table = LakeTable.create(spark, str(tmp_path / "t"), STATE, n_buckets=1)
    rows = [
        (1, 0, "insert", "x", None, "c1", "py", "one"),
        (2, 0, "insert", None, "x", "c2", "py", "two"),
    ]
    table.merge_changes(
        spark.createDataFrame(rows, DELTA_DDL), epoch_id=0, strategy="sorted"
    )
    assert table.read().count() == 2


# ----------------------------------------------------------- LSH banding


def test_lsh_bands_rejects_indivisible_k(spark):
    sig = spark.createDataFrame([(1, 1, 2, 3)], "doc_id long, h0 long, h1 long, h2 long")
    with pytest.raises(ValueError, match="rows_per_band"):
        SIM.lsh_bands(sig, "doc_id", k=3, rows_per_band=2)


# ----------------------------------------------------- encoding sniff


def test_sniff_encoding_multibyte_at_sample_boundary(tmp_path):
    p = tmp_path / "big.csv"
    # 'é' straddles the 65536-byte sample cut: first byte in, second out
    p.write_bytes(b"a" * 65535 + "é".encode() + b"tail\n")
    assert sniff_encoding(str(p)) == "utf-8"
    q = tmp_path / "l1.csv"
    q.write_bytes(b"caf\xe9\n")  # latin-1 é, invalid utf-8 mid-sample
    assert sniff_encoding(str(q)) == "ISO-8859-1"  # JVM-canonical name


# ------------------------------------------------------------- Excel


def test_excel_error_cell_maps_to_none():
    el = ET.fromstring(f'<c xmlns="{X._NS}" t="e"><v>#DIV/0!</v></c>')
    assert X._cell_value(el, []) is None


def test_chunked_excel_int_column_with_gaps_stays_bigint(spark, tmp_path):
    rows = [[1, "a", 10], [2, "b", None], [3, "c", 30]]
    p = X.write_xlsx(str(tmp_path / "t.xlsx"), ["id", "s", "n"], rows)
    df = X.read_excel_chunked(spark, p, chunk_size=2)
    assert dict(df.dtypes) == {"id": "bigint", "s": "string", "n": "bigint"}
    got = {r["id"]: r["n"] for r in df.collect()}
    assert got == {1: 10, 2: None, 3: 30}


# ------------------------------------------------------------ global_rank


def test_global_rank_output_is_long(spark):
    df = spark.range(100).withColumn("v", F.col("id") % 10)
    out = global_rank(df, "v", "rnk", num_partitions=4)
    assert dict(out.dtypes)["rnk"] == "bigint"
