"""Ad-hoc SQL surface (SURVEY §3.3): the reference pipes
sql/sample_queries.sql through psql (/root/reference/Makefile:106-107);
here the analogue is `table_tool sql` registering a lake snapshot as a temp
view and running spark.sql. Statement splitting, view registration, and the
CLI are each driven — the CLI test runs sql/sample_queries.sql end-to-end
at the process level against a freshly replayed table."""

import json
import os
import subprocess
import sys

import pytest
from pyspark.sql import types as T

from fao_elt_pipelines_spark import binlog
from fao_elt_pipelines_spark.lake import sql_surface as S
from fao_elt_pipelines_spark.lake.checkpoint import CheckpointStore
from fao_elt_pipelines_spark.lake.replay import replay
from fao_elt_pipelines_spark.lake.table import LakeTable

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO, "scripts", "table_tool.py")
SAMPLE_SQL = os.path.join(REPO, "sql", "sample_queries.sql")

STATE_SCHEMA = T.StructType(
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


def test_split_statements():
    text = """
    -- leading comment;
    SELECT 1; SELECT 'a;b' AS s;
    SELECT 'it''s; fine' AS t
    ; -- trailing comment only
    """
    stmts = S.split_statements(text)
    assert len(stmts) == 3
    assert stmts[0].endswith("SELECT 1")
    assert "'a;b'" in stmts[1]
    assert "'it''s; fine'" in stmts[2]
    assert S.split_statements("-- only comments;\n  \n") == []
    # ';' and '--' inside double-quoted strings / backquoted identifiers
    # are literal text, not separators or comment starts
    quoted = S.split_statements(
        'SELECT "a;b" AS s; SELECT `odd;--col` FROM t; SELECT "x--y" AS z'
    )
    assert len(quoted) == 3
    assert '"a;b"' in quoted[0]
    assert "`odd;--col`" in quoted[1]
    assert '"x--y"' in quoted[2]


@pytest.fixture(scope="module")
def state_table(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("sqlsurface")
    table = LakeTable.create(spark, str(root / "state"), STATE_SCHEMA, n_buckets=4)
    ev = binlog.change_events(
        spark, 8_000, n_repos=40, paths_per_repo=30, events_per_epoch=4_000
    )
    replay(spark, ev, table, CheckpointStore(str(root / "ckpt.json")))
    return table


def test_register_and_run(spark, state_table):
    S.register_table_view(state_table, "state")
    rows = spark.sql(
        "SELECT lang, COUNT(*) AS n FROM state GROUP BY lang ORDER BY n DESC, lang"
    ).collect()
    assert len(rows) >= 2 and all(r["n"] > 0 for r in rows)
    # results agree with the DataFrame read path on the same snapshot
    df_counts = {
        (r["lang"], r["n"])
        for r in state_table.read().groupBy("lang").count()
        .withColumnRenamed("count", "n").collect()
    }
    assert {(r["lang"], r["n"]) for r in rows} == df_counts


def test_view_is_snapshot_pinned(spark, state_table, tmp_path):
    """The view pins the snapshot resolved at registration: a later commit
    must not change what the registered view returns."""
    from pyspark.sql import functions as F

    S.register_table_view(state_table, "pinned")
    before = spark.sql("SELECT COUNT(*) AS n FROM pinned").first()["n"]
    before_max = spark.sql("SELECT MAX(last_seq) AS m FROM pinned").first()["m"]
    # seqs shifted above the fixture's range so these events WIN last-write-
    # wins — the head observably moves (max last_seq rises to >= 100_000)
    extra = binlog.change_events(spark, 2_000, n_repos=40, paths_per_repo=30,
                                 events_per_epoch=2_000)
    extra = extra.withColumn("seq", F.col("seq") + 100_000)
    replay(spark, extra, state_table, CheckpointStore(str(tmp_path / "c2.json")),
           source="extra")
    # still pinned: neither the count nor the max moved
    assert spark.sql("SELECT COUNT(*) AS n FROM pinned").first()["n"] == before
    assert spark.sql("SELECT MAX(last_seq) AS m FROM pinned").first()["m"] == before_max
    S.register_table_view(state_table, "pinned")  # re-register sees new head
    assert before_max < 100_000
    assert spark.sql("SELECT MAX(last_seq) AS m FROM pinned").first()["m"] >= 100_000


@pytest.mark.slow
def test_cli_sample_queries_process_level(state_table):
    """Drive sql/sample_queries.sql through the CLI in a separate process:
    every statement must produce a header + at least one row."""
    out = subprocess.run(
        [sys.executable, TOOL, "--table", state_table.path, "--cores", "4",
         "sql", "--file", SAMPLE_SQL, "--limit", "5"],
        capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [json.loads(line) for line in out.stdout.splitlines() if line.strip()]
    headers = [l for l in lines if "statement_index" in l]
    assert len(headers) >= 3  # the file carries 7 statements
    by_stmt: dict[int, int] = {}
    cur = None
    for l in lines:
        if "statement_index" in l:
            cur = l["statement_index"]
            by_stmt[cur] = 0
        else:
            by_stmt[cur] += 1
    assert all(n >= 1 for n in by_stmt.values()), by_stmt


def test_cli_single_statement_and_extra_parquet(state_table, tmp_path, spark):
    """One-shot statement form, with a side parquet view joined in."""
    side = str(tmp_path / "langs.parquet")
    spark.createDataFrame(
        [("py", "python"), ("js", "javascript"), ("rs", "rust")],
        ["lang", "long_name"],
    ).write.parquet(side)
    out = subprocess.run(
        [sys.executable, TOOL, "--table", state_table.path, "--cores", "4",
         "sql", "--parquet", f"langs={side}",
         "SELECT l.long_name, COUNT(*) AS n FROM state s JOIN langs l "
         "ON s.lang = l.lang GROUP BY 1 ORDER BY 2 DESC, 1"],
        capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rows = [json.loads(l) for l in out.stdout.splitlines() if l.strip()]
    data = [r for r in rows if "long_name" in r]
    assert {r["long_name"] for r in data} <= {"python", "javascript", "rust"}
    assert len(data) == 3
