"""Structured Streaming replay: drain a multi-file binlog via
readStream+foreachBatch, assert final state equals the batch LWW result,
and that a second drain is a no-op (exactly-once)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fao_elt_pipelines_spark import binlog
from fao_elt_pipelines_spark.lake.table import LakeTable
from fao_elt_pipelines_spark.operators.dedup import lww_dedup
from fao_elt_pipelines_spark.streaming.stream_replay import stream_replay

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


@pytest.fixture(scope="module")
def binlog_dir(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("stream") / "binlog")
    # several files so maxFilesPerTrigger=2 yields multiple micro-batches
    binlog.change_events(spark, 10_000, n_repos=50, num_partitions=6).write.parquet(p)
    return p


def test_stream_replay_matches_batch_lww(spark, binlog_dir, tmp_path):
    table = LakeTable.create(spark, str(tmp_path / "state"), STATE_SCHEMA, n_buckets=8)
    stream_replay(spark, binlog_dir, table, str(tmp_path / "ckpt"), max_files_per_trigger=2)
    got = {
        (r["repo"], r["path"]): (r["commit"], r["content_sha256"], r["last_seq"])
        for r in table.read().collect()
    }
    events = spark.read.parquet(binlog_dir)
    want_df = lww_dedup(events).filter(F.col("op") != "delete")
    want = {
        (r["repo"], r["path"]): (
            r["commit"],
            r["content_sha256"],
            r["seq"],
        )
        for r in want_df.withColumn("content_sha256", F.sha2(F.col("content"), 256)).collect()
    }
    assert got == want
    n_snapshots = len(table.snapshots())
    assert n_snapshots >= 2  # multiple micro-batches hit the sink

    # drain again: offsets + committed-epoch guard make it a no-op
    stream_replay(spark, binlog_dir, table, str(tmp_path / "ckpt"), max_files_per_trigger=2)
    assert len(table.snapshots()) == n_snapshots


def test_stream_replay_maintains_mv(spark, binlog_dir, tmp_path):
    """Streaming MV maintenance: the per-batch refresh keeps the gold view
    equal to a full recompute once the drain finishes, and its cursor
    lands on the table's head snapshot."""
    from fao_elt_pipelines_spark.lake.mv import IncrementalGoldView, _contrib

    table = LakeTable.create(spark, str(tmp_path / "state"), STATE_SCHEMA, n_buckets=8)
    view = IncrementalGoldView(spark, table, str(tmp_path / "mv"))
    stream_replay(
        spark, binlog_dir, table, str(tmp_path / "ckpt"), max_files_per_trigger=2, mv=view
    )
    rows = lambda df: {tuple(r) for r in df.select("repo", "n_paths", "total_bytes").collect()}
    assert rows(view.read()) == rows(_contrib(table.read()))
    assert view.cursor()["snapshot_id"] == table.current_snapshot()["snapshot_id"]


def test_stream_replay_feeds_mirror(spark, binlog_dir, tmp_path):
    """Streaming CDC fan-out: each micro-batch advances a downstream
    mirror via the changelog, so at drain end the mirror's live state
    equals the source's, the mirror cursor sits on the source head, and
    a re-drain advances nothing (exactly-once on both hops)."""
    from fao_elt_pipelines_spark.lake.checkpoint import CheckpointStore

    table = LakeTable.create(spark, str(tmp_path / "state"), STATE_SCHEMA, n_buckets=8)
    tgt = LakeTable.create(spark, str(tmp_path / "mirror"), STATE_SCHEMA, n_buckets=8)
    mck = CheckpointStore(str(tmp_path / "mirror_cursor.json"))
    stream_replay(
        spark,
        binlog_dir,
        table,
        str(tmp_path / "ckpt"),
        max_files_per_trigger=2,
        mirror=(tgt, mck),
    )
    key = lambda t: {
        (r["repo"], r["path"]): (r["content_sha256"], r["last_seq"])
        for r in t.read().collect()
    }
    assert key(tgt) == key(table)
    head = table.current_snapshot()["snapshot_id"]
    assert mck.last_epoch("changelog-mirror") == head
    # mirror advanced per micro-batch, not once at the end
    assert len(tgt.snapshots()) >= 2

    n_tgt = len(tgt.snapshots())
    stream_replay(
        spark,
        binlog_dir,
        table,
        str(tmp_path / "ckpt"),
        max_files_per_trigger=2,
        mirror=(tgt, mck),
    )
    assert len(tgt.snapshots()) == n_tgt
    assert mck.last_epoch("changelog-mirror") == head


def test_repo_progress_stateful_stream(spark, binlog_dir, tmp_path):
    """applyInPandasWithState progress counters must survive across
    micro-batches: final per-repo (events, max_seq, deletes) equals the
    batch aggregate over the whole binlog."""
    from fao_elt_pipelines_spark.streaming.stream_replay import repo_progress_stream

    schema = spark.read.parquet(binlog_dir).schema
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(binlog_dir)
    )
    q = (
        repo_progress_stream(src)
        .writeStream.format("memory")
        .queryName("repo_progress")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_prog"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update mode emits one row per (repo, batch); counters are monotonic,
    # so the final value per repo is the max
    got = {
        r["repo"]: (r["events"], r["max_seq"], r["deletes"])
        for r in spark.sql(
            "SELECT repo, max(events) AS events, max(max_seq) AS max_seq, "
            "max(deletes) AS deletes FROM repo_progress GROUP BY repo"
        ).collect()
    }
    want = {
        r["repo"]: (r["events"], r["max_seq"], r["deletes"])
        for r in spark.read.parquet(binlog_dir)
        .groupBy("repo")
        .agg(
            F.count("*").alias("events"),
            F.max("seq").alias("max_seq"),
            F.sum(F.when(F.col("op") == "delete", 1).otherwise(0)).alias("deletes"),
        )
        .collect()
    }
    assert got == want


def test_stream_replay_wap_and_quarantine(spark, binlog_dir, tmp_path):
    """Streaming driver parity with the batch guards: malformed events
    dead-letter per micro-batch, every batch publishes through WAP, and
    the final state equals the plain streaming drain's (the injected bad
    rows never reach the merge)."""
    from fao_elt_pipelines_spark.lake.quarantine import read_dead_letters
    from fao_elt_pipelines_spark.lake.wap import basic_audit

    # dirty copy of the binlog: 3 malformed rows MIXED into shared files
    # (an all-dead-letters micro-batch would rightly fail the min-rows
    # audit — that refusal is itself WAP working, but not this test)
    events = spark.read.parquet(binlog_dir)
    dirty_dir = str(tmp_path / "dirty_binlog")
    bad = spark.createDataFrame(
        [
            (None, "p", "c", "py", "x", "insert", 10_000_000),
            ("r", "p", "c", "py", None, "insert", 10_000_001),
            ("r", "p2", "c", "py", "x", "chaos", 10_000_002),
        ],
        "repo string, path string, commit string, lang string, content string, op string, seq long",
    ).withColumn("ingest_ts", F.current_timestamp()).withColumn("epoch", F.lit(0).cast("long"))
    events.unionByName(bad.select(*events.columns)).repartition(4).write.parquet(dirty_dir)

    control = LakeTable.create(spark, str(tmp_path / "ctl"), STATE_SCHEMA, n_buckets=8)
    stream_replay(spark, binlog_dir, control, str(tmp_path / "ckpt_ctl"), max_files_per_trigger=3)

    table = LakeTable.create(spark, str(tmp_path / "state"), STATE_SCHEMA, n_buckets=8)
    qdir = str(tmp_path / "dead")
    stream_replay(
        spark, dirty_dir, table, str(tmp_path / "ckpt"), max_files_per_trigger=3,
        quarantine_dir=qdir,
        wap_audit=basic_audit(min_rows_written=1, max_quarantine_ratio=0.9),
    )
    dead = read_dead_letters(spark, qdir)
    reasons = {r["_dead_letter_reason"] for r in dead.collect()}
    assert dead.count() == 3 and reasons == {"null_key", "null_content", "unknown_op"}

    state = lambda t: {  # noqa: E731
        (r["repo"], r["path"]): (r["content_sha256"], r["last_seq"])
        for r in t.read().collect()
    }
    assert state(table) == state(control)
    # published through WAP: no staging refs left behind
    assert set(table.refs()) == {"main"}
