"""Round-4 review-fix regressions: late-strategy NULL-seq retention, the
mirror tombstone's null-safe seq, publish() self/main guards, overwrite's
table-level exactly-once, the VERSION pointer's serialized advance, and
connected_components releasing its edge cache."""

import json
import os
import threading

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fao_elt_pipelines_spark.lake.changelog import replicate
from fao_elt_pipelines_spark.lake.checkpoint import CheckpointStore
from fao_elt_pipelines_spark.lake.table import LakeTable

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

APPEND_DDL = (
    "repo string, path string, commit string, lang string, "
    "content string, content_sha256 string"
)
DELTA_DDL = (
    "seq long, op string, repo string, path string, "
    "commit string, lang string, content string"
)


# ------------------------------------------------- late LWW NULL-seq rows


@pytest.mark.parametrize("strategy", ["late", "sorted"])
def test_merge_keeps_null_seq_appended_rows(spark, tmp_path, strategy):
    """append()-sourced rows carry last_seq NULL (schema_evo backfill). A
    COW merge that rewrites their bucket re-enters them as seq-NULL events;
    BOTH strategies must keep them (the late strategy's max()+semi-join
    winner selection silently dropped all-NULL keys before the null
    normalization), and a real-seq event for the same key must win."""
    table = LakeTable.create(spark, str(tmp_path / f"t_{strategy}"), STATE, n_buckets=1)
    table.append(
        spark.createDataFrame(
            [
                ("r0", "keep/me.py", "c0", "py", "X", "sha-x"),
                ("r0", "update/me.py", "c0", "py", "OLD", "sha-old"),
            ],
            APPEND_DDL,
        ),
        epoch_id=0,
    )
    delta = spark.createDataFrame(
        [
            (10, "insert", "r0", "other.py", "c1", "py", "B"),
            (11, "update", "r0", "update/me.py", "c2", "py", "NEW"),
        ],
        DELTA_DDL,
    )
    table.merge_changes(delta, epoch_id=1, mode="cow", strategy=strategy)
    rows = {r["path"]: r for r in table.read().collect()}
    assert set(rows) == {"keep/me.py", "update/me.py", "other.py"}
    assert rows["keep/me.py"]["last_seq"] is None  # untouched, retained
    assert rows["update/me.py"]["content_sha256"] != "sha-old"  # real seq won
    assert rows["update/me.py"]["last_seq"] == 11


# -------------------------------------------- mirror tombstone null-safety


def test_mirror_deletes_append_sourced_rows(spark, tmp_path):
    """A source row that entered via append() mirrors with last_seq NULL;
    when the source later deletes it, the synthesized changelog tombstone
    must deterministically WIN in the mirror (NULL+1 was NULL, a tie)."""
    src = LakeTable.create(spark, str(tmp_path / "src"), STATE, n_buckets=2)
    src.append(
        spark.createDataFrame([("r0", "a.py", "c0", "py", "X", "sha-x")], APPEND_DDL),
        epoch_id=0,
    )
    tgt = LakeTable.create(spark, str(tmp_path / "tgt"), STATE, n_buckets=2)
    ckpt = CheckpointStore(str(tmp_path / "cur.json"))
    replicate(src, tgt, ckpt)
    assert tgt.read().count() == 1

    src.merge_changes(
        spark.createDataFrame([(5, "delete", "r0", "a.py", "c1", "py", "")], DELTA_DDL),
        epoch_id=1,
        mode="mor",
    )
    replicate(src, tgt, ckpt)
    assert tgt.read().count() == 0  # the key died in the mirror too
    # and the tombstone is physically present, not merely tied
    phys = tgt.read(include_tombstones=True).filter("_is_deleted").collect()
    assert len(phys) == 1 and phys[0]["last_seq"] == 0


# ------------------------------------------------------- publish() guards


def test_publish_refuses_self_and_main_drop(spark, tmp_path):
    table = LakeTable.create(spark, str(tmp_path / "t"), STATE, n_buckets=2)
    table.append(
        spark.createDataFrame([("r0", "a.py", "c0", "py", "X", "s")], APPEND_DDL),
        epoch_id=0,
    )
    with pytest.raises(ValueError, match="onto itself"):
        table.publish("main")
    table.create_branch("stage")
    with pytest.raises(ValueError, match="drop 'main'"):
        table.publish("main", to="stage")
    # the guard aborted BEFORE any metadata write: main still resolves
    assert table.read().count() == 1


# ------------------------------------------- overwrite table-level skip


def test_overwrite_skips_committed_epoch(spark, tmp_path):
    table = LakeTable.create(spark, str(tmp_path / "t"), STATE, n_buckets=2)
    df1 = spark.createDataFrame([("r0", "a.py", "c0", "py", "X", "s")], APPEND_DDL)
    sid = table.overwrite(df1, epoch_id=7, source="resync")
    df2 = spark.createDataFrame([("r9", "z.py", "c9", "py", "Z", "s9")], APPEND_DDL)
    # re-offered epoch: skipped, state unchanged, no new snapshot
    assert table.overwrite(df2, epoch_id=7, source="resync") == sid
    assert [r["repo"] for r in table.read().collect()] == ["r0"]
    # a NEW epoch still applies
    sid2 = table.overwrite(df2, epoch_id=8, source="resync")
    assert sid2 != sid
    assert [r["repo"] for r in table.read().collect()] == ["r9"]


# ------------------------------------------- VERSION pointer concurrency


def test_version_pointer_advance_is_serialized(spark, tmp_path):
    """Concurrent _advance_version_pointer calls must never regress the
    pointer or raise (the shared-tmp-name TOCTOU did both)."""
    table = LakeTable.create(spark, str(tmp_path / "t"), STATE, n_buckets=2)
    base = table._version()
    errors: list[Exception] = []

    def hammer(versions):
        try:
            for v in versions:
                table._advance_version_pointer(v)
        except Exception as e:  # pragma: no cover - the regression itself
            errors.append(e)

    # interleaved ascending sequences with heavy overlap
    ts = [
        threading.Thread(target=hammer, args=(range(base, base + 200),))
        for _ in range(4)
    ]
    observed: list[int] = []
    stop = threading.Event()

    def watch():
        while not stop.is_set():
            try:
                observed.append(table._version())
            except Exception as e:  # pragma: no cover
                errors.append(e)

    w = threading.Thread(target=watch)
    w.start()
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    stop.set()
    w.join()
    assert not errors
    assert table._version() == base + 199
    # no reader ever saw the pointer move backwards
    assert observed == sorted(observed)


# ------------------------------------------------- JVM-readable encoding


def test_latin1_csv_reads_end_to_end(spark, tmp_path):
    """sniff_encoding must return a charset name the JVM accepts —
    'latin-1' satisfies Python but java.nio.charset rejects it, crashing
    the exact fallback read it exists to serve."""
    from fao_elt_pipelines_spark.sources import readers as R

    p = str(tmp_path / "latin.csv")
    with open(p, "wb") as f:
        f.write("name\nCôte d'Ivoire\n".encode("latin-1"))
    enc = R.sniff_encoding(p)
    assert spark._jvm.java.nio.charset.Charset.isSupported(enc)
    rows = R.read_delimited(spark, p).collect()
    assert rows[0]["name"] == "Côte d'Ivoire"


# ----------------------------------------------- replay null-seq validation


def test_replay_rejects_all_null_seq_epoch_before_merge(spark, tmp_path):
    """A group whose events all carry null seq must raise BEFORE the merge
    commits (int(None) after the commit wedged the pipeline: every resume
    re-applied the committed group and died at the checkpoint line)."""
    from fao_elt_pipelines_spark.lake.replay import replay

    table = LakeTable.create(spark, str(tmp_path / "t"), STATE, n_buckets=2)
    ev = spark.createDataFrame(
        [(None, 0, "upsert", "r0", "a.py", "c0", "py", "X")],
        "seq long, epoch long, op string, repo string, path string, "
        "commit string, lang string, content string",
    )
    ckpt = CheckpointStore(str(tmp_path / "c.json"))
    with pytest.raises(ValueError, match="no non-null seq"):
        replay(spark, ev, table, ckpt)
    # nothing was committed: the table is still empty and re-runnable
    assert table.read().count() == 0
    assert table.committed_epochs() == set()


def test_replay_rejects_bad_epoch_batch_string(spark, tmp_path):
    from fao_elt_pipelines_spark.lake.replay import replay

    table = LakeTable.create(spark, str(tmp_path / "t"), STATE, n_buckets=2)
    ev = spark.createDataFrame(
        [(1, 0, "upsert", "r0", "a.py", "c0", "py", "X")],
        "seq long, epoch long, op string, repo string, path string, "
        "commit string, lang string, content string",
    )
    with pytest.raises(ValueError, match="epoch_batch"):
        replay(spark, ev, table, CheckpointStore(str(tmp_path / "c.json")),
               epoch_batch="8")


# -------------------------------------------------- fractional global cumsum


def test_global_cumsum_fractional_values(spark):
    """Running totals over a double column must match the single-partition
    window cumsum exactly — int()-truncated per-partition offsets drifted
    by the accumulated fraction."""
    from pyspark.sql import Window

    from fao_elt_pipelines_spark.operators.rank import global_cumsum

    df = spark.createDataFrame(
        [(i, 0.7) for i in range(100)], "id long, w double"
    )
    got = {
        r["id"]: r["cum"]
        for r in global_cumsum(df, "id", "w", "cum", num_partitions=8).collect()
    }
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r["id"]: r["cum"]
        for r in df.withColumn("cum", F.sum("w").over(w)).collect()
    }
    assert all(abs(got[i] - want[i]) < 1e-9 for i in want)


# ---------------------------------------------- dedup_exact NULL content


def test_dedup_exact_keeps_null_content_rows(spark):
    """Distinct documents that merely LACK content must all survive:
    sha2(NULL) is NULL and a plain group-by collapsed every null-text row
    into one surviving representative."""
    from fao_elt_pipelines_spark.operators.dedup import dedup_exact

    df = spark.createDataFrame(
        [(1, "same"), (2, "same"), (3, None), (4, None)],
        "doc_id long, text string",
    )
    out = sorted(r["doc_id"] for r in dedup_exact(df, keep_col="doc_id").collect())
    assert out == [1, 3, 4]


# -------------------------------------------- quarantine dir without files


def test_read_dead_letters_empty_dir_is_none(spark, tmp_path):
    from fao_elt_pipelines_spark.lake.quarantine import read_dead_letters

    d = str(tmp_path / "q")
    assert read_dead_letters(spark, d) is None  # absent
    os.makedirs(d)  # created but no parquet committed (crash mid-write)
    assert read_dead_letters(spark, d) is None


# ------------------------------------- numpy scorer vs SQL-fold bit parity


def test_numpy_reductions_match_left_fold_at_dim64():
    """The _np/matmul ANN twins rank/filter on numpy-summed cosine while
    the oracle uses a left-fold; membership at the tau boundary is only
    safe if the two agree. At dim 64 (< numpy's pairwise blocksize 128,
    and within this BLAS's sequential microkernel) every reduction is
    bit-identical to the fold — this test pins that assumption so a dim
    bump or BLAS change fails loudly instead of flaking the driver
    differential."""
    import numpy as np

    rng = np.random.default_rng(42)
    A = rng.random((5000, 64), dtype=np.float32).astype(np.float64)
    B = rng.random((5000, 64), dtype=np.float32).astype(np.float64)
    fold = np.zeros(len(A))
    for j in range(64):
        fold = fold + A[:, j] * B[:, j]
    assert (np.einsum("ij,ij->i", A, B) == fold).all()
    assert ((A * B).sum(axis=1) == fold).all()
    Q, C = A[:200], B[:1000]
    mm = Q @ C.T
    fold2 = np.zeros((200, 1000))
    for j in range(64):
        fold2 += np.outer(Q[:, j], C[:, j])
    assert (mm == fold2).all()


# -------------------------------------------- streaming empty-binlog drain


def test_stream_replay_noops_on_empty_binlog(spark, tmp_path):
    from fao_elt_pipelines_spark.streaming.stream_replay import stream_replay

    table = LakeTable.create(spark, str(tmp_path / "t"), STATE, n_buckets=2)
    empty = str(tmp_path / "binlog")
    os.makedirs(empty)
    # the normal race for a scheduled drain: dir exists, no file landed yet
    stream_replay(spark, empty, table, str(tmp_path / "ckpt"))
    assert table.read().count() == 0


# -------------------------------------- connected_components cache release


def test_connected_components_releases_edge_cache(spark):
    """The per-call edge persist must be released on return — a driver
    looping over batches outside the registry harness (which owns
    release_caches) must not accumulate pinned edge sets."""
    from fao_elt_pipelines_spark.operators.components import connected_components

    import gc
    import time

    def n_persisted() -> int:
        return spark.sparkContext._jsc.getPersistentRDDs().size()

    def settle(target: int, timeout: float = 15.0) -> int:
        """GC + let Spark's ContextCleaner release unreferenced
        localCheckpoint blocks (async), down to ``target`` if possible."""
        deadline = time.time() + timeout
        n = n_persisted()
        while n > target and time.time() < deadline:
            gc.collect()
            time.sleep(0.5)
            n = n_persisted()
        return n

    from fao_elt_pipelines_spark.caching import release_local_checkpoint

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
    )
    expect = {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}
    baseline = settle(0)
    # repeated calls must not accumulate pinned blocks: before the fixes,
    # every call left the full edge persist (strong-referenced by the
    # managed-cache list) plus every iteration's superseded label
    # checkpoint in executor storage
    for _ in range(3):
        out = connected_components(pairs)
        assert {(r["node"], r["cluster_id"]) for r in out.collect()} == expect
        assert release_local_checkpoint(out)  # consumed: free it eagerly
    assert settle(baseline) <= baseline
