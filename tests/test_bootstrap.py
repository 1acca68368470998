"""Snapshot bootstrap → binlog handoff (lake/bootstrap.py): the two-phase
CDC start. A table bootstrapped from a consistent snapshot at watermark W
and then fed the binlog tail must converge to the same state as a
from-scratch replay of the whole binlog — including deletes on both sides
of the watermark — and replay must actually skip the covered prefix."""

import pytest
from pyspark.sql import functions as F

from fao_elt_pipelines_spark import binlog
from fao_elt_pipelines_spark.lake.bootstrap import (
    bootstrap_snapshot,
    table_bootstrap_watermark,
)
from fao_elt_pipelines_spark.lake.checkpoint import CheckpointStore
from fao_elt_pipelines_spark.lake.replay import replay
from fao_elt_pipelines_spark.lake.table import LakeTable

from tests.test_engine_core import EPOCH, N_EVENTS, STATE_SCHEMA


@pytest.fixture(scope="module")
def boot_events(spark):
    return binlog.change_events(
        spark, N_EVENTS, n_repos=100, paths_per_repo=50, events_per_epoch=EPOCH
    ).cache()


def _full_replay_state(spark, events, tmp_path, name):
    t = LakeTable.create(spark, str(tmp_path / name), STATE_SCHEMA, n_buckets=8)
    replay(spark, events, t, CheckpointStore(str(tmp_path / f"{name}.json")), mode="mor")
    return t


def _content_state(table):
    return {
        (r["repo"], r["path"]): (r["commit"], r["lang"], r["content_sha256"])
        for r in table.read().collect()
    }


def _snapshot_at(events, wm):
    """Consistent source state as of seq wm (LWW ≤ wm, deletes dropped)."""
    from pyspark.sql import Window

    w = Window.partitionBy("repo", "path").orderBy(F.col("seq").desc())
    return (
        events.filter(F.col("seq") <= wm)
        .withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col("op") != "delete"))
        .select("repo", "path", "commit", "lang", "content", F.col("seq").alias("src_seq"))
    )


@pytest.mark.parametrize("with_seq_col", [False, True])
def test_bootstrap_then_tail_converges(spark, boot_events, tmp_path, with_seq_col):
    wm = N_EVENTS // 2 - 1  # watermark mid-stream, off epoch alignment
    control = _full_replay_state(spark, boot_events, tmp_path, "control")

    snap = _snapshot_at(boot_events, wm)
    table = LakeTable.create(spark, str(tmp_path / "boot"), STATE_SCHEMA, n_buckets=8)
    ckpt = CheckpointStore(str(tmp_path / "boot.json"))
    sid = bootstrap_snapshot(
        snap, table, ckpt, watermark_seq=wm,
        seq_col="src_seq" if with_seq_col else None,
    )
    assert sid is not None
    assert ckpt.bootstrap_watermark("binlog") == wm
    assert table_bootstrap_watermark(table) == wm

    # tail the FULL binlog: the covered prefix must be filtered out —
    # epochs entirely below the watermark never even enter the loop
    rep = replay(spark, boot_events, table, ckpt, mode="mor")
    covered = [e for e in range(N_EVENTS // EPOCH) if (e + 1) * EPOCH - 1 <= wm]
    assert covered and not (set(covered) & set(rep.epochs_applied))
    assert rep.events_in == N_EVENTS - 1 - wm  # seq > wm only

    assert _content_state(table) == _content_state(control)
    if with_seq_col:
        # per-row seqs → exact last_seq parity with the from-scratch replay
        a = {(r["repo"], r["path"]): r["last_seq"] for r in table.read().collect()}
        b = {(r["repo"], r["path"]): r["last_seq"] for r in control.read().collect()}
        assert a == b

    # keys deleted before the watermark are absent (not resurrected)
    pre_deleted = {
        (r["repo"], r["path"])
        for r in boot_events.filter((F.col("op") == "delete") & (F.col("seq") <= wm)).collect()
    } - set(_content_state(control))
    got_keys = set(_content_state(table))
    assert not (pre_deleted & got_keys)


def test_bootstrap_idempotent_and_heals_checkpoint(spark, boot_events, tmp_path):
    wm = 7_999
    snap = _snapshot_at(boot_events, wm)
    table = LakeTable.create(spark, str(tmp_path / "t"), STATE_SCHEMA, n_buckets=8)
    ckpt = CheckpointStore(str(tmp_path / "c.json"))
    assert bootstrap_snapshot(snap, table, ckpt, watermark_seq=wm) is not None
    rows = table.read().count()

    # rerun: no-op, no second load
    assert bootstrap_snapshot(snap, table, ckpt, watermark_seq=wm) is None
    assert table.read().count() == rows
    assert len(table.snapshots()) == 1

    # crash between table commit and checkpoint write: rerun heals the
    # checkpoint from the committed snapshot summary instead of reloading
    ckpt2 = CheckpointStore(str(tmp_path / "c2.json"))
    assert ckpt2.bootstrap_watermark("binlog") is None
    assert bootstrap_snapshot(snap, table, ckpt2, watermark_seq=wm) is None
    assert ckpt2.bootstrap_watermark("binlog") == wm

    # a table this source already replayed into is refused
    t2 = LakeTable.create(spark, str(tmp_path / "t2"), STATE_SCHEMA, n_buckets=8)
    replay(spark, boot_events, t2, CheckpointStore(str(tmp_path / "c3.json")),
           max_epochs=1, mode="mor")
    with pytest.raises(ValueError, match="committed state from this source"):
        bootstrap_snapshot(snap, t2, CheckpointStore(str(tmp_path / "c4.json")), watermark_seq=wm)


def test_bootstrap_rejects_future_seq(spark, boot_events, tmp_path):
    """A snapshot row above the declared watermark means the export is NOT
    consistent as of the watermark — the handoff must refuse, because the
    binlog filter would then skip events the snapshot doesn't reflect."""
    wm = 5_000
    snap = _snapshot_at(boot_events, 9_000)  # rows up to seq 9000
    table = LakeTable.create(spark, str(tmp_path / "t"), STATE_SCHEMA, n_buckets=8)
    with pytest.raises(ValueError, match="not consistent"):
        bootstrap_snapshot(
            snap, table, CheckpointStore(str(tmp_path / "c.json")),
            watermark_seq=wm, seq_col="src_seq",
        )


def test_bootstrap_is_source_scoped(spark, boot_events, tmp_path):
    """Watermarks are per source: a second source bootstraps onto the SAME
    (non-empty) table with its own watermark, the heal never crosses
    sources, and each source's tail filter starts at its own position."""
    wm_a, wm_b = 9_999, 4_999
    west = boot_events.withColumn("repo", F.concat(F.lit("west_"), F.col("repo")))

    table = LakeTable.create(spark, str(tmp_path / "t"), STATE_SCHEMA, n_buckets=8)
    ckpt = CheckpointStore(str(tmp_path / "c.json"))
    assert bootstrap_snapshot(
        _snapshot_at(boot_events, wm_a), table, ckpt, watermark_seq=wm_a, source="east"
    ) is not None
    # second source: table is non-empty but only with east's state → allowed
    assert bootstrap_snapshot(
        _snapshot_at(west, wm_b), table, ckpt, watermark_seq=wm_b, source="west"
    ) is not None
    assert table_bootstrap_watermark(table, "east") == wm_a
    assert table_bootstrap_watermark(table, "west") == wm_b
    assert table_bootstrap_watermark(table, "north") is None
    assert ckpt.bootstrap_watermark("east") == wm_a
    assert ckpt.bootstrap_watermark("west") == wm_b

    # the heal is source-matched: a fresh checkpoint for west gets WEST's
    # watermark, not east's (the cross-source poison the guard exists for)
    ckpt2 = CheckpointStore(str(tmp_path / "c2.json"))
    assert bootstrap_snapshot(
        _snapshot_at(west, wm_b), table, ckpt2, watermark_seq=wm_b, source="west"
    ) is None
    assert ckpt2.bootstrap_watermark("west") == wm_b
    assert ckpt2.bootstrap_watermark("east") is None

    # an ALREADY-bootstrapped source re-offering is the idempotent heal
    # (returns None, tested above); a source whose replay committed
    # WITHOUT a bootstrap is refused — bootstrapping now would rewind it
    north = boot_events.withColumn("repo", F.concat(F.lit("north_"), F.col("repo")))
    replay(spark, north, table, CheckpointStore(str(tmp_path / "cn.json")),
           source="north", mode="mor", max_epochs=1)
    with pytest.raises(ValueError, match="committed state from this source"):
        bootstrap_snapshot(
            _snapshot_at(north, wm_a), table,
            CheckpointStore(str(tmp_path / "c3.json")), watermark_seq=wm_a, source="north",
        )


def test_bootstrap_rejects_reserved_columns(spark, boot_events, tmp_path):
    snap = _snapshot_at(boot_events, 5_000).withColumn("op", F.lit("base"))
    table = LakeTable.create(spark, str(tmp_path / "t"), STATE_SCHEMA, n_buckets=8)
    with pytest.raises(ValueError, match="reserved column"):
        bootstrap_snapshot(
            snap, table, CheckpointStore(str(tmp_path / "c.json")), watermark_seq=5_000
        )


def test_null_seq_quarantined_after_bootstrap(spark, boot_events, tmp_path):
    """The bootstrap watermark filter must not swallow null-seq events
    before the quarantine split — the drift signal survives bootstrap."""
    wm = 9_999
    table = LakeTable.create(spark, str(tmp_path / "t"), STATE_SCHEMA, n_buckets=8)
    ckpt = CheckpointStore(str(tmp_path / "c.json"))
    bootstrap_snapshot(_snapshot_at(boot_events, wm), table, ckpt, watermark_seq=wm)

    bad = spark.createDataFrame(
        [("r", "p", "c", "py", "x", "insert", None, 3)],
        "repo string, path string, commit string, lang string, content string, "
        "op string, seq long, epoch long",
    )
    tail = boot_events.select(*bad.columns).unionByName(bad)
    qdir = str(tmp_path / "dead")
    replay(spark, tail, table, ckpt, mode="mor", quarantine_dir=qdir)
    from fao_elt_pipelines_spark.lake.quarantine import read_dead_letters

    dead = read_dead_letters(spark, qdir)
    assert dead is not None
    assert [r["_dead_letter_reason"] for r in dead.collect()] == ["null_seq"]


def test_bootstrap_refuses_sourceless_legacy_history(spark, boot_events, tmp_path):
    """A legacy bootstrap committed WITHOUT a source tag is unattributable:
    a new source's bootstrap must refuse (hard error) rather than silently
    arm its binlog filter at a watermark some other source loaded —
    that would drop this source's covered prefix with no signal."""
    wm = 9_999
    table = LakeTable.create(spark, str(tmp_path / "t"), STATE_SCHEMA, n_buckets=8)
    snap = _snapshot_at(boot_events, wm)
    # simulate the legacy commit: same synthetic-event merge, no source tag
    ev = snap.selectExpr("* EXCEPT (src_seq)", "src_seq AS seq").withColumn(
        "op", F.lit("base")
    )
    table.merge_changes(ev, epoch_id=None, metrics={"bootstrap_watermark": wm})

    ckpt = CheckpointStore(str(tmp_path / "c.json"))
    with pytest.raises(ValueError, match="no recorded source"):
        bootstrap_snapshot(
            _snapshot_at(boot_events, 4_999), table, ckpt,
            watermark_seq=4_999, source="west",
        )
    # nothing was armed: west's checkpoint watermark stays unset
    assert ckpt.bootstrap_watermark("west") is None
    # the lenient (reporting) lookup still sees the legacy watermark
    assert table_bootstrap_watermark(table, "west") == wm
    assert table_bootstrap_watermark(table, "west", include_sourceless=False) is None
