"""Source-scoped exactly-once: epoch ids are only unique PER SOURCE (two
binlogs feeding one table both start at epoch 0), so the replay-skip key
is (source, epoch). Without scoping, source B's epoch 0 would be silently
dropped because source A already committed an epoch 0."""

from pyspark.sql import functions as F

from fao_elt_pipelines_spark import binlog
from fao_elt_pipelines_spark.lake.checkpoint import CheckpointStore
from fao_elt_pipelines_spark.lake.replay import replay
from fao_elt_pipelines_spark.lake.table import LakeTable

from tests.test_engine_core import STATE_SCHEMA

N = 8_000
EPOCH = 2_000


def _two_sources(spark):
    """Two binlogs over DISJOINT repo sets (e.g. two regional databases
    feeding one consolidated state table), both with epochs 0..3."""
    a = binlog.change_events(spark, N, n_repos=40, paths_per_repo=30, events_per_epoch=EPOCH)
    b = (
        binlog.change_events(spark, N, n_repos=40, paths_per_repo=30, events_per_epoch=EPOCH)
        .withColumn("repo", F.concat(F.lit("west_"), F.col("repo")))
    )
    return a, b


def test_two_sources_same_epoch_ids_both_apply(spark, tmp_path):
    a, b = _two_sources(spark)
    t = LakeTable.create(spark, str(tmp_path / "t"), STATE_SCHEMA, n_buckets=8)
    ckpt = CheckpointStore(str(tmp_path / "c.json"))

    rep_a = replay(spark, a, t, ckpt, source="east", mode="mor")
    assert rep_a.epochs_applied == [0, 1, 2, 3]
    # source B re-uses epoch ids 0..3 — every one must still apply
    rep_b = replay(spark, b, t, ckpt, source="west", mode="mor")
    assert rep_b.epochs_applied == [0, 1, 2, 3]
    assert rep_b.epochs_skipped == []

    # both sources' state landed in full
    state = t.read()
    n_west = state.filter(F.col("repo").startswith("west_")).count()
    n_east = state.count() - n_west
    assert n_east > 0 and n_west > 0

    # scoped introspection; union view for ops
    assert t.committed_epochs(source="east") == {0, 1, 2, 3}
    assert t.committed_epochs(source="west") == {0, 1, 2, 3}
    assert t.committed_epochs() == {0, 1, 2, 3}

    # per-source resume: re-offering either source is a no-op
    assert replay(spark, a, t, ckpt, source="east", mode="mor").epochs_applied == []
    # checkpoint loss for one source → table-level skip, scoped correctly
    ckpt2 = CheckpointStore(str(tmp_path / "c2.json"))
    rep = replay(spark, b, t, ckpt2, source="west", mode="mor")
    assert rep.epochs_applied == [] and rep.epochs_skipped == [0, 1, 2, 3]


def test_source_scoping_survives_expiry(spark, tmp_path):
    a, b = _two_sources(spark)
    t = LakeTable.create(spark, str(tmp_path / "t"), STATE_SCHEMA, n_buckets=8)
    replay(spark, a, t, CheckpointStore(str(tmp_path / "ca.json")), source="east", mode="mor")
    t.expire_snapshots(keep_last=1)
    # east's epochs survive expiry AS east's; west still owes its 0..3
    assert t.committed_epochs(source="east") == {0, 1, 2, 3}
    assert t.committed_epochs(source="west") == set()
    rep_b = replay(
        spark, b, t, CheckpointStore(str(tmp_path / "cb.json")), source="west", mode="mor"
    )
    assert rep_b.epochs_applied == [0, 1, 2, 3]
    # expire again: both scopes persist in expired bookkeeping
    t.expire_snapshots(keep_last=1)
    assert t.committed_epochs(source="east") == {0, 1, 2, 3}
    assert t.committed_epochs(source="west") == {0, 1, 2, 3}
