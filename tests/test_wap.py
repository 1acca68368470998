"""Refs model (branches/tags), write-audit-publish, and time travel by
timestamp/ref (lake.table refs + lake.wap).

The WAP contract under test: a staged epoch is invisible on main until
publish; a failed audit leaves main bit-identical and the epoch PENDING
(re-appliable); a crash between stage and publish re-runs cleanly; the
end state of a WAP replay equals a plain replay's. Refs contract: tags
pin snapshots across expiry; abandoned staging snapshots never leak into
changes_between, committed_epochs, or expired_epochs.
"""

import pytest
from pyspark.sql import functions as F

from fao_elt_pipelines_spark import binlog
from fao_elt_pipelines_spark.lake import wap
from fao_elt_pipelines_spark.lake.checkpoint import CheckpointStore
from fao_elt_pipelines_spark.lake.replay import replay
from fao_elt_pipelines_spark.lake.table import (
    LakeTable,
    PublishConflictError,
)

from tests.test_engine_core import EPOCH, N_EVENTS, STATE_SCHEMA


@pytest.fixture(scope="module")
def wap_events(spark):
    return binlog.change_events(
        spark, N_EVENTS, n_repos=100, paths_per_repo=50, events_per_epoch=EPOCH
    ).cache()


def _state(table, **kw):
    return {
        (r["repo"], r["path"]): (r["commit"], r["content_sha256"], r["last_seq"])
        for r in table.read(**kw).collect()
    }


def _mk(spark, tmp_path, name="t", n_buckets=8):
    return LakeTable.create(spark, str(tmp_path / name), STATE_SCHEMA, n_buckets=n_buckets)


def _epoch_slice(events, e):
    return events.filter(F.col("epoch") == e)


# --------------------------------------------------------------- refs core
def test_branch_merge_invisible_until_publish(spark, wap_events, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge_changes(_epoch_slice(wap_events, 0), epoch_id=0)
    before = _state(t)

    t.create_branch("staging")
    sid = t.merge_changes(_epoch_slice(wap_events, 1), epoch_id=1, branch="staging")
    # main untouched; staged state readable via the ref
    assert _state(t) == before
    assert _state(t, ref="staging") != before
    assert t.refs()["staging"]["snapshot_id"] == sid
    # the staged epoch is NOT committed from main's point of view
    assert 1 not in t.committed_epochs()
    assert 1 in t.committed_epochs(ref="staging")

    head = t.publish("staging")
    assert head == sid
    assert "staging" not in t.refs()
    assert 1 in t.committed_epochs()
    assert _state(t) == _state(t, snapshot_id=sid)


def test_publish_conflict_and_wap_retry(spark, wap_events, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge_changes(_epoch_slice(wap_events, 0), epoch_id=0)
    t.create_branch("staging")
    t.merge_changes(_epoch_slice(wap_events, 1), epoch_id=1, branch="staging")
    # a competitor lands on main between stage and publish
    t.merge_changes(_epoch_slice(wap_events, 2), epoch_id=2)
    with pytest.raises(PublishConflictError):
        t.publish("staging")
    t.drop_ref("staging")

    # wap_merge resolves the same interleaving by re-staging: merge epoch 1
    # via WAP while epoch 2 is already on main
    sid = wap.wap_merge(t, _epoch_slice(wap_events, 1), 1, audit=lambda *a: [])
    assert sid == t.current_snapshot()["snapshot_id"]
    assert {0, 1, 2} <= t.committed_epochs()


def test_audit_failure_publishes_nothing_and_epoch_stays_pending(
    spark, wap_events, tmp_path
):
    t = _mk(spark, tmp_path)
    t.merge_changes(_epoch_slice(wap_events, 0), epoch_id=0)
    before = _state(t)
    refs_before = t.refs()

    # mass-delete guard: an upstream bug turns epoch 1 into all-deletes
    poisoned = _epoch_slice(wap_events, 1).withColumn("op", F.lit("delete"))
    gate = wap.basic_audit(max_shrink_ratio=0.5)
    with pytest.raises(wap.WapAuditError, match="shrank"):
        wap.wap_merge(t, poisoned, 1, audit=gate)
    assert _state(t) == before
    assert t.refs() == refs_before
    assert 1 not in t.committed_epochs()

    # the fixed batch then passes the same gate and publishes
    wap.wap_merge(t, _epoch_slice(wap_events, 1), 1, audit=gate)
    assert 1 in t.committed_epochs()
    # re-offer after publish: exactly-once skip, no new snapshot
    n_snaps = len(t.history())
    wap.wap_merge(t, _epoch_slice(wap_events, 1), 1, audit=gate)
    assert len(t.history()) == n_snaps


def test_wap_replay_converges_and_survives_staged_crash(spark, wap_events, tmp_path):
    control = _mk(spark, tmp_path, "control")
    replay(spark, wap_events, control, CheckpointStore(str(tmp_path / "c0.json")), mode="mor")

    t = _mk(spark, tmp_path, "wap")
    ckpt = CheckpointStore(str(tmp_path / "c1.json"))
    gate = wap.basic_audit(min_rows_written=1, max_quarantine_ratio=0.5)
    # run 2 epochs through WAP, then simulate a crash AFTER a stage but
    # BEFORE its publish: stage epoch 2 manually and abandon the process
    rep = replay(spark, wap_events, t, ckpt, mode="mor", max_epochs=2, wap_audit=gate)
    assert rep.epochs_applied == [0, 1]
    t.create_branch("wap-binlog", reset=True)
    t.merge_changes(_epoch_slice(wap_events, 2), epoch_id=2, branch="wap-binlog")
    assert 2 not in t.committed_epochs()  # staged-only: still pending

    # resume: must re-apply epoch 2 (fresh stage off main), finish the log
    rep2 = replay(spark, wap_events, t, ckpt, mode="mor", wap_audit=gate)
    assert rep2.epochs_applied == [2, 3]
    assert _state(t) == _state(control)
    # lineage metrics come from the published history only
    assert [m["epoch_id"] for m in rep2.metrics] == [0, 1, 2, 3]


def test_changes_between_ignores_abandoned_staging(spark, wap_events, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge_changes(_epoch_slice(wap_events, 0), epoch_id=0)
    from_sid = t.current_snapshot()["snapshot_id"]
    # abandoned staged work lands in the log but never in main's lineage
    t.create_branch("staging")
    t.merge_changes(_epoch_slice(wap_events, 1), epoch_id=1, branch="staging")
    t.drop_ref("staging")
    t.merge_changes(_epoch_slice(wap_events, 2), epoch_id=2)

    got_epochs = {
        r["last_seq"] // EPOCH
        for r in t.changes_between(from_sid).select("last_seq").collect()
    }
    assert 2 in got_epochs and 1 not in got_epochs


# ------------------------------------------------------- tags & time travel
def test_tags_pin_snapshots_across_expiry(spark, wap_events, tmp_path):
    t = _mk(spark, tmp_path)
    for e in range(4):
        t.merge_changes(_epoch_slice(wap_events, e), epoch_id=e)
    sid_e1 = t.history()[1]["snapshot_id"]
    t.create_tag("training-cut-v1", at_snapshot_id=sid_e1)
    pinned = _state(t, ref="training-cut-v1")
    assert pinned == _state(t, snapshot_id=sid_e1)

    # a concrete untagged sibling, captured BEFORE expiry runs
    sid_untagged = t.history()[0]["snapshot_id"]
    t.expire_snapshots(keep_last=1)
    # the tagged snapshot survived; its untagged siblings are gone
    assert _state(t, ref="training-cut-v1") == pinned
    with pytest.raises(ValueError, match="expired"):
        t.read(snapshot_id=sid_untagged)
    # tags are immutable: no writes, no republish
    with pytest.raises(ValueError, match="immutable"):
        t.merge_changes(_epoch_slice(wap_events, 0), epoch_id=99, branch="training-cut-v1")
    with pytest.raises(ValueError, match="tag"):
        t.publish("training-cut-v1")


def test_read_as_of_timestamp(spark, wap_events, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge_changes(_epoch_slice(wap_events, 0), epoch_id=0)
    ts1 = t.current_snapshot()["timestamp_ms"]
    s1 = _state(t)
    t.merge_changes(_epoch_slice(wap_events, 1), epoch_id=1)
    ts2 = t.current_snapshot()["timestamp_ms"]

    assert _state(t, as_of_ms=ts1) == s1
    assert _state(t, as_of_ms=ts2) == _state(t)
    assert _state(t, as_of_ms=ts2 + 10_000) == _state(t)
    with pytest.raises(ValueError, match="before table history"):
        t.read(as_of_ms=ts1 - 10_000)


def test_abandoned_branch_epochs_not_resurrected_by_expiry(spark, wap_events, tmp_path):
    """expire_snapshots collects unreachable staged snapshots WITHOUT
    registering their epochs — else a crashed-and-abandoned stage would
    make exactly-once skip an epoch that was never published."""
    t = _mk(spark, tmp_path)
    t.merge_changes(_epoch_slice(wap_events, 0), epoch_id=0)
    t.create_branch("staging")
    t.merge_changes(_epoch_slice(wap_events, 1), epoch_id=1, branch="staging")
    t.drop_ref("staging")
    t.merge_changes(_epoch_slice(wap_events, 2), epoch_id=2)

    rep = t.expire_snapshots(keep_last=1)
    assert rep["expired"] >= 1
    committed = t.committed_epochs()
    assert 0 in committed and 2 in committed  # published history survives expiry
    assert 1 not in committed  # the abandoned stage stays pending
    # and the epoch can then actually be applied
    t.merge_changes(_epoch_slice(wap_events, 1), epoch_id=1)
    assert 1 in t.committed_epochs()


def test_stale_branch_blocked_after_rebucket(spark, wap_events, tmp_path):
    """A branch staged against the old bucket layout must not merge or
    publish after a rebucket: bucket ids from two n_buckets spaces in one
    manifest would collide numerically and break the per-bucket read
    merge. The layout guard rejects the stale MERGE; the publish CAS
    rejects the stale fast-forward."""
    from fao_elt_pipelines_spark.lake.table import CommitConflictError

    t = _mk(spark, tmp_path)
    t.merge_changes(_epoch_slice(wap_events, 0), epoch_id=0)
    t.create_branch("staging")
    t.rebucket(16)  # layout evolution lands on main after the fork
    with pytest.raises(CommitConflictError, match="bucket"):
        t.merge_changes(_epoch_slice(wap_events, 1), epoch_id=1, branch="staging", mode="mor")
    with pytest.raises(PublishConflictError):
        t.publish("staging")
    t.drop_ref("staging")
    # a fresh WAP cycle against the new layout proceeds normally
    wap.wap_merge(t, _epoch_slice(wap_events, 1), 1, audit=lambda *a: [])
    assert 1 in t.committed_epochs()
    assert t.n_buckets == 16


def test_snapshot_ids_never_reused_after_expiry(spark, wap_events, tmp_path):
    """Expiring the newest (abandoned staged) snapshots must not let the
    allocator hand their ids to later commits — an expired id must stay
    expired (cursors, tags, and time travel referencing it must raise,
    never silently resolve to a different commit)."""
    t = _mk(spark, tmp_path)
    t.merge_changes(_epoch_slice(wap_events, 0), epoch_id=0)
    t.create_branch("staging")
    staged_sid = t.merge_changes(_epoch_slice(wap_events, 1), epoch_id=1, branch="staging")
    t.drop_ref("staging")
    t.expire_snapshots(keep_last=1)  # collects the abandoned stage

    new_sid = t.merge_changes(_epoch_slice(wap_events, 2), epoch_id=2)
    assert new_sid > staged_sid
    with pytest.raises(ValueError, match="expired"):
        t.read(snapshot_id=staged_sid)


def test_publish_to_tag_refused(spark, wap_events, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge_changes(_epoch_slice(wap_events, 0), epoch_id=0)
    t.create_tag("cut", at_snapshot_id=t.current_snapshot()["snapshot_id"])
    t.create_branch("staging")
    t.merge_changes(_epoch_slice(wap_events, 1), epoch_id=1, branch="staging")
    with pytest.raises(ValueError, match="immutable publish target"):
        t.publish("staging", to="cut")
    assert t.refs()["cut"]["type"] == "tag"  # untouched


def test_schema_evolution_on_abandoned_branch_is_additive_only(spark, wap_events, tmp_path):
    """Schema evolution is table-scoped (Iceberg semantics): a staged merge
    that adds a column registers it even if the branch is later abandoned.
    That must stay harmless — main reads serve the new column as NULL for
    old files, and a later main merge fills it."""
    t = _mk(spark, tmp_path)
    t.merge_changes(_epoch_slice(wap_events, 0), epoch_id=0)

    evolved = _epoch_slice(wap_events, 1).withColumn("stars", F.lit(7).cast("int"))
    gate = wap.basic_audit(min_rows_written=10**9)  # unsatisfiable: force abandon
    with pytest.raises(wap.WapAuditError):
        wap.wap_merge(t, evolved, 1, audit=gate)

    got = t.read()
    assert "stars" in got.columns  # registered, additive
    assert got.filter(F.col("stars").isNotNull()).count() == 0  # no staged data leaked

    t.merge_changes(evolved, epoch_id=1)  # publish-path merge fills it
    assert t.read().filter(F.col("stars") == 7).count() > 0
    assert 1 in t.committed_epochs()
