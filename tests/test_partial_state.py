"""Streaming partial-update state store (streaming/partial_state.py):
batch convergence to the one-shot fold, exactly-once re-delivery, crash
debris recovery, hard-link bucket COW, and the Structured Streaming drain."""

import os

import pytest
from pyspark.sql import functions as F

from fao_elt_pipelines_spark.operators.partial_update import partial_update_state
from fao_elt_pipelines_spark.plans.queries import _derived_patch_binlog
from fao_elt_pipelines_spark.streaming.partial_state import (
    PartialStateStore,
    stream_partial_state,
)


@pytest.fixture(scope="module")
def binlog(spark, sf_dir):
    return _derived_patch_binlog(spark, sf_dir).cache()


def _state(df):
    return {
        (r.repo, r.path): (r.commit, r.lang, r.content, r.last_seq) for r in df.collect()
    }


def _store(spark, tmp_path, **kw):
    return PartialStateStore(spark, str(tmp_path / "st"), reset_ops=("insert",), **kw)


def test_batches_converge_to_oneshot(spark, tmp_path, binlog):
    store = _store(spark, tmp_path)
    for i in range(3):
        assert store.apply_batch(binlog.filter(F.col("seq") % 3 == i), batch_id=i)
    assert _state(store.visible()) == _state(
        partial_update_state(binlog, reset_ops=("insert",))
    )
    assert store.version() == 2


def test_reapply_is_noop(spark, tmp_path, binlog):
    store = _store(spark, tmp_path)
    assert store.apply_batch(binlog.filter(F.col("seq") % 3 == 0), batch_id=7)
    v = store.version()
    before = _state(store.visible())
    assert store.apply_batch(binlog.filter(F.col("seq") % 3 == 0), batch_id=7) is False
    assert store.version() == v
    assert _state(store.visible()) == before


def test_crash_debris_then_retry_converges(spark, tmp_path, binlog):
    store = _store(spark, tmp_path)
    store.apply_batch(binlog.filter(F.col("seq") % 3 == 0), batch_id=0)
    # simulate a crash mid-apply of batch 1: a half-written next version
    # dir and a tmp dir exist, but the commit pointer still names v0
    os.makedirs(str(tmp_path / "st" / "v1" / "_bucket=0"), exist_ok=True)
    os.makedirs(str(tmp_path / "st" / "tmp-deadbeef"), exist_ok=True)
    assert store.version() == 0
    assert store.apply_batch(binlog.filter(F.col("seq") % 3 != 0), batch_id=1)
    assert store.version() == 1
    assert not [d for d in os.listdir(str(tmp_path / "st")) if d.startswith("tmp-")]
    assert _state(store.visible()) == _state(
        partial_update_state(binlog, reset_ops=("insert",))
    )


def test_untouched_buckets_carry_over_by_hard_link(spark, tmp_path, binlog):
    store = _store(spark, tmp_path)
    store.apply_batch(binlog, batch_id=0)
    one = binlog.orderBy("seq").limit(1).collect()[0]
    patch = spark.createDataFrame(
        [(10**9, one.repo, one.path, "patch", "cNEW", None, None)], binlog.schema
    )
    store.apply_batch(patch, batch_id=1)
    v0, v1 = str(tmp_path / "st" / "v0"), str(tmp_path / "st" / "v1")
    untouched = rewritten = 0
    for b in os.listdir(v1):
        if not b.startswith("_bucket="):
            continue
        old = os.path.join(v0, b)
        linked = os.path.exists(old) and any(
            os.path.exists(os.path.join(old, f)) and os.path.samefile(
                os.path.join(v1, b, f), os.path.join(old, f)
            )
            for f in os.listdir(os.path.join(v1, b))
            if f.endswith(".parquet")
        )
        untouched += linked
        rewritten += not linked
    # exactly the one touched bucket was rewritten; everything else linked
    assert rewritten == 1 and untouched > 0
    got = _state(store.visible())
    assert got[(one.repo, one.path)][0] == "cNEW"


def test_stream_drain_then_noop_rerun(spark, tmp_path, binlog):
    src = str(tmp_path / "binlog")
    for i in range(3):
        binlog.filter(F.col("seq") % 3 == i).coalesce(1).write.mode("append").parquet(src)
    store = _store(spark, tmp_path)
    ckpt = str(tmp_path / "ckpt")
    stream_partial_state(spark, src, store, ckpt)
    assert _state(store.visible()) == _state(
        partial_update_state(binlog, reset_ops=("insert",))
    )
    v = store.version()
    stream_partial_state(spark, src, store, ckpt)  # drained: offsets + guard
    assert store.version() == v


def test_store_base_read_partition_prunes_to_touched_buckets(spark, tmp_path, binlog):
    """The O(touched) claim is a plan property: filtering the versioned
    state by _bucket must reach the scan as a PartitionFilter (directory
    pruning), not a post-scan filter over every bucket's files."""
    from tests.plan_utils import plan_of

    store = _store(spark, tmp_path, n_buckets=16)
    store.apply_batch(binlog, batch_id=0)
    base = spark.read.parquet(store._vdir(0)).filter(F.col("_bucket").isin([3]))
    plan = plan_of(base)
    assert "PartitionFilters" in plan and "_bucket" in plan.split("PartitionFilters")[1][:80]


def test_changes_between_versions_equals_brute_diff(spark, tmp_path, binlog):
    """The store as a CDC source: changes(v0, v1) must equal the brute
    full-state diff, and touched-bucket detection (inode comparison of
    hard-linked files) must not silently drop changes."""
    store = _store(spark, tmp_path)
    store.apply_batch(binlog.filter(F.col("seq") % 3 == 0), batch_id=0)
    store.apply_batch(binlog.filter(F.col("seq") % 3 != 0), batch_id=1)

    def vis_at(v):
        from fao_elt_pipelines_spark.operators.partial_update import visible_partial

        return _state(
            visible_partial(store.mergeable(v).drop("_bucket"))
        )

    pre, post = vis_at(0), vis_at(1)
    want = {"insert": set(), "delete": set(), "update_preimage": set(), "update_postimage": set()}
    for k in post.keys() - pre.keys():
        want["insert"].add((k, post[k]))
    for k in pre.keys() - post.keys():
        want["delete"].add((k, pre[k]))
    for k in pre.keys() & post.keys():
        if pre[k] != post[k]:
            want["update_preimage"].add((k, pre[k]))
            want["update_postimage"].add((k, post[k]))
    got = {t: set() for t in want}
    for r in store.changes(0, 1).collect():
        got[r.change_type].add(((r.repo, r.path), (r.commit, r.lang, r.content, r.last_seq)))
    assert got == want
    assert sum(len(v) for v in want.values()) > 0  # the diff is non-trivial

    # identical versions -> empty changelog with the same schema
    assert store.changes(1, 1).count() == 0


def test_reopen_with_mismatched_config_refuses(spark, tmp_path, binlog):
    store = _store(spark, tmp_path, n_buckets=8)
    store.apply_batch(binlog.filter(F.col("seq") % 3 == 0), batch_id=0)
    with pytest.raises(ValueError, match="refusing to corrupt"):
        _store(spark, tmp_path, n_buckets=16)
    # same config reopens fine and sees the committed state
    again = _store(spark, tmp_path, n_buckets=8)
    assert again.version() == 0


def test_stream_drain_empty_dir_is_noop(spark, tmp_path):
    src = str(tmp_path / "empty_binlog")
    os.makedirs(src)
    store = _store(spark, tmp_path)
    stream_partial_state(spark, src, store, str(tmp_path / "ck"))
    assert store.version() == -1


def test_empty_batches_are_safe(spark, tmp_path, binlog):
    """An empty FIRST batch must not create an unreadable empty version;
    an empty later batch advances the version with state unchanged."""
    store = _store(spark, tmp_path)
    empty = binlog.filter(F.col("seq") < 0)
    assert store.apply_batch(empty, batch_id=0)
    assert store.version() == -1 and 0 in store.applied()
    assert store.apply_batch(binlog.filter(F.col("seq") % 3 == 0), batch_id=1)
    before = _state(store.visible())
    assert store.apply_batch(empty, batch_id=2)
    assert store.version() == 1
    assert _state(store.visible()) == before
