"""Orphan-file GC (LakeTable.remove_orphan_files): uncommitted debris —
a CAS loser's data files, a crashed writer's manifest, stale commit temp
files — is collected after the safety horizon, while referenced files and
younger (possibly in-flight) files are untouched."""

import os
import time

from pyspark.sql import functions as F

from fao_elt_pipelines_spark import binlog
from fao_elt_pipelines_spark.lake.table import LakeTable

from tests.test_engine_core import STATE_SCHEMA

HOUR_MS = 3600 * 1000


def _next_ms():
    """Spin until the millisecond clock ticks — commit timestamps in the
    age-based tests must be strictly ordered, not same-ms coincident."""
    t0 = int(time.time() * 1000)
    while int(time.time() * 1000) <= t0:
        time.sleep(0.0005)


def _mk_with_commits(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), STATE_SCHEMA, n_buckets=4)
    ev = binlog.change_events(spark, 4000, n_repos=20, paths_per_repo=20, events_per_epoch=2000)
    for e in (0, 1):
        _next_ms()
        t.merge_changes(ev.filter(F.col("epoch") == e), epoch_id=e)
    return t


def test_orphans_collected_referenced_kept(spark, tmp_path):
    t = _mk_with_commits(spark, tmp_path)
    before = {tuple(r) for r in t.read().collect()}
    sid1 = t.history()[0]["snapshot_id"]

    # a CAS loser: data files + manifest written, commit never landed
    ev = binlog.change_events(spark, 1000, n_repos=20, paths_per_repo=20, events_per_epoch=1000)
    loser = ev.withColumn("_is_deleted", F.lit(False)).withColumn(
        "_bucket", F.pmod(F.xxhash64("repo", "path"), F.lit(4)).cast("int")
    ).drop("op", "epoch", "ingest_ts").withColumnRenamed("seq", "last_seq")
    orphan_entries = t._write_data_files(loser, source_epoch=99)
    orphan_paths = [e["path"] for e in orphan_entries]
    orphan_manifest = os.path.join(t.manifest_dir, "snap-99-deadbeef.json")
    with open(orphan_manifest, "w") as f:
        f.write("[]")
    stale_tmp = os.path.join(t.meta_dir, "v99.metadata.json.tmp.dead")
    with open(stale_tmp, "w") as f:
        f.write("{}")
    assert all(os.path.exists(p) for p in orphan_paths)

    # inside the safety horizon nothing moves (in-flight writers look
    # exactly like this)
    assert t.remove_orphan_files(older_than_ms=24 * HOUR_MS) == {
        "data_files": 0,
        "manifest_files": 0,
        "bloom_sidecars": 0,
    }
    assert all(os.path.exists(p) for p in orphan_paths)

    # past the horizon the debris goes, referenced files stay
    now = int(time.time() * 1000)
    removed = t.remove_orphan_files(older_than_ms=HOUR_MS, _now_ms=now + 2 * HOUR_MS)
    assert removed["data_files"] == len(orphan_paths)
    assert removed["manifest_files"] == 1
    assert not any(os.path.exists(p) for p in orphan_paths)
    assert not os.path.exists(orphan_manifest)
    assert not os.path.exists(stale_tmp)

    # the table is untouched: current read and time travel bit-identical
    assert {tuple(r) for r in t.read().collect()} == before
    assert t.read(snapshot_id=sid1).count() > 0


def test_expire_age_based_retention(spark, tmp_path):
    """older_than_ms keeps young snapshots beyond keep_last; old ones go."""
    t = _mk_with_commits(spark, tmp_path)  # 2 merge snapshots
    ev = binlog.change_events(spark, 2000, n_repos=20, paths_per_repo=20, events_per_epoch=1000)
    _next_ms()
    t.merge_changes(ev.filter(F.col("seq") < 1000), epoch_id=2)
    snaps = t.history()
    now = snaps[-1]["timestamp_ms"] + 1
    # horizon straddles the log: snapshots 2 and 3 are "young", 1 is "old"
    horizon = now - snaps[1]["timestamp_ms"] + 1
    rep = t.expire_snapshots(keep_last=1, older_than_ms=horizon, _now_ms=now)
    assert rep["expired"] == 1
    kept_ids = [s["snapshot_id"] for s in t.snapshots()]
    assert kept_ids == [snaps[1]["snapshot_id"], snaps[2]["snapshot_id"]]
    # age floor never undercuts keep_last: everything-young → no-op
    rep2 = t.expire_snapshots(keep_last=1, older_than_ms=10**12, _now_ms=now)
    assert rep2["expired"] == 0
