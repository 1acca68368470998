"""Row-level changelog reads: the lake table as a CDC *source*.

``row_changes(table, from_sid, to_sid)`` emits the logical row-level
change stream between two committed snapshots — Iceberg's ``changes``
metadata table / Delta's Change Data Feed, derived here rather than
stored, so it costs nothing on the write path. Each changed key yields:

- ``insert``            — after-image of a key absent at ``from``
- ``delete``            — before-image of a key absent at ``to``
- ``update_preimage`` / ``update_postimage`` — both images of a key
  whose row differs between the snapshots

This closes the CDC loop: the engine *ingests* a binlog (lake.replay)
and *emits* one, so downstream incremental consumers (a second lake, a
search index, an embedding store) can subscribe to a table instead of
the upstream source. lake.mv is one such consumer specialized to
decomposable aggregates; this is the general-purpose surface.

Scale shape at 10^10 rows (the reason this is NOT ``read(a)`` full-outer
``read(b)``):

- the interval's manifest entries (``_changes_entries`` — a driver-side
  metadata walk, no data IO) name the TOUCHED BUCKETS; both images are
  read bucket-pruned, so a delta in 1 of 64 buckets reads 2/64ths of
  the table, not 2 full scans;
- changed keys (distinct keys of the interval's raw rows, tombstones
  included) further restrict each image via a semi-join — unchanged
  keys inside touched buckets drop before the diff join, leaving the
  full-outer diff ~interval-sized;
- the diff compares single packed structs per side (one ``eqNullSafe``),
  so adding columns under schema evolution never changes the plan shape.

When the interval contains an operation whose retractions are not
visible as tombstoned file-adds (``overwrite``) or whose bucket ids
changed meaning (``rebucket``), the bucket/key restriction would be
wrong — ``row_changes`` then falls back to a FULL diff of the two
snapshots (both images unrestricted). Still exact, costs two scans;
the same precondition set lake.mv uses (``INCREMENTAL_SAFE_OPS``).

An expired ``from_snapshot_id`` raises the same ``ValueError`` as
``read()`` / ``changes_between`` — a resuming consumer must never
silently reprocess the full table as "changes".

Reference parity: the reference pipeline has no change *emission* at
all (dbt marts are full recomputes, ``/root/reference/dbt/models``);
this is the Spark-first generalization the north rule's incremental
architecture implies.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.diff import DELETE, INSERT, UPDATE_POST, UPDATE_PRE, image_diff
from .mv import INCREMENTAL_SAFE_OPS, KEYS
from .table import LakeTable


def _tag(df: DataFrame, change_type, from_sid: int | None, to_sid: int) -> DataFrame:
    """Append the changelog metadata columns (``change_type`` may be a
    literal string or a Column)."""
    ct = F.lit(change_type) if isinstance(change_type, str) else change_type
    return df.select(
        "*",
        ct.alias("_change_type"),
        F.lit(from_sid).cast("long").alias("_from_snapshot_id"),
        F.lit(to_sid).cast("long").alias("_to_snapshot_id"),
    )


def row_changes(
    table: LakeTable,
    from_snapshot_id: int | None,
    to_snapshot_id: int | None = None,
) -> DataFrame:
    """Row-level changes in ``(from_snapshot_id, to_snapshot_id]``.

    ``from_snapshot_id=None`` is the initial load: every live row at
    ``to`` emits as ``insert`` (a consumer bootstraps exactly like
    lake.bootstrap's snapshot phase, then tails subsequent intervals).
    ``to_snapshot_id=None`` reads up to the current main head.

    Output schema = table schema + ``_change_type`` /
    ``_from_snapshot_id`` / ``_to_snapshot_id``. Deterministic set
    semantics (no ordering guarantee); updates emit exactly two rows.
    """
    meta = table._load_metadata()
    to_sid = (
        to_snapshot_id if to_snapshot_id is not None else meta["current_snapshot_id"]
    )
    if to_sid is None:  # empty table, nothing ever committed
        return _empty_changelog(table)
    snap_to = _find(meta, to_sid)

    if from_snapshot_id is None:
        return _tag(table._read_entries(snap_to["manifest"]), INSERT, None, to_sid)

    # validates the cursor: raises on an expired/unknown from-snapshot
    entries = table._changes_entries(from_snapshot_id, to_sid, meta=meta)
    interval_ops = _interval_ops(table, meta, from_snapshot_id, to_sid)
    if (from_snapshot_id == to_sid or not entries) and "overwrite" not in interval_ops:
        # empty interval, or compact/rebucket-only (bytes moved, no
        # logical change): emit nothing without scanning anything. An
        # overwrite can drop every row while adding zero files, so it
        # must fall through to the full diff below.
        return _empty_changelog(table)

    snap_from = _find(meta, from_snapshot_id)

    if interval_ops <= INCREMENTAL_SAFE_OPS:
        touched = {e["bucket"] for e in entries}
        keys_df = (
            table._read_entries(entries, include_tombstones=True, merged=False)
            .select(*KEYS)
            .distinct()
        )

        def image(snap: dict[str, Any]) -> DataFrame:
            es = [e for e in snap["manifest"] if e["bucket"] in touched]
            # superset of changed keys is exact here: a key whose images
            # are identical (e.g. a late event that lost LWW) cancels in
            # the diff below. Catalyst/AQE picks broadcast vs shuffle for
            # the semi-join from the actual key count.
            return table._read_entries(es).join(keys_df, list(KEYS), "left_semi")

    else:
        # overwrite dropped rows invisibly / rebucket renamed buckets:
        # the restriction would miss retractions — diff the full images
        def image(snap: dict[str, Any]) -> DataFrame:
            return table._read_entries(snap["manifest"])

    return _diff(image(snap_from), image(snap_to), from_snapshot_id, to_sid)


def _diff(before: DataFrame, after: DataFrame, from_sid: int, to_sid: int) -> DataFrame:
    """operators.diff.image_diff + the changelog's snapshot-id columns."""
    return image_diff(before, after, KEYS).select(
        "*",
        F.lit(from_sid).cast("long").alias("_from_snapshot_id"),
        F.lit(to_sid).cast("long").alias("_to_snapshot_id"),
    )


def apply_row_changes(state: DataFrame, changes: DataFrame) -> DataFrame:
    """Consumer-side application: fold a changelog into a prior state,
    reconstructing the after-image exactly (the contract tests assert
    ``apply(state@from, row_changes(from, to)) == read(to)``).

    Keys with a pre-image or delete leave; inserts and post-images
    arrive. Anti-join + union — the same two-step any idempotent sink
    (search index, key-value store) performs with delete+put batches.
    """
    cols = state.columns
    out_keys = changes.filter(
        F.col("_change_type").isin(DELETE, UPDATE_PRE)
    ).select(*KEYS)
    arrivals = changes.filter(F.col("_change_type").isin(INSERT, UPDATE_POST)).select(
        *cols
    )
    return state.join(out_keys, list(KEYS), "left_anti").unionByName(arrivals)


def replicate(
    source: LakeTable,
    target: LakeTable,
    ckpt,
    source_name: str = "changelog-mirror",
    mode: str = "mor",
) -> dict[str, Any]:
    """CDC fan-out: advance ``target`` to ``source``'s current state by
    consuming the changelog interval since the persisted cursor — the
    downstream half of the loop (a second lake, a region replica, a
    serving copy), built entirely from the engine's own primitives.

    Exactly-once composes from the same two layers replay uses:

    - the whole interval merges as ONE epoch tagged with the source's
      head snapshot id under ``source_name`` — a crashed/raced retry is
      skipped by the target's committed-epoch check, never re-applied;
    - the cursor in ``ckpt`` is advanced only after the target commit
      (a crash between the two re-offers the interval, the skip eats it,
      the cursor heals — the identical dance scripts/replay_job.py does
      for binlog epochs).

    Changelog rows fold to MERGE events: inserts/post-images upsert at
    their ``last_seq``; deletes emit at ``pre.last_seq + 1``, which beats
    the mirrored row it retracts and loses to any later change of the key
    (whose log position is strictly greater — seqs are global). Pre-images
    are dropped. The target recomputes ``content_sha256`` in the merge, so
    the sha-equality invariant holds per-row by construction.

    An expired source cursor (``expire_snapshots`` outran the mirror
    cadence) cannot be bridged incrementally: falls back to an exact
    ``overwrite`` resync at the pinned head — reported in the returned
    metrics, never silent.

    Cursor recovery: the effective ``from`` is the LATER of the ckpt
    cursor and the highest ``source_name`` epoch committed on the
    target (epoch ids here are source snapshot ids, so they are
    mutually ordered). The ckpt cursor alone is not enough — a crash
    between the target commit and the cursor advance, followed by the
    source moving its head, would re-diff a WIDER interval under a NEW
    epoch id: the committed-epoch skip no longer fires, and a key both
    inserted and deleted inside the widened interval diffs to nothing,
    leaving its already-mirrored insert stranded in the target forever.
    """
    meta = source._load_metadata()
    to_sid = meta["current_snapshot_id"]
    if to_sid is None:
        return {"mode": "noop", "reason": "empty source"}
    from_sid = ckpt.last_epoch(source_name)
    applied = _applied_head(target, source_name)
    if applied is not None and (from_sid is None or applied > from_sid):
        from_sid = applied
    if from_sid == to_sid:
        if ckpt.last_epoch(source_name) != from_sid:  # heal a lagging cursor
            ckpt.commit(source_name, epoch=int(to_sid), seq_hi=_seq_hi(meta, to_sid))
        return {"mode": "noop", "from": from_sid, "to": to_sid}

    resync = False
    if from_sid is not None:
        try:
            # validates the cursor (raises on expired) and names the
            # interval's touched entries without any data IO — a compact/
            # rebucket-only interval (no logical change) advances the
            # cursor and commits nothing on the target instead of merging
            # an empty changelog
            entries = source._changes_entries(from_sid, to_sid, meta=meta)
            interval_ops = _interval_ops(source, meta, from_sid, to_sid)
        except ValueError:
            resync = True
    if resync:
        target.overwrite(
            source.read(snapshot_id=to_sid), epoch_id=int(to_sid), source=source_name
        )
        ckpt.commit(source_name, epoch=int(to_sid), seq_hi=_seq_hi(meta, to_sid))
        return {"mode": "resync", "reason": "cursor expired", "to": to_sid}
    if from_sid is not None and not entries and "overwrite" not in interval_ops:
        ckpt.commit(source_name, epoch=int(to_sid), seq_hi=_seq_hi(meta, to_sid))
        return {"mode": "noop", "reason": "no logical change", "from": from_sid, "to": to_sid}

    ch = row_changes(source, from_sid, to_sid)
    # payload/types come from the changelog plan itself (pinned at to_sid),
    # never from a re-read of source.schema() that a concurrent schema
    # evolution could advance past the columns `ch` actually carries
    types = {f.name: f.dataType for f in ch.schema.fields}
    payload = [
        c
        for c in ch.columns
        if c
        not in ("content_sha256", "last_seq", "_change_type", "_from_snapshot_id", "_to_snapshot_id")
    ]
    non_key = [c for c in payload if c not in KEYS]
    null_of = {c: F.lit(None).cast(types[c]) for c in non_key}
    # the upsert and delete branches both hang off the diff — persist it
    # for the merge so the two image reads + diff join run once, not twice
    # (the merge materializes inside this call, so no cache escapes)
    ch = ch.persist()
    try:
        ups = ch.filter(F.col("_change_type").isin(INSERT, UPDATE_POST)).select(
            *payload,
            F.lit("upsert").alias("op"),
            F.col("last_seq").alias("seq"),
        )
        # Null-safe tombstone ordering: append()-sourced rows mirror with
        # last_seq NULL, and NULL + 1 = NULL would make the synthesized
        # delete tie (instead of win) against the mirrored row under the
        # read path's coalesce(-1) order. NULL normalizes to -1, so the
        # tombstone lands at seq 0 and deterministically outranks it.
        dels = ch.filter(F.col("_change_type") == DELETE).select(
            *KEYS,
            *[null_of[c].alias(c) for c in non_key],
            F.lit("delete").alias("op"),
            (F.coalesce(F.col("last_seq"), F.lit(-1)) + 1).alias("seq"),
        )
        target.merge_changes(
            ups.unionByName(dels), epoch_id=int(to_sid), mode=mode, source=source_name
        )
    finally:
        ch.unpersist()
    ckpt.commit(source_name, epoch=int(to_sid), seq_hi=_seq_hi(meta, to_sid))
    return {"mode": "incremental", "from": from_sid, "to": to_sid}


def _applied_head(target: LakeTable, source_name: str) -> int | None:
    """Highest ``source_name`` epoch actually committed on the target's
    main ancestry (expired ones included) — the recovery floor for the
    mirror cursor. Scoped strictly to snapshots tagged with this source:
    source-less epochs from other feeds must not fake progress."""
    m = target._load_metadata()
    eids = [
        int(e) for e in m.get("expired_epochs_by_source", {}).get(source_name, [])
    ]
    eids += [
        s["epoch_id"]
        for s in target._ancestry(m, target._head(m, "main"))
        if s.get("source") == source_name and s.get("epoch_id") is not None
    ]
    return max(eids) if eids else None


def _seq_hi(meta: dict[str, Any], sid: int) -> int:
    """The source's binlog high-water mark at snapshot ``sid``, from the
    manifest's per-file ``last_seq`` stats (driver-side metadata walk, no
    data IO) — the checkpoint contract stores a LOG position in seq_hi,
    never a snapshot id."""
    his = [
        e["stats"]["last_seq"][1]
        for e in _find(meta, sid)["manifest"]
        if e.get("stats", {}).get("last_seq")
    ]
    return int(max(his)) if his else 0


def _find(meta: dict[str, Any], sid: int) -> dict[str, Any]:
    snap = next((s for s in meta["snapshots"] if s["snapshot_id"] == sid), None)
    if snap is None:
        raise ValueError(
            f"snapshot {sid} not found (expired by expire_snapshots, or never existed)"
        )
    return snap


def _interval_ops(
    table: LakeTable, meta: dict[str, Any], from_sid: int, to_sid: int
) -> set[str]:
    """Operations of the published ancestry in (from, to] — the raw
    snapshot log may carry unpublished WAP/staging commits that never
    affected this lineage."""
    return {
        s["operation"]
        for s in table._ancestry(meta, to_sid)
        if from_sid < s["snapshot_id"] <= to_sid
    }


def _empty_changelog(table: LakeTable) -> DataFrame:
    empty = table._read_entries([])
    return _tag(empty, F.lit(None).cast("string"), None, -1).limit(0)
