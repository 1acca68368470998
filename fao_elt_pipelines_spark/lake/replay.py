"""The replay driver: binlog tail → epoch loop → MERGE → checkpoint.

Re-expression of the reference's pipeline flow
(``/root/reference/orchestration/elt_pipeline.py:257-341``): its paginated
extract loop becomes an epoch loop over seq-ranges; its truncate+reload
idempotency becomes exactly-once replay-skip of committed epochs; its
Prefect task retries become idempotent epoch retries (safe because the sink
commit is atomic and keyed by epoch id).

Kill-and-resume contract (north rule): the driver may die at ANY point;
restarting with the same arguments resumes from the checkpoint (or, if the
checkpoint lags the table, from the table's committed epochs) and converges
to the same final state — proven by tests/test_replay_resume.py.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .checkpoint import CheckpointStore
from .quarantine import split_malformed, write_dead_letters
from .table import LakeTable

# epoch_batch="auto" policy: batch consecutive epochs until a group carries
# at least defaultParallelism × AUTO_ROWS_PER_CORE events, so the per-group
# fixed driver cost (merge planning, AQE build, snapshot commit) is paid
# against at least this much per-core merge work. 50k rows/core ≈ the point
# where the bench box's merge stops being commit-dominated
# (BENCH/epoch_overhead.json). AUTO_MAX_BATCH bounds crash-replay work:
# a group re-applies whole after a mid-group crash.
AUTO_ROWS_PER_CORE = 50_000
AUTO_MAX_BATCH = 64


@dataclass
class ReplayReport:
    epochs_applied: list[int] = field(default_factory=list)
    epochs_skipped: list[int] = field(default_factory=list)
    events_in: int = 0
    duration_sec: float = 0.0
    metrics: list[dict[str, Any]] = field(default_factory=list)


def _check_expiry_precondition(
    epoch: int, seq_lo: int | None, expiry_watermark: int | None
) -> None:
    """Tombstone expiry assumed no event below the watermark would ever
    arrive; a later epoch violating that would silently resurrect deleted
    keys (the tombstone that would have outranked it is gone). Make it a
    hard error instead."""
    if expiry_watermark is not None and seq_lo is not None and seq_lo < expiry_watermark:
        raise RuntimeError(
            f"epoch {epoch} carries seq {seq_lo} below the tombstone-expiry "
            f"watermark {expiry_watermark}: the event source violates the "
            "monotone-seq precondition of expire_tombstones; disable expiry "
            "for this source or fix its epoch/seq alignment"
        )


def replay(
    spark: SparkSession,
    events: DataFrame,
    table: LakeTable,
    checkpoint: CheckpointStore,
    source: str = "binlog",
    epoch_col: str = "epoch",
    max_epochs: int | None = None,
    fail_after_epochs: int | None = None,
    collect_metrics: bool = True,
    mode: str = "cow",
    compact_every: int | None = None,
    collect_delta_stats: bool = True,
    expire_tombstones: bool = False,
    merge_strategy: str | None = None,
    compact_delta_ratio: float | None = None,
    epoch_batch: int | str = 1,
    quarantine_dir: str | None = None,
    wap_audit: Callable[[LakeTable, str, dict[str, Any]], list[str]] | None = None,
    bloom_cols: list[str] | None = None,
    bloom_mode: str = "value",
) -> ReplayReport:
    """Apply ``events`` (a change-event DataFrame with an ``epoch`` column)
    epoch-by-epoch into ``table``.

    ``spark`` is accepted for driver-signature uniformity (scripts and the
    streaming driver thread one session through every entry point) and for
    forward compatibility; the body itself derives everything from
    ``events`` and ``table``.

    ``fail_after_epochs`` injects a crash for resume testing.
    ``compact_every`` (count) and ``compact_delta_ratio`` (size: compact
    when accumulated MOR delta bytes reach this fraction of base bytes,
    from manifest stats) are independent compaction triggers; either may
    fire. The size policy is the scale-correct one under skewed delta
    sizes — at 100 TB a count policy either compacts hot tables too late
    or quiet ones constantly.

    ``epoch_batch``: apply up to this many CONSECUTIVE pending epochs as
    one merge + one snapshot commit. Per-epoch fixed driver cost (stats
    scan, merge planning, AQE broadcast build, manifest commit — ~seconds
    per epoch, serial under Amdahl) is paid once per GROUP instead, so at
    10^10 events with realistically small epochs the fixed cost amortizes
    by the batch factor (measured: bench/epoch_overhead.py). Exactly-once
    is preserved at group granularity: the snapshot commit atomically
    records every epoch id in the group, so a crash mid-group re-applies
    the whole group (idempotent — LWW of the same events is a no-op) and
    a completed group is skipped entirely on resume.
    ``epoch_batch="auto"`` sizes the group from the data: batch enough
    consecutive epochs that each merge carries at least
    ``defaultParallelism × AUTO_ROWS_PER_CORE`` events (epochs already
    that large run unbatched). Measured 6.0× on 32 small epochs at
    batch=8 (BENCH/epoch_overhead.json); a no-op for large epochs.
    The per-epoch slice filter prunes on the generator/parquet side
    (predicate pushdown on ``epoch``); at 100 TB the binlog would be a
    parquet/Kafka source partitioned by epoch and this filter becomes
    partition pruning.

    ``bloom_cols``: maintain per-file Bloom sidecars (lake/bloom.py) for
    these columns as part of the replay loop — rebuilt incrementally
    after every compaction and once at replay end, so point lookups
    (``scan_where``) and grep (``scan_contains``, with
    ``bloom_mode="tokens"``) stay served on a continuously-ingesting
    table at O(newly-written files) per build.

    ``quarantine_dir``: dead-letter handling (lake.quarantine). Malformed
    events — null/empty key, null seq, unknown op, payload-less upsert —
    are diverted to an epoch-partitioned quarantine table with a reason
    column instead of poisoning the merge; the valid remainder applies
    normally and ``rows_quarantined`` lands in the merge's lineage
    metrics. Without it (default), the contract stays what it was: the
    source is trusted to be well-formed.

    ``wap_audit``: write-audit-publish (lake.wap). Each group merges onto
    a staging branch, the audit runs against the staged commit, and only a
    pass fast-forwards main — consumers never see an epoch that fails its
    checks. A failing audit raises WapAuditError with the checkpoint NOT
    advanced and main untouched; the epoch stays pending for a fixed
    source to re-offer. Costs two metadata-only CAS commits per group.
    """
    t0 = time.time()
    rep = ReplayReport()
    wm_boot = checkpoint.bootstrap_watermark(source)
    if wm_boot is not None:
        # snapshot-bootstrap handoff (lake.bootstrap): everything at or
        # below the watermark is already reflected in the snapshot rows.
        # Declarative filter → parquet pushdown, so epochs fully below the
        # watermark drop out of the bounds agg and the epoch loop entirely
        # (they cost a stats-pruned scan, not an apply). Correctness never
        # depends on it: sub-watermark events would lose LWW to the
        # snapshot rows anyway. Null-seq events pass THROUGH (a bare
        # `seq > wm` is NULL for them, silently discarding exactly the
        # malformed rows the quarantine split downstream exists to
        # dead-letter — the drift signal must not vanish on bootstrapped
        # tables only).
        events = events.filter(
            (F.col("seq") > int(wm_boot)) | F.col("seq").isNull()
        )
    # the ACTUAL epoch domain, not a dense min..max range: a sparse id
    # space (batch epochs 0..k mixed with a streaming driver's namespaced
    # 1_000_000+ epochs feeding the same table) would otherwise iterate
    # millions of empty driver-side slices. One partial-agg distinct over
    # a single pruned column; epochs are few no matter how many events.
    # "auto" upgrades the distinct to a count-by-epoch (same shuffle shape,
    # map-side combined) and derives the batch factor from the sizes.
    if isinstance(epoch_batch, str) and epoch_batch != "auto":
        # fail at entry with a clear message — otherwise a config string
        # like "8" survives to the grouping loop and dies in an opaque
        # str-vs-int TypeError after the distinct-epochs job already ran
        raise ValueError(
            f"epoch_batch must be an int or 'auto', got {epoch_batch!r}"
        )
    auto_sizes: dict[int, int] | None = None
    auto_target = 0
    if epoch_batch == "auto":
        per_epoch = (
            events.groupBy(F.col(epoch_col).cast("long").alias("_e"))
            .count()
            .collect()
        )
        epoch_vals = [r["_e"] for r in per_epoch]
        # groups are formed by ACCUMULATING each pending epoch's own count
        # until the target, not by a uniform count cap derived from the
        # mean: under skewed epoch sizes a mean-based cap either leaves
        # tiny epochs unbatched (mean dragged up by committed/large
        # epochs) or groups many LARGE epochs into one oversized merge
        auto_sizes = {r["_e"]: r["count"] for r in per_epoch if r["_e"] is not None}
        auto_target = spark.sparkContext.defaultParallelism * AUTO_ROWS_PER_CORE
        epoch_batch = AUTO_MAX_BATCH
    else:
        epoch_vals = [
            r[0]
            for r in events.select(F.col(epoch_col).cast("long")).distinct().collect()
        ]
    if None in epoch_vals:
        # null epoch = no slice can ever carry the row: neither applied
        # nor re-offered, it would silently vanish (the one malformed
        # shape the per-slice quarantine split can never see)
        if quarantine_dir is None:
            raise ValueError(
                f"events carry null {epoch_col!r}: they can never be "
                "assigned to an epoch slice; enable quarantine_dir to "
                "dead-letter them or repair the source"
            )
        from .quarantine import REASON_COL

        write_dead_letters(
            events.filter(F.col(epoch_col).isNull()).withColumn(
                REASON_COL, F.lit("null_epoch")
            ),
            quarantine_dir,
            epoch_col,
        )
        events = events.filter(F.col(epoch_col).isNotNull())
    present = sorted(e for e in epoch_vals if e is not None)
    if not present:
        return rep
    committed = table.committed_epochs(source=source)
    start = checkpoint.last_epoch(source)
    if start is not None:
        present = [e for e in present if e > start]
    applied = 0
    # Highest seq expiry has assumed final. Seeded from the checkpoint (not
    # in-memory-only): a restarted replay must still reject epochs carrying
    # seq below a watermark a PREVIOUS run expired under, or deleted keys
    # silently resurrect across the crash-resume boundary.
    expiry_watermark: int | None = checkpoint.expiry_watermark(source)
    # group pending epochs into batches of <= epoch_batch. A committed
    # epoch inside a group's id range would make its between() slice
    # re-read committed data, so a group only extends across a gap that
    # contains no committed id (bisect over the sorted committed ids —
    # the gap itself carries no data: the distinct above proved it)
    import bisect

    committed_sorted = sorted(committed)

    def _committed_in(lo_excl: int, hi_incl: int) -> bool:
        i = bisect.bisect_right(committed_sorted, lo_excl)
        return i < len(committed_sorted) and committed_sorted[i] <= hi_incl

    pending: list[int] = []
    pending_rows = 0
    groups: list[list[int]] = []
    for epoch in present:
        if epoch in committed:
            rep.epochs_skipped.append(epoch)
            if pending:
                groups.append(pending)
                pending = []
                pending_rows = 0
            continue
        if pending and (
            len(pending) >= max(1, epoch_batch)
            or (auto_sizes is not None and pending_rows >= auto_target)
            or _committed_in(pending[-1], epoch)
        ):
            groups.append(pending)
            pending = []
            pending_rows = 0
        pending.append(epoch)
        if auto_sizes is not None:
            pending_rows += auto_sizes.get(epoch, 0)
    if pending:
        groups.append(pending)
    for group in groups:
        if max_epochs is not None:
            if applied >= max_epochs:
                break
            # a batched group must not overshoot the caller's cap: truncate
            # to the remaining budget (epochs in a group are consecutive,
            # so the truncated prefix is still a valid between() slice)
            group = group[: max_epochs - applied]
        e_lo, e_hi = group[0], group[-1]
        batch = events.filter(
            F.col(epoch_col) == e_lo
            if e_lo == e_hi
            else F.col(epoch_col).between(e_lo, e_hi)
        )
        n_bad = 0
        if quarantine_dir is not None:
            # split BEFORE stats/merge: null-seq rows must not feed the
            # expiry guard's min(seq), and the applied-event count should
            # mean applied events
            batch, bad = split_malformed(batch)
            n_bad = write_dead_letters(bad, quarantine_dir, epoch_col)
        seq_lo = None
        if collect_delta_stats:
            # exact per-group stats: one extra column-pruned scan of the slice
            agg = batch.agg(
                F.count("*").alias("n"),
                F.max("seq").alias("seq_hi"),
                F.min("seq").alias("seq_lo"),
            ).collect()[0]
            n, seq_hi, seq_lo = agg["n"], agg["seq_hi"], agg["seq_lo"]
            if n == 0:
                continue
            if seq_hi is None:
                # Every event in the group carries null seq (reachable with
                # quarantine off: the bootstrap tail filter passes seq-NULL
                # rows through so drift stays visible). Raise BEFORE the
                # merge — committing first and failing at the checkpoint's
                # int(seq_hi) would wedge the pipeline: each resume
                # re-applies the committed group and dies at the same line.
                raise ValueError(
                    f"epoch group {group} has {n} events but no non-null "
                    "seq: cannot advance the checkpoint cursor; enable "
                    "quarantine_dir to dead-letter null-seq events or "
                    "repair the source"
                )
            _check_expiry_precondition(e_lo, seq_lo, expiry_watermark)
        else:
            n = seq_hi = None  # derived from written-file stats below
            if expiry_watermark is not None:
                # The guard must fire BEFORE the merge commits: checking
                # after (as the stats path's written-file fallback once did)
                # leaves the violating batch already in the snapshot when
                # the error raises. A min-agg on the slice is one
                # column-pruned scan and only runs while a watermark is
                # armed.
                seq_lo = batch.agg(F.min("seq").alias("lo")).collect()[0]["lo"]
                _check_expiry_precondition(e_lo, seq_lo, expiry_watermark)
        merge_metrics = {
            "rows_in_delta": n,
            "source": source,
            **({"rows_quarantined": n_bad} if quarantine_dir is not None else {}),
        }
        if wap_audit is not None:
            from .wap import wap_merge

            wap_merge(
                table, batch, group[0] if len(group) == 1 else group,
                audit=wap_audit, source=source,
                metrics=merge_metrics, mode=mode, strategy=merge_strategy,
            )
        else:
            table.merge_changes(
                batch,
                epoch_id=group[0] if len(group) == 1 else group,
                metrics=merge_metrics,
                mode=mode, strategy=merge_strategy, source=source,
            )
        if seq_hi is None:
            # seq bounds from the committed files' parquet column stats — no
            # extra scan of the delta (manifest stats, lake.table); entries
            # are tagged with the group's LAST epoch id (lineage grain)
            snap = table.current_snapshot()
            stat_bounds = [
                e["stats"]["last_seq"]
                for e in snap["manifest"]
                if e.get("source_epoch") == e_hi and e.get("stats", {}).get("last_seq")
            ]
            if stat_bounds:
                seq_hi = max(b[1] for b in stat_bounds)
            else:
                seq_hi = checkpoint.load()["sources"].get(source, {}).get("seq_hi", -1)
            delta_rows = [
                e["rows"]
                for e in snap["manifest"]
                if e.get("source_epoch") == e_hi and e.get("kind") == "delta"
            ]
            if delta_rows:
                # MOR: the group's delta files hold its LWW winners — a
                # lower bound on raw events (within-group duplicates of a
                # key collapse), free from the manifest; events_in is
                # exact only with collect_delta_stats or under COW
                n = sum(delta_rows)
            else:
                # COW rewrote whole buckets, so manifest rows for this
                # epoch count base rows re-entered — orders of magnitude
                # above the events actually applied. One column-pruned
                # count of the slice is the honest number (only paid in
                # the rare cow + no-stats combination).
                n = batch.count()
        checkpoint.commit(source, e_hi, int(seq_hi))
        rep.epochs_applied.extend(group)
        rep.events_in += n
        prev_applied = applied
        applied += len(group)
        trigger = bool(compact_every) and (
            applied // compact_every > prev_applied // compact_every
        )
        if not trigger and compact_delta_ratio is not None:
            # size-based policy: compact when accumulated MOR delta bytes
            # reach the configured fraction of base bytes (what compaction
            # actually pays to rewrite) — epoch count is blind to skewed
            # delta sizes. Before any base exists, bound read amplification
            # by file count instead (every read merges all delta files).
            ds = table.delta_stats()
            trigger = (
                ds["delta_bytes"] >= compact_delta_ratio * ds["base_bytes"]
                if ds["base_bytes"] > 0
                else ds["delta_files"] > 2 * table.n_buckets
            )
        if trigger:
            # watermark = last committed seq: the binlog is seq-ordered by
            # epoch and committed epochs are never re-applied, so no event
            # below it can arrive again — tombstones under it are safely
            # expired (see LakeTable.compact). The per-epoch precondition
            # check above turns a violating source (later epoch carrying a
            # lower seq) into a hard error instead of a silent resurrect.
            if expire_tombstones:
                wm = int(seq_hi) + 1
                # Persist BEFORE expiring: if the process dies between the
                # two writes, the guard is armed but no tombstone is gone
                # yet — conservative in the safe direction. (The reverse
                # order leaves a window where expiry happened but a resumed
                # run has no watermark.)
                checkpoint.set_expiry_watermark(source, wm)
                expiry_watermark = max(expiry_watermark or 0, wm)
                table.compact(expire_tombstones_below=wm)
            else:
                table.compact()
        if trigger and bloom_cols:
            # bloom maintenance rides the compaction cadence: build_blooms
            # is incremental (covered files skip), so each call costs
            # O(files the compaction just wrote) and the point-lookup /
            # grep read path stays served while the table ingests
            table.build_blooms(bloom_cols, mode=bloom_mode)
        if fail_after_epochs is not None and applied >= fail_after_epochs:
            raise RuntimeError(f"injected failure after {applied} epochs")
    if bloom_cols:
        # final sweep: cover base files written since the last compaction
        # (COW merges write base directly; a trailing partial window has
        # no compaction to ride)
        table.build_blooms(bloom_cols, mode=bloom_mode)
    rep.duration_sec = time.time() - t0
    if collect_metrics:
        # published lineage only: staged/abandoned branch snapshots in the
        # log never became part of the table's history
        rep.metrics = [
            {**s["summary"], "epoch_id": s["epoch_id"], "snapshot_id": s["snapshot_id"]}
            for s in table.history()
            if s["operation"] == "merge"
        ]
    return rep
