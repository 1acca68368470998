"""Write-audit-publish (WAP) for CDC merges — Iceberg's branch-based
staging pattern over the engine's refs model (lake.table).

A merge commits to a STAGING BRANCH first; audits run against the staged
snapshot while main still serves the last published state; only an audit
pass fast-forwards main (one atomic pointer CAS — consumers see none or
all of the staged work, never a partial). An audit failure drops the
staging ref and raises: the bad batch never becomes visible, and because
unpublished epochs don't count as committed (LakeTable.committed_epochs
walks main's ancestry only), the epoch stays pending — a fixed source can
simply re-offer it.

Crash contract: death at ANY point re-runs cleanly. Before the publish,
the staged snapshots are unreachable from main, so the resumed replay
re-merges the epoch onto a freshly-reset staging branch (create_branch
reset=True) and the stale staging snapshots become expiry garbage. After
the publish, exactly-once replay-skip sees the epoch on main and skips.

Scale shape: staging adds two metadata-only CAS commits (branch reset +
publish) per group — O(bytes of the metadata JSON), no extra data IO or
shuffle. The audits below read only commit summaries unless a row-count
check is explicitly requested.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .table import CommitConflictError, LakeTable, PublishConflictError

#: audit callable: (table, staging_branch, merge_summary) -> list of
#: failure descriptions (empty == pass)
Audit = Callable[[LakeTable, str, dict[str, Any]], list[str]]


class WapAuditError(RuntimeError):
    """The staged merge failed its audits; nothing was published."""

    def __init__(self, epoch_id: Any, failures: list[str]):
        self.epoch_id = epoch_id
        self.failures = failures
        super().__init__(
            f"epoch {epoch_id} failed write-audit-publish checks "
            f"(nothing published): {'; '.join(failures)}"
        )


def basic_audit(
    min_rows_written: int = 0,
    max_quarantine_ratio: float | None = None,
    max_shrink_ratio: float | None = None,
) -> Audit:
    """The standard CDC publish gate.

    - ``min_rows_written``: a merge that wrote fewer physical rows than
      this fails (an empty epoch from a source that should never be empty
      usually means the extract silently broke).
    - ``max_quarantine_ratio``: fail when dead-lettered rows exceed this
      fraction of the batch (quarantine keeps single bad events out of the
      merge; a RATE of bad events means the source's schema drifted and a
      human should look before consumers do). Reads the summary's
      ``rows_quarantined`` / ``rows_in_delta`` lineage metrics — no data IO.
    - ``max_shrink_ratio``: fail when the staged LIVE row count dropped by
      more than this fraction vs main (the mass-delete guard: a buggy
      upstream emitting deletes for everything is the classic CDC disaster
      a WAP gate exists to stop). Costs two count jobs (staged + published
      state); at very large scale, run it on manifest row counts or a
      sampled bucket instead.
    """

    def audit(table: LakeTable, branch: str, summary: dict[str, Any]) -> list[str]:
        failures: list[str] = []
        rows_written = summary.get("rows_written")
        if rows_written is not None and rows_written < min_rows_written:
            failures.append(
                f"rows_written {rows_written} < min_rows_written {min_rows_written}"
            )
        if max_quarantine_ratio is not None:
            bad = summary.get("rows_quarantined")
            # rows_in_delta is the exact batch size when the driver
            # pre-scanned; otherwise fall back to rows_written (the LWW
            # winner count — ≤ valid rows, so the ratio only overstates:
            # conservative in the block-bad-batches direction). The
            # streaming driver never pre-scans, so it always lands here.
            good = summary.get("rows_in_delta")
            if good is None:
                good = summary.get("rows_written")
            if bad is not None and (bad + (good or 0)) > 0:
                ratio = bad / (bad + (good or 0))
                if ratio > max_quarantine_ratio:
                    failures.append(
                        f"quarantine ratio {ratio:.3f} > {max_quarantine_ratio}"
                        f" ({bad} dead-lettered of {bad + (good or 0)})"
                    )
        if max_shrink_ratio is not None:
            # baseline = the snapshot the staged commit FORKED from (its
            # parent), not main read at audit time: a concurrent writer
            # publishing to main mid-cycle would otherwise inflate
            # `before` with rows this branch never saw and fail a healthy
            # batch as a mass-delete
            staged = table.current_snapshot(ref=branch)
            parent = staged.get("parent_id") if staged else None
            before = 0
            if parent is not None:
                try:
                    before = table.read(snapshot_id=parent).count()
                except ValueError:
                    # parent expired mid-cycle (aggressive retention):
                    # fall back to the published head
                    before = table.read().count()
            if before > 0:
                after = table.read(ref=branch).count()
                shrink = (before - after) / before
                if shrink > max_shrink_ratio:
                    failures.append(
                        f"live rows shrank {shrink:.3f} ({before} -> {after}) "
                        f"> max_shrink_ratio {max_shrink_ratio}"
                    )
        return failures

    return audit


def null_key_audit(keys: tuple[str, str] = ("repo", "path")) -> Audit:
    """Belt-and-suspenders data audit: no live row on the staged branch may
    carry a null/empty merge key. One column-pruned filter-count over the
    staged state; quarantine already prevents this at ingest, so this gate
    is for tables written by paths that bypass it."""

    def audit(table: LakeTable, branch: str, summary: dict[str, Any]) -> list[str]:
        df: DataFrame = table.read(ref=branch)
        cond = F.lit(False)
        for k in keys:
            cond = cond | F.col(k).isNull() | (F.col(k) == "")
        n = df.filter(cond).count()
        return [f"{n} live rows with null/empty merge key"] if n else []

    return audit


def compose(*audits: Audit) -> Audit:
    """Run several audits; concatenate their failures."""

    def audit(table: LakeTable, branch: str, summary: dict[str, Any]) -> list[str]:
        out: list[str] = []
        for a in audits:
            out.extend(a(table, branch, summary))
        return out

    return audit


def wap_merge(
    table: LakeTable,
    delta: DataFrame,
    epoch_id: int | list[int] | None,
    audit: Audit,
    staging: str | None = None,
    source: str = "binlog",
    publish_retries: int = 2,
    **merge_kwargs: Any,
) -> int:
    """One write-audit-publish cycle: reset the staging branch to main's
    head, MERGE the batch onto it, audit the staged commit, publish on
    pass (atomic fast-forward of main), raise WapAuditError on fail with
    the staging ref dropped and main untouched.

    Idempotent under re-offer: an epoch already published skips inside
    merge_changes (staging is reset AT main head, so main's committed
    epochs are visible to the skip check) and the publish degenerates to
    dropping the ref. A PublishConflictError (concurrent main commit
    between reset and publish) re-runs the whole cycle against the new
    head, up to ``publish_retries`` times.

    Returns the snapshot id now at main's head for this epoch.
    """
    staging = staging or f"wap-{source}"
    last_err: Exception | None = None
    try:
        for _ in range(max(1, publish_retries + 1)):
            pre_main = table.current_snapshot()
            pre_id = pre_main["snapshot_id"] if pre_main else None
            # fork staging AT the head we just read, not at whatever head
            # create_branch would re-read: a concurrent main commit in
            # between would otherwise desync pre_id from the fork point,
            # breaking the staged_id == pre_id skip check below and aiming
            # the audit at a foreign commit's summary
            table.create_branch(staging, at_snapshot_id=pre_id, reset=True)
            sid = table.merge_changes(
                delta, epoch_id=epoch_id, branch=staging, source=source, **merge_kwargs
            )
            staged = table.current_snapshot(ref=staging)
            staged_id = staged["snapshot_id"] if staged else None
            if staged_id == pre_id:
                # exactly-once skip: every epoch of the group is already
                # published on main; nothing was staged
                table.drop_ref(staging)
                return sid
            failures = audit(table, staging, (staged or {}).get("summary", {}))
            if failures:
                # cleanup must not mask the audit verdict: drop_ref's
                # metadata CAS can lose a race and raise
                # CommitConflictError, which a replay driver would treat
                # as "retry the epoch" — re-staging a known-bad batch
                # instead of dead-lettering it. The ref, if left behind,
                # is retargeted by the next cycle's create_branch(reset).
                try:
                    table.drop_ref(staging)
                except Exception:
                    pass
                raise WapAuditError(epoch_id, failures)
            try:
                return table.publish(staging)
            except PublishConflictError as e:
                last_err = e  # main moved; re-stage against the new head
            except CommitConflictError as e:
                # the publish CAS itself lost (competitor committed between
                # its metadata read and write) — same recovery: re-stage
                last_err = e
        raise last_err  # type: ignore[misc]
    except WapAuditError:
        raise  # staging already dropped above
    except Exception:
        # any other exit (exhausted retries, a CAS conflict from the
        # branch reset or the staged merge, executor failure): drop the
        # staging ref best-effort so abandoned staged snapshots become
        # expiry garbage instead of being pinned forever by a live ref
        try:
            table.drop_ref(staging)
        except Exception:
            # ref already gone, or metadata contended; the next WAP cycle's
            # create_branch(reset=True) retargets it anyway
            pass
        raise
