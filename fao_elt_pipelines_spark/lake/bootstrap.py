"""Initial-snapshot bootstrap → binlog handoff (the Debezium snapshot
model).

A CDC pipeline rarely starts from an empty source: the source table has
years of state and the binlog only reaches back days. The standard answer
(Debezium, DMS, Flink CDC) is a two-phase start — load a CONSISTENT
snapshot of the source taken at a known log position, then tail the binlog
from exactly that position. This module is that handoff for the lake table:

- ``bootstrap_snapshot`` merges the snapshot rows as synthetic events at
  ``seq = watermark_seq`` (or per-row seqs when the export carries them)
  and records the watermark in the snapshot summary AND the checkpoint.
- ``replay`` (lake.replay) then filters the binlog to ``seq > watermark``:
  events at or below it are already reflected in the snapshot. The filter
  is declarative, so it reaches the parquet scan (predicate pushdown /
  partition pruning on seq-aligned epochs) — fully-covered epochs cost a
  pruned scan, not an apply.

Correctness does not hinge on the filter: snapshot rows enter at the
watermark seq, so a re-delivered event from below the watermark loses LWW
to them by construction (and keys deleted before the snapshot are simply
absent, which replaying their old events can only reaffirm). The filter is
the scale optimization; LWW is the safety net.

Crash contract: the table commit carries the watermark in its summary, so
a crash between the table commit and the checkpoint write heals on rerun —
``bootstrap_snapshot`` finds the committed watermark and finishes the
checkpoint write instead of double-loading.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .checkpoint import CheckpointStore
from .table import LakeTable


def table_bootstrap_watermark(
    table: LakeTable, source: str = "binlog", include_sourceless: bool = True
) -> int | None:
    """The watermark of THIS SOURCE's committed bootstrap, if any (crash
    recovery). Watermarks are per source — healing source B's checkpoint
    from source A's bootstrap would arm B's binlog filter at a position B
    never loaded, silently dropping its covered prefix. Legacy bootstraps
    committed without a recorded source match any query by default
    (single-source tables predate the field); pass
    ``include_sourceless=False`` when a match will ARM a filter rather
    than merely report — an unattributable bootstrap must then be refused
    (by the caller), never assumed to be this source's."""
    for s in table.snapshots():
        w = (s.get("summary") or {}).get("bootstrap_watermark")
        s_src = s.get("source") or (s.get("summary") or {}).get("source")
        if w is not None and (
            s_src == source or (s_src is None and include_sourceless)
        ):
            return int(w)
    return None


def bootstrap_snapshot(
    snapshot_df: DataFrame,
    table: LakeTable,
    checkpoint: CheckpointStore,
    watermark_seq: int,
    source: str = "binlog",
    seq_col: str | None = None,
    mode: str = "cow",
) -> int | None:
    """Load ``snapshot_df`` (full source state, consistent as of
    ``watermark_seq``) into an empty ``table`` and arm the checkpoint so
    replay tails the binlog from past the watermark.

    ``seq_col``: when the export carries a per-row last-modified seq, pass
    its column name — rows then enter at their true seqs (exact ``last_seq``
    parity with a from-scratch replay). Without it every row enters at the
    watermark (the Debezium model: the snapshot read is consistent as of
    one log position, so that position is every row's version).

    Returns the committed snapshot id, or None when the table was already
    bootstrapped (idempotent rerun; the checkpoint is healed if the prior
    run died between table commit and checkpoint write).
    """
    # Strictly attributed: a legacy source-less bootstrap must NOT
    # early-return here — arming THIS source's binlog filter at a
    # watermark some other source loaded would silently drop this
    # source's covered prefix. Source-less history instead falls through
    # to the refusal guard below (refuse rather than guess).
    prior = table_bootstrap_watermark(table, source, include_sourceless=False)
    if prior is not None:
        if checkpoint.bootstrap_watermark(source) is None:
            checkpoint.set_bootstrap_watermark(source, prior)
        return None
    cur = table.current_snapshot()
    if cur is not None:
        # Multi-source tables may bootstrap each source in turn, but only
        # when the existing state is attributably OTHER sources': commits
        # from THIS source mean a replay already ran (bootstrap would
        # rewind it), and source-less commits (legacy, or manual appends)
        # are unattributable — refuse both rather than guess.
        chain = table.history()
        owned = [
            s
            for s in chain
            if (s.get("source") or (s.get("summary") or {}).get("source"))
            in (source, None)
        ]
        if owned:
            raise ValueError(
                f"bootstrap_snapshot for source {source!r} targets a table "
                "with committed state from this source (or from commits with "
                "no recorded source): resume the binlog replay instead, or "
                "create a fresh table for the snapshot load"
            )
    reserved = {"seq", "op"} & set(snapshot_df.columns) - ({seq_col} if seq_col else set())
    if reserved:
        raise ValueError(
            f"snapshot export carries reserved column(s) {sorted(reserved)}: "
            "pass seq_col to use the export's own sequence, or rename/drop "
            "them (they would collide with the synthesized event envelope)"
        )
    if seq_col is not None:
        seq = F.col(seq_col).cast("long")
        # one column-pruned scan, once per table lifetime: a row "from the
        # future" of the watermark breaks the handoff contract (the binlog
        # filter would skip events the snapshot does NOT reflect)
        mx = snapshot_df.agg(F.max(seq).alias("mx")).collect()[0]["mx"]
        if mx is not None and mx > watermark_seq:
            raise ValueError(
                f"snapshot carries seq {mx} above the declared watermark "
                f"{watermark_seq}: the export is not consistent as of the "
                "watermark position"
            )
    else:
        seq = F.lit(int(watermark_seq))
    payload = [c for c in snapshot_df.columns if c != seq_col]
    ev = snapshot_df.select(
        *[F.col(c) for c in payload],
        seq.alias("seq"),
        F.lit("base").alias("op"),
    )
    sid = table.merge_changes(
        ev,
        epoch_id=None,
        metrics={"bootstrap_watermark": int(watermark_seq), "source": source},
        mode=mode,
        source=source,
    )
    checkpoint.set_bootstrap_watermark(source, int(watermark_seq))
    return sid
