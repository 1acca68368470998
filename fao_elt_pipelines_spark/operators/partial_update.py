"""Column-level merge engines: partial-update and per-column aggregation.

Row-level LWW (operators.dedup) replaces the WHOLE row per key — the only
semantics the reference pipeline needs, because its extract always ships
full records (``/root/reference/ingestion/load_to_database.py:70-83``
truncate-and-reload). Real CDC streams are not always so kind: Mongo/
Cassandra/Postgres-TOAST change events routinely carry only the columns
that changed. These operators add the two standard column-level merge
engines (the same pair Apache Paimon ships as ``partial-update`` and
``aggregation``, and Flink SQL models as upsert + per-column agg), built
so the fold is a single hash aggregate over an associative, commutative
monoid — the shape that scales.

Semantics (partial update)
--------------------------
Events per key, globally-unique ``seq``, ops:

- an *upsert* op (``reset_ops``): the row becomes exactly the event's
  columns — a null column in an upsert CLEARS it; earlier patches die.
- ``patch``: each NON-null value column overwrites; null means "not
  touched", never "clear".
- ``delete``: the row is removed; a later-seq patch recreates it from
  nulls (Paimon's partial-update behavior without sequence-groups).

Scale design — why a max-monoid, not a window
---------------------------------------------
The fold state per key is: ``_pu_reset`` = max(seq, is_delete) over
reset-type events, ``_pu_patch_seq`` = max seq over patch events (their
touch matters for existence even when they set none of the tracked
columns), and per value column ``c`` a ``(seq, value)`` struct = max over
the events that SET ``c`` (non-null patch or upsert columns; delete sets
nothing). Struct max compares ``seq`` first, so the whole
fold is one aggregate with ONE shuffle: Spark runs map-side partial
aggregation first, so the shuffle carries one state row per (key, map
task) instead of every event, and no per-key window ranking happens
anywhere. (Physically it plans as the partial/final SortAggregate pair —
struct-valued max buffers aren't hash-aggregable — exactly the plan
shape operators.dedup's ``max_by`` LWW runs; the shuffle-volume story is
identical to HashAggregate's, plan-audited in tests/test_partial_update.) Column values set
BELOW the winning reset are deliberately kept in the stored state and
nulled only in the visible projection — that keeps the binary merge a
pure field-wise ``max``, hence associative AND commutative: epochs can be
folded in any grouping and any order (out-of-order epoch arrival
included) and converge to the same state, which is what makes the
operator safe for distributed, restartable replay. The visible row exists
unless the newest reset is a delete with no live patch above it.

``fold_partial`` → mergeable state, ``merge_partial_states`` → the monoid
``+``, ``visible_partial`` → final rows; ``partial_update_state`` is the
one-shot composition. Differential oracle: plans/queries.py
``cdc_partial_update`` / ``cdc_partial_update_merge``.

Aggregation engine
------------------
``agg_merge`` folds value columns with per-column aggregate specs
(``sum``/``min``/``max``/``last`` = last-non-null-by-seq, the Paimon
aggregation-engine core set). All four are associative+commutative, so
cross-batch merging reuses the same specs (``sum`` re-sums partial sums,
``last`` re-maxes the (seq, value) struct), again one single-shuffle
aggregate per fold with map-side combine — and because the fold emits
states already partitioned by key, merging two folds reuses that
co-partitioning instead of shuffling a third time.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

RESET_OPS_DEFAULT = ("insert", "update")
_NEG = -1  # sentinel "no reset seen"; real seqs are >= 0


def _state_cols(value_cols: Sequence[str]) -> list[str]:
    return ["_pu_reset", *[f"_pu_{c}" for c in value_cols], "_pu_patch_seq", "last_seq"]


def fold_partial(
    events: DataFrame,
    keys: Sequence[str] = ("repo", "path"),
    seq_col: str = "seq",
    op_col: str = "op",
    value_cols: Sequence[str] = ("commit", "lang", "content"),
    reset_ops: Sequence[str] = RESET_OPS_DEFAULT,
    seq_by_col: Mapping[str, str] | None = None,
) -> DataFrame:
    """Fold an event batch into mergeable partial-update state.

    One single-shuffle aggregate; every function is a ``max`` of a struct
    keyed by ``seq`` (unique), so results are deterministic and the
    map-side partial aggregate pre-reduces duplicates before the shuffle.

    ``seq_by_col`` maps a value column to ITS OWN ordering column —
    Paimon's sequence-groups: columns owned by different upstream systems
    carry independent clocks, and each column's last-set winner is
    decided by its group's clock (unmapped columns use ``seq_col``).
    Sequence-groups compose with the monoid only on append+patch streams:
    a reset (upsert/delete) is ordered by the PRIMARY clock, and "column
    set below a later reset dies" is undecidable across clocks inside an
    associative fold — so combining ``seq_by_col`` with resets raises,
    exactly the restriction Paimon documents for partial-update deletes
    without a sequence-group covering them.
    """
    seq, op = F.col(seq_col), F.col(op_col)
    if seq_by_col:
        bad = [c for c in seq_by_col if c not in value_cols]
        if bad:
            raise ValueError(f"seq_by_col for unknown value columns: {bad}")
        if tuple(reset_ops) != ():
            raise ValueError(
                "sequence-groups require an append+patch stream: pass "
                "reset_ops=() and pre-drop resets/deletes (see docstring)"
            )

    def order_of(c: str):
        return F.col(seq_by_col[c]) if seq_by_col and c in seq_by_col else seq

    # under sequence-groups deletes are NOT resets (they are ignored rows;
    # pre-drop them — see docstring); otherwise delete always resets
    is_reset = (op.isin(*reset_ops) if reset_ops else F.lit(False)) | (
        F.lit(False) if seq_by_col else (op == "delete")
    )
    aggs = [
        F.max(F.when(is_reset, F.struct(seq.alias("seq"), (op == "delete").alias("is_del")))).alias(
            "_pu_reset"
        ),
        *[
            F.max(
                F.when(
                    F.col(c).isNotNull() & (op != "delete"),
                    F.struct(order_of(c).alias("seq"), F.col(c).alias("val")),
                )
            ).alias(f"_pu_{c}")
            for c in value_cols
        ],
        # newest patch TOUCH regardless of which columns it set: a patch
        # whose value_cols are all null (it touched only columns outside
        # this state's schema, or was a no-op) still recreates a deleted
        # row per the engine contract — without this the fold couldn't see
        # such events and would diverge from the oracle's patch_after test
        F.max(F.when(~is_reset, seq)).alias("_pu_patch_seq"),
        F.max(seq).alias("last_seq"),
    ]
    return events.groupBy(*keys).agg(*aggs)


def merge_partial_states(
    a: DataFrame,
    b: DataFrame,
    keys: Sequence[str] = ("repo", "path"),
    value_cols: Sequence[str] = ("commit", "lang", "content"),
) -> DataFrame:
    """The monoid ``+``: field-wise struct-max of two state frames.

    union + re-aggregate rather than a full-outer join: the same shuffle
    count (one), no null-pad branches, and it generalizes to merging N
    state frames at once.
    """
    cols = [*keys, *_state_cols(value_cols)]
    both = a.select(*cols).unionByName(b.select(*cols))
    aggs = [F.max(c).alias(c) for c in _state_cols(value_cols)]
    return both.groupBy(*keys).agg(*aggs)


def visible_partial(
    state: DataFrame,
    keys: Sequence[str] = ("repo", "path"),
    value_cols: Sequence[str] = ("commit", "lang", "content"),
) -> DataFrame:
    """Project mergeable state to visible rows.

    A column's stored (seq, val) wins only at-or-above the newest reset:
    ``>=`` because equality is only possible when the reset IS the upsert
    that set the column (delete events set no columns). The row exists
    unless the newest reset is a delete with no patch strictly above it
    (``_pu_patch_seq`` — a later patch recreates the row even when it set
    none of THESE value columns).
    """
    rseq = F.coalesce(F.col("_pu_reset.seq"), F.lit(_NEG))
    vals = [
        F.when(F.col(f"_pu_{c}.seq") >= rseq, F.col(f"_pu_{c}.val")).alias(c) for c in value_cols
    ]
    patched_above = F.coalesce(F.col("_pu_patch_seq") > rseq, F.lit(False))
    exists = F.coalesce(~F.col("_pu_reset.is_del"), F.lit(True)) | patched_above
    return state.filter(exists).select(*keys, *vals, "last_seq")


def partial_update_state(
    events: DataFrame,
    keys: Sequence[str] = ("repo", "path"),
    seq_col: str = "seq",
    op_col: str = "op",
    value_cols: Sequence[str] = ("commit", "lang", "content"),
    reset_ops: Sequence[str] = RESET_OPS_DEFAULT,
    seq_by_col: Mapping[str, str] | None = None,
) -> DataFrame:
    """One-shot fold: events → visible final state (single shuffle)."""
    return visible_partial(
        fold_partial(events, keys, seq_col, op_col, value_cols, reset_ops, seq_by_col),
        keys,
        value_cols,
    )


# --------------------------------------------------------------------------
# Aggregation merge engine
# --------------------------------------------------------------------------

AGG_FNS = ("sum", "min", "max", "last", "first", "count", "bool_or", "bool_and")
_PACKED = ("last", "first")  # stored as (seq, val) structs in mergeable state


def _agg_expr(col: str, fn: str, seq: Column) -> Column:
    if fn == "sum":
        return F.sum(col).alias(col)
    if fn == "min":
        return F.min(col).alias(col)
    if fn == "max":
        return F.max(col).alias(col)
    if fn == "count":  # re-merged with SUM, never count (see agg_merge_states)
        return F.count(col).alias(col)
    if fn == "bool_or":
        return F.bool_or(col).alias(col)
    if fn == "bool_and":
        return F.bool_and(col).alias(col)
    if fn in _PACKED:  # last/first non-null by seq, packed as (seq, val)
        red = F.max if fn == "last" else F.min
        return red(
            F.when(F.col(col).isNotNull(), F.struct(seq.alias("seq"), F.col(col).alias("val")))
        ).alias(f"_am_{col}")
    raise ValueError(f"unknown aggregation {fn!r} for column {col!r} (supported: {AGG_FNS})")


def agg_merge(
    events: DataFrame,
    specs: Mapping[str, str],
    keys: Sequence[str] = ("repo", "path"),
    seq_col: str = "seq",
    mergeable: bool = False,
) -> DataFrame:
    """Per-column aggregation merge engine (Paimon's ``aggregation``).

    ``specs`` maps value column → one of ``AGG_FNS``
    (``sum|min|max|last|first|count|bool_or|bool_and``). With
    ``mergeable=True``, ``last``/``first`` columns stay packed as
    (seq, val) structs so the OUTPUT of one fold can be fed back through
    ``agg_merge_states`` — sums and counts re-sum, min/max/bool re-reduce,
    last re-maxes and first re-mins the struct — giving exact cross-batch/
    out-of-order merging with the same one-shuffle plan.
    """
    seq = F.col(seq_col)
    aggs = [_agg_expr(c, fn, seq) for c, fn in specs.items()]
    out = events.groupBy(*keys).agg(*aggs, F.max(seq).alias("last_seq"))
    return out if mergeable else visible_agg(out, specs, keys)


def agg_merge_states(
    a: DataFrame,
    b: DataFrame,
    specs: Mapping[str, str],
    keys: Sequence[str] = ("repo", "path"),
) -> DataFrame:
    """Merge two mergeable ``agg_merge`` states (associative+commutative)."""
    cols = [
        *keys,
        *[f"_am_{c}" if fn in _PACKED else c for c, fn in specs.items()],
        "last_seq",
    ]
    both = a.select(*cols).unionByName(b.select(*cols))

    def remerge(c: str, fn: str) -> Column:
        if fn == "last":
            return F.max(f"_am_{c}").alias(f"_am_{c}")
        if fn == "first":
            return F.min(f"_am_{c}").alias(f"_am_{c}")
        if fn == "count":  # partial counts merge by SUM, never by count
            return F.sum(c).alias(c)
        return _agg_expr(c, fn, F.col("last_seq"))

    aggs = [remerge(c, fn) for c, fn in specs.items()]
    return both.groupBy(*keys).agg(*aggs, F.max("last_seq").alias("last_seq"))


def visible_agg(
    state: DataFrame, specs: Mapping[str, str], keys: Sequence[str] = ("repo", "path")
) -> DataFrame:
    """Unpack a mergeable agg state to plain columns."""
    return state.select(
        *keys,
        *[
            F.col(f"_am_{c}.val").alias(c) if fn in _PACKED else F.col(c)
            for c, fn in specs.items()
        ],
        "last_seq",
    )
