"""Column-level merge engines (operators/partial_update.py): semantics on
hand-built histories, permutation/monoid properties on the derived patch
binlog, and plan audits proving the one-hash-aggregate shape."""

import random

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from fao_elt_pipelines_spark.operators.partial_update import (
    agg_merge,
    agg_merge_states,
    fold_partial,
    merge_partial_states,
    partial_update_state,
    visible_agg,
    visible_partial,
)
from fao_elt_pipelines_spark.plans.queries import _derived_patch_binlog
from tests.plan_utils import n_nodes, plan_of

SCHEMA = "seq long, repo string, path string, op string, commit string, lang string, content string"


def _events(spark, rows):
    return spark.createDataFrame(
        [(s, r, p, o, c, l, t) for (s, r, p, o, c, l, t) in rows], SCHEMA
    )


def _state(df):
    return {
        (r.repo, r.path): (r.commit, r.lang, r.content, r.last_seq)
        for r in df.collect()
    }


# -------------------------- unit semantics --------------------------------


def test_patch_overlays_upsert(spark):
    df = _events(
        spark,
        [
            (1, "r", "a", "insert", "c1", "py", "v1"),
            (2, "r", "a", "patch", None, None, "v2"),  # touches content only
        ],
    )
    st = _state(partial_update_state(df))
    assert st == {("r", "a"): ("c1", "py", "v2", 2)}


def test_upsert_null_column_clears_earlier_patch(spark):
    df = _events(
        spark,
        [
            (1, "r", "a", "patch", "c0", None, None),
            (2, "r", "a", "insert", "c2", None, "v2"),  # lang=None CLEARS
        ],
    )
    st = _state(partial_update_state(df))
    assert st == {("r", "a"): ("c2", None, "v2", 2)}


def test_all_null_patch_after_delete_still_recreates(spark):
    """A patch that sets NONE of the tracked value columns (it touched only
    columns outside this state's schema, or was a no-op) still counts as a
    touch: the row is recreated, matching the oracle's patch_after rule."""
    df = _events(
        spark,
        [
            (1, "r", "a", "insert", "c1", "py", "v1"),
            (2, "r", "a", "delete", None, None, None),
            (3, "r", "a", "patch", None, None, None),
        ],
    )
    st = _state(partial_update_state(df))
    assert st == {("r", "a"): (None, None, None, 3)}


def test_delete_then_patch_recreates_from_nulls(spark):
    df = _events(
        spark,
        [
            (1, "r", "a", "insert", "c1", "py", "v1"),
            (2, "r", "a", "delete", None, None, None),
            (3, "r", "a", "patch", None, "go", None),
        ],
    )
    st = _state(partial_update_state(df))
    # the patch recreates the row; pre-delete columns stay dead
    assert st == {("r", "a"): (None, "go", None, 3)}


def test_delete_last_drops_row(spark):
    df = _events(
        spark,
        [
            (1, "r", "a", "insert", "c1", "py", "v1"),
            (2, "r", "a", "patch", "c2", None, None),
            (3, "r", "a", "delete", None, None, None),
        ],
    )
    assert partial_update_state(df).count() == 0


def test_patches_only_key_exists(spark):
    df = _events(spark, [(5, "r", "b", "patch", None, "rs", None)])
    st = _state(partial_update_state(df))
    assert st == {("r", "b"): (None, "rs", None, 5)}


def test_stale_patch_merged_later_does_not_override(spark):
    """Out-of-order epochs: a LOWER-seq patch folded in a later batch must
    lose to state already holding a higher-seq value — the property the
    per-column seq in the state struct exists to guarantee."""
    s1 = fold_partial(_events(spark, [(10, "r", "a", "patch", "c10", None, None)]))
    s2 = fold_partial(_events(spark, [(5, "r", "a", "patch", "c5", "py", None)]))
    st = _state(visible_partial(merge_partial_states(s1, s2)))
    # commit keeps seq-10 value; lang was never set above, so seq-5 wins it
    assert st == {("r", "a"): ("c10", "py", None, 10)}


def test_delete_in_other_epoch_beats_lower_seq_patch(spark):
    s1 = fold_partial(_events(spark, [(10, "r", "a", "patch", "c10", None, None)]))
    s2 = fold_partial(_events(spark, [(20, "r", "a", "delete", None, None, None)]))
    assert visible_partial(merge_partial_states(s1, s2)).count() == 0
    # and commutatively
    assert visible_partial(merge_partial_states(s2, s1)).count() == 0


# ----------------------- properties on the derived binlog ------------------


@pytest.fixture(scope="module")
def patch_binlog(spark, sf_dir):
    return _derived_patch_binlog(spark, sf_dir).cache()


def test_permutation_invariance(spark, patch_binlog):
    base = _state(partial_update_state(patch_binlog))
    shuffled = patch_binlog.orderBy(F.md5(F.col("seq").cast("string")))
    assert _state(partial_update_state(shuffled)) == base


def test_monoid_split_associativity(spark, patch_binlog):
    """Random 4-way epoch split, folded and merged under two different
    association orders AND swapped operands, equals the one-shot fold."""
    base = _state(partial_update_state(patch_binlog))
    rng = random.Random(7)
    cuts = sorted(rng.sample(range(1, 1000), 3))
    parts = [
        patch_binlog.filter(
            (F.col("seq") % 1000 >= lo) & (F.col("seq") % 1000 < hi)
        )
        for lo, hi in zip([0, *cuts], [*cuts, 1000])
    ]
    folds = [fold_partial(p) for p in parts]
    left = merge_partial_states(
        merge_partial_states(merge_partial_states(folds[0], folds[1]), folds[2]), folds[3]
    )
    right = merge_partial_states(
        merge_partial_states(folds[3], folds[2]), merge_partial_states(folds[1], folds[0])
    )
    assert _state(visible_partial(left)) == base
    assert _state(visible_partial(right)) == base


def test_plan_single_aggregate_no_window(spark, patch_binlog):
    plan = plan_of(partial_update_state(patch_binlog))
    assert n_nodes(plan, "Window") == 0
    assert n_nodes(plan, "Exchange") == 1  # one shuffle: the groupBy(keys)
    assert "Python" not in plan  # fully JVM-side
    # map-side combine BEFORE the shuffle (struct-max buffers aren't
    # hash-aggregable, so this is the same partial/final SortAggregate
    # pair operators.dedup's max_by LWW gets)
    assert "partial_max" in plan.split("Exchange")[0] or n_nodes(plan, "SortAggregate") >= 2


def test_merge_states_plan_no_extra_shuffle(spark, patch_binlog):
    mid = 500
    s1 = fold_partial(patch_binlog.filter(F.col("seq") % 1000 < mid))
    s2 = fold_partial(patch_binlog.filter(F.col("seq") % 1000 >= mid))
    plan = plan_of(merge_partial_states(s1, s2))
    # two fold shuffles; the merge aggregate reuses the folds'
    # co-partitioning on (repo, path) — at most one more exchange if the
    # planner declines the reuse
    assert 2 <= n_nodes(plan, "Exchange") <= 3
    assert n_nodes(plan, "Window") == 0


# --------------------------- sequence-groups ------------------------------


def test_seqgroup_orders_each_column_by_its_own_clock(spark):
    rows = [
        # (seq, seq2): lang's clock runs OPPOSITE to the primary clock
        (1, 30, "r", "a", "patch", "c1", "go", None),
        (2, 20, "r", "a", "patch", None, "py", "v2"),
        (3, 10, "r", "a", "patch", "c3", "rs", None),
    ]
    df = spark.createDataFrame(
        rows,
        "seq long, seq2 long, repo string, path string, op string, "
        "commit string, lang string, content string",
    )
    st = partial_update_state(df, reset_ops=(), seq_by_col={"lang": "seq2"})
    r = st.collect()[0]
    # commit/content by primary seq; lang by seq2 (winner = seq2=30 -> 'go')
    assert (r.commit, r.lang, r.content, r.last_seq) == ("c3", "go", "v2", 3)
    # and the same through the cross-epoch monoid, epochs split adversarially
    m = merge_partial_states(
        fold_partial(df.filter(F.col("seq") == 3), reset_ops=(), seq_by_col={"lang": "seq2"}),
        fold_partial(df.filter(F.col("seq") < 3), reset_ops=(), seq_by_col={"lang": "seq2"}),
    )
    r2 = visible_partial(m).collect()[0]
    assert (r2.commit, r2.lang, r2.content, r2.last_seq) == ("c3", "go", "v2", 3)


def test_seqgroup_rejects_resets_and_unknown_columns(spark):
    df = spark.createDataFrame(
        [(1, 1, "r", "a", "patch", None, None, None)],
        "seq long, seq2 long, repo string, path string, op string, "
        "commit string, lang string, content string",
    )
    with pytest.raises(ValueError, match="append\\+patch"):
        fold_partial(df, seq_by_col={"lang": "seq2"})  # default reset_ops
    with pytest.raises(ValueError, match="unknown value columns"):
        fold_partial(df, reset_ops=(), seq_by_col={"nope": "seq2"})


# ------------------- property: engine ≡ sequential fold -------------------


@st.composite
def patch_event_lists(draw):
    n = draw(st.integers(min_value=1, max_value=40))
    seqs = draw(
        st.lists(st.integers(min_value=0, max_value=10_000), min_size=n, max_size=n, unique=True)
    )
    rows = []
    for i, seq in enumerate(seqs):
        repo = draw(st.sampled_from(["r0", "r1"]))
        path = draw(st.sampled_from(["a", "b"]))
        op = draw(st.sampled_from(["insert", "update", "delete", "patch"]))
        if op == "delete":
            c = l = t = None
        elif op == "patch":
            # any subset of columns, INCLUDING none (all-null touch)
            c = f"c{i}" if draw(st.booleans()) else None
            l = "py" if draw(st.booleans()) else None
            t = f"v{i}" if draw(st.booleans()) else None
        else:  # upsert: full row, but lang may be null (upsert-clears)
            c, l, t = f"c{i}", ("py" if draw(st.booleans()) else None), f"v{i}"
        rows.append((seq, seq % 2, op, repo, path, c, l, t))
    return rows


def py_partial_fold(rows):
    """The trivially-correct model: apply events one at a time in seq
    order. Upserts replace all columns, deletes clear, patches overlay
    their non-null columns (and recreate deleted rows even when all-null)."""
    state: dict = {}
    last_seq: dict = {}
    for seq, _e, op, repo, path, c, l, t in sorted(rows):
        k = (repo, path)
        last_seq[k] = max(last_seq.get(k, -1), seq)
        if op in ("insert", "update"):
            state[k] = {"commit": c, "lang": l, "content": t, "live": True}
        elif op == "delete":
            state[k] = {"commit": None, "lang": None, "content": None, "live": False}
        else:
            cur = state.get(k, {"commit": None, "lang": None, "content": None, "live": False})
            new = dict(cur, live=True)
            for col, v in (("commit", c), ("lang", l), ("content", t)):
                if v is not None:
                    new[col] = v
            state[k] = new
    return {
        k: (v["commit"], v["lang"], v["content"], last_seq[k])
        for k, v in state.items()
        if v["live"]
    }


@given(rows=patch_event_lists())
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_partial_update_matches_sequential_fold(spark, rows):
    df = spark.createDataFrame(
        [(s, r, p, o, c, l, t) for (s, _e, o, r, p, c, l, t) in rows], SCHEMA
    )
    assert _state(partial_update_state(df)) == py_partial_fold(rows)
    # and through the cross-batch monoid (epochs by seq parity, swapped order)
    e0 = df.filter(F.col("seq") % 2 == 0)
    e1 = df.filter(F.col("seq") % 2 == 1)
    merged = merge_partial_states(fold_partial(e1), fold_partial(e0))
    assert _state(visible_partial(merged)) == py_partial_fold(rows)


# ----------------------------- agg engine ---------------------------------


def test_agg_merge_split_equals_oneshot(spark, patch_binlog):
    ev = patch_binlog.select(
        "seq",
        "repo",
        "path",
        (F.col("seq") % 11).cast("decimal(18,2)").alias("metric_total"),
        (F.col("seq") % 7).cast("double").alias("metric_max"),
        F.col("lang").alias("lang_last"),
    )
    specs = {"metric_total": "sum", "metric_max": "max", "lang_last": "last"}
    oneshot = {
        (r.repo, r.path): (r.metric_total, r.metric_max, r.lang_last, r.last_seq)
        for r in agg_merge(ev, specs).collect()
    }
    s1 = agg_merge(ev.filter(F.col("seq") % 3 == 0), specs, mergeable=True)
    s2 = agg_merge(ev.filter(F.col("seq") % 3 == 1), specs, mergeable=True)
    s3 = agg_merge(ev.filter(F.col("seq") % 3 == 2), specs, mergeable=True)
    merged = agg_merge_states(agg_merge_states(s3, s1, specs), s2, specs)
    got = {
        (r.repo, r.path): (r.metric_total, r.metric_max, r.lang_last, r.last_seq)
        for r in visible_agg(merged, specs).collect()
    }
    assert got == oneshot


def test_agg_merge_last_skips_nulls(spark):
    ev = spark.createDataFrame(
        [(1, "r", "a", "x"), (2, "r", "a", None), (3, "r", "a", None)],
        "seq long, repo string, path string, lang_last string",
    )
    rows = agg_merge(ev, {"lang_last": "last"}).collect()
    assert [(r.lang_last, r.last_seq) for r in rows] == [("x", 3)]


def test_first_row_keeps_earliest_and_merges_as_monoid(spark):
    from fao_elt_pipelines_spark.operators.dedup import first_row

    e1 = _events(spark, [(7, "r", "a", "update", "c7", "go", "v7")])
    e2 = _events(
        spark,
        [
            (3, "r", "a", "insert", "c3", "py", "v3"),
            (9, "r", "a", "delete", None, None, None),
            (5, "r", "b", "insert", "c5", "rs", "v5"),
        ],
    )
    both = e1.unionByName(e2)
    oneshot = {(r.repo, r.path): (r.seq, r.commit) for r in first_row(both).collect()}
    assert oneshot == {("r", "a"): (3, "c3"), ("r", "b"): (5, "c5")}
    # epoch folds merge as min-of-mins: first_row over folded states,
    # in either operand order (out-of-order epoch arrival)
    f1, f2 = first_row(e1), first_row(e2)
    for union in (f1.unionByName(f2), f2.unionByName(f1)):
        merged = {(r.repo, r.path): (r.seq, r.commit) for r in first_row(union).collect()}
        assert merged == oneshot


def test_agg_merge_extended_fns_split_equals_oneshot(spark, patch_binlog):
    """count/first/bool_or/bool_and across an epoch split must equal the
    one-shot fold — count partials MUST re-merge by sum (a re-count of
    partial counts per key would collapse to the number of epochs)."""
    ev = patch_binlog.select(
        "seq",
        "repo",
        "path",
        F.col("commit").alias("n_commits"),  # count skips nulls
        F.col("lang").alias("first_lang"),
        (F.col("seq") % 2 == 0).alias("any_even"),
        (F.col("seq") % 3 != 1).alias("all_nonone"),
    )
    specs = {
        "n_commits": "count",
        "first_lang": "first",
        "any_even": "bool_or",
        "all_nonone": "bool_and",
    }

    def key(df):
        return {
            (r.repo, r.path): (r.n_commits, r.first_lang, r.any_even, r.all_nonone, r.last_seq)
            for r in df.collect()
        }

    oneshot = key(agg_merge(ev, specs))
    s1 = agg_merge(ev.filter(F.col("seq") % 3 == 0), specs, mergeable=True)
    s2 = agg_merge(ev.filter(F.col("seq") % 3 == 1), specs, mergeable=True)
    s3 = agg_merge(ev.filter(F.col("seq") % 3 == 2), specs, mergeable=True)
    merged = agg_merge_states(agg_merge_states(s2, s3, specs), s1, specs)
    assert key(visible_agg(merged, specs)) == oneshot
    # sanity on semantics: first = lowest-seq non-null
    any_key = next(iter(oneshot))
    assert oneshot[any_key][0] >= 0


def test_agg_merge_unknown_fn_raises(spark):
    ev = spark.createDataFrame([(1, "r", "a", 1.0)], "seq long, repo string, path string, v double")
    with pytest.raises(ValueError, match="unknown aggregation"):
        agg_merge(ev, {"v": "median"})
