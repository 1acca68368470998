"""SCD Type-2 history build (operators/scd.py).

Handcrafted timelines pin every semantic branch — interval tiling,
change suppression, delete-close, delete→re-insert, double/leading
deletes, null attributes — and a plan audit pins the one-Exchange,
no-single-partition-window physical shape.
"""

import pytest
from pyspark.sql import functions as F

from fao_elt_pipelines_spark.operators.scd import scd2_as_of, scd2_history
from tests.plan_utils import n_nodes, plan_of


def _hist(spark, rows, **kw):
    df = spark.createDataFrame(rows, "seq long, k string, op string, a string, b long")
    out = scd2_history(df, keys=["k"], attrs=["a", "b"], **kw)
    return {
        (r.k, r.valid_from_seq): (
            r.a,
            r.b,
            r.valid_to_seq,
            r.is_current,
            r.version_num,
        )
        for r in out.collect()
    }


def test_versions_tile_and_close(spark):
    """Each change opens a version; the next change closes it half-open."""
    got = _hist(
        spark,
        [
            (1, "k1", "insert", "x", 1),
            (5, "k1", "update", "y", 1),
            (9, "k1", "update", "y", 2),
        ],
    )
    assert got == {
        ("k1", 1): ("x", 1, 5, False, 1),
        ("k1", 5): ("y", 1, 9, False, 2),
        ("k1", 9): ("y", 2, None, True, 3),
    }


def test_noop_update_is_suppressed(spark):
    """An attribute-identical non-delete event opens nothing; the run
    collapses into the version at its head."""
    got = _hist(
        spark,
        [
            (1, "k1", "insert", "x", 1),
            (5, "k1", "update", "x", 1),  # no-op
            (7, "k1", "update", "x", 1),  # no-op (vs suppressed predecessor)
            (9, "k1", "update", "z", 1),
        ],
    )
    assert got == {
        ("k1", 1): ("x", 1, 9, False, 1),
        ("k1", 9): ("z", 1, None, True, 2),
    }


def test_suppression_off_keeps_every_event(spark):
    got = _hist(
        spark,
        [(1, "k1", "insert", "x", 1), (5, "k1", "update", "x", 1)],
        suppress_unchanged=False,
    )
    assert got == {
        ("k1", 1): ("x", 1, 5, False, 1),
        ("k1", 5): ("x", 1, None, True, 2),
    }


def test_delete_closes_without_opening(spark):
    got = _hist(
        spark,
        [(1, "k1", "insert", "x", 1), (5, "k1", "delete", None, None)],
    )
    assert got == {("k1", 1): ("x", 1, 5, False, 1)}


def test_reinsert_after_delete_reopens_identical_attrs(spark):
    """delete → insert of the SAME attributes is a new version, never a
    suppressed no-op."""
    got = _hist(
        spark,
        [
            (1, "k1", "insert", "x", 1),
            (5, "k1", "delete", None, None),
            (9, "k1", "insert", "x", 1),
        ],
    )
    assert got == {
        ("k1", 1): ("x", 1, 5, False, 1),
        ("k1", 9): ("x", 1, None, True, 2),
    }


def test_double_and_leading_deletes_are_harmless(spark):
    got = _hist(
        spark,
        [
            (1, "k1", "delete", None, None),  # leading: nothing to close
            (3, "k1", "insert", "x", 1),
            (5, "k1", "delete", None, None),
            (7, "k1", "delete", None, None),  # double: still nothing open
        ],
    )
    assert got == {("k1", 3): ("x", 1, 5, False, 1)}


def test_null_attrs_compare_null_safely(spark):
    """NULL == NULL for suppression (IS NOT DISTINCT FROM), and a
    NULL→value change is a real version."""
    got = _hist(
        spark,
        [
            (1, "k1", "insert", None, 1),
            (3, "k1", "update", None, 1),  # no-op: null-safe equal
            (5, "k1", "update", "x", 1),
        ],
    )
    assert got == {
        ("k1", 1): (None, 1, 5, False, 1),
        ("k1", 5): ("x", 1, None, True, 2),
    }


def test_keys_are_independent(spark):
    got = _hist(
        spark,
        [
            (1, "k1", "insert", "x", 1),
            (2, "k2", "insert", "x", 1),
            (3, "k1", "update", "y", 1),
        ],
    )
    assert got[("k1", 1)] == ("x", 1, 3, False, 1)
    assert got[("k2", 2)] == ("x", 1, None, True, 1)


def test_input_order_invariance(spark):
    """The build orders by seq inside the window — shuffled arrival gives
    the identical history (the CDC late/out-of-order contract)."""
    rows = [
        (1, "k1", "insert", "x", 1),
        (5, "k1", "update", "x", 1),
        (9, "k1", "delete", None, None),
        (11, "k1", "insert", "x", 1),
        (2, "k2", "insert", "q", 7),
    ]
    assert _hist(spark, rows) == _hist(spark, list(reversed(rows)))


def test_as_of_reads_one_version_per_key(spark):
    df = spark.createDataFrame(
        [
            (1, "k1", "insert", "x", 1),
            (5, "k1", "update", "y", 1),
            (9, "k1", "delete", None, None),
        ],
        "seq long, k string, op string, a string, b long",
    )
    hist = scd2_history(df, keys=["k"], attrs=["a", "b"])
    assert [(r.a, r.version_num) for r in scd2_as_of(hist, 1).collect()] == [("x", 1)]
    assert [(r.a, r.version_num) for r in scd2_as_of(hist, 5).collect()] == [("y", 2)]
    # half-open: at the delete's seq the key is already gone
    assert scd2_as_of(hist, 9).count() == 0


def test_scd2_plan_single_exchange(spark, sf_dir):
    """lag + lead + row_number all share partitionBy(keys): ONE Exchange,
    no single-partition window, no Python."""
    from fao_elt_pipelines_spark.plans.queries import q_cdc_scd2_history

    plan = plan_of(q_cdc_scd2_history(spark, sf_dir))
    assert n_nodes(plan, "Exchange") == 1, plan
    assert "SinglePartition" not in plan, plan
    assert "Python" not in plan, plan


def test_registry_query_suppression_actually_fires(spark, sf_dir):
    """The coarse (lang, band) attrs exist precisely so suppression is
    exercised on real data — assert versions < non-delete events."""
    from fao_elt_pipelines_spark.plans.queries import (
        _derived_binlog,
        q_cdc_scd2_history,
    )

    n_events = _derived_binlog(spark, sf_dir).filter(F.col("op") != "delete").count()
    n_versions = q_cdc_scd2_history(spark, sf_dir).count()
    assert 0 < n_versions < n_events


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-q"]))
