"""Semantics + plan tests for the hypertable rollup cascade
(operators/rollup.py).

The load-bearing claim is LOSSLESSNESS: every cascade level must equal
the same aggregate computed directly from raw — i.e. coarsening
minute-rows into hours into days loses nothing. Asserted level-by-level
on the real events fixture, plus nesting validation and the
no-Window/no-cartesian plan shape.
"""

import pytest
from pyspark.sql import functions as F

from fao_elt_pipelines_spark.operators.rollup import rollup_cascade
from fao_elt_pipelines_spark.plans.queries import dec, load
from tests.plan_utils import n_nodes, plan_of

MEASURES = {
    "total_value": ("sum", None),  # column filled per-test (dec)
    "min_value": ("min", "value"),
    "max_value": ("max", "value"),
}


def _measures():
    m = dict(MEASURES)
    m["total_value"] = ("sum", dec("value"))
    return m


def _direct(ev, res):
    return (
        ev.groupBy(F.window("ts", res).alias("win"), "event_type")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(dec("value")).alias("total_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "cnt",
            F.col("total_value").cast("decimal(38,2)").alias("total_value"),
            "min_value",
            "max_value",
        )
    )


@pytest.fixture(scope="module")
def cascade(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return ev, rollup_cascade(
        ev,
        ts_col="ts",
        resolutions=["1 minute", "1 hour", "1 day"],
        group_cols=["event_type"],
        measures=_measures(),
    )


@pytest.mark.parametrize("res", ["1 minute", "1 hour", "1 day"])
def test_every_level_equals_direct_from_raw(cascade, res):
    ev, levels = cascade
    got = levels[res].select(
        "window_start", "window_end", "event_type", "cnt",
        F.col("total_value").cast("decimal(38,2)").alias("total_value"),
        "min_value", "max_value",
    )
    direct = _direct(ev, res)
    assert got.exceptAll(direct).isEmpty() and direct.exceptAll(got).isEmpty()


def test_non_nesting_resolutions_raise(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    with pytest.raises(ValueError, match="nest"):
        rollup_cascade(ev, "ts", ["7 minutes", "1 hour"])
    with pytest.raises(ValueError, match="fixed-length"):
        rollup_cascade(ev, "ts", ["1 month"])
    with pytest.raises(ValueError, match="sum|min|max"):
        rollup_cascade(ev, "ts", ["1 hour"], measures={"x": ("avg", "value")})


def test_plan_pure_hash_aggs(cascade):
    """Each level is hash aggregates over ONE lineage — no Window, no
    cartesian, no Python; the day level's plan carries exactly the three
    cascade aggregation exchanges (minute, hour, day)."""
    _, levels = cascade
    plan = plan_of(levels["1 day"])
    assert n_nodes(plan, "Window") == 0, plan
    assert n_nodes(plan, "CartesianProduct") == 0, plan
    assert n_nodes(plan, "Scan parquet") == 1, plan  # raw touched exactly once
    assert n_nodes(plan, "Exchange") == 3, plan


def test_count_only_cascade(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    levels = rollup_cascade(ev, "ts", ["1 hour", "1 day"])
    day = levels["1 day"].agg(F.sum("cnt")).collect()[0][0]
    assert day == ev.count()
