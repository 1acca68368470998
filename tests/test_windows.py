"""Twin-tie: the tumbling-window query is the slide=size special case of
the sliding-window operator.

This equivalence is what licenses parking ``windowed_event_counts`` in the
registry's rotation tail (plans/registry.py): a driver-green row for
``sliding_window_counts`` exercises the same ``F.window`` event-time
assignment path, and this test pins the degenerate-slide identity so the
two can never drift apart silently.
"""

from pyspark.sql import functions as F

from fao_elt_pipelines_spark.plans.queries import (
    dsum,
    load,
    q_windowed_event_counts,
)


def test_tumbling_is_sliding_with_slide_eq_size(spark, sf_dir):
    tumbling = q_windowed_event_counts(spark, sf_dir)
    ev = load(spark, sf_dir, "events")
    w = F.window("ts", "1 hour", "1 hour")  # the sliding operator, slide=size
    sliding = (
        ev.groupBy(w.alias("win"), "event_type")
        .agg(F.count("*").alias("events"), dsum("value").alias("total_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "events",
            "total_value",
        )
    )
    key = ["window_start", "window_end", "event_type"]
    a = sorted(tumbling.collect(), key=lambda r: tuple(str(r[k]) for k in key))
    b = sorted(sliding.collect(), key=lambda r: tuple(str(r[k]) for k in key))
    assert a == b
    assert len(a) > 0
