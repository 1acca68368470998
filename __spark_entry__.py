"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (CDC MERGE upsert) at sf0.001.
``queries()`` — one entry per implemented operator from SURVEY.md §2,
backed by fao_elt_pipelines_spark.plans.queries.
``oracle_sql()`` — matching DuckDB SQL; omitted entries (non-SQL ops) get
the driver's weaker rows-only check.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from fao_elt_pipelines_spark.plans.registry import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the CDC MERGE-upsert pipeline at sf0.001."""
    fn, _ = REGISTRY["cdc_merge_upsert"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec[0] for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    # a registry oracle may be a zero-arg CALLABLE generating its SQL
    # lazily (ann_kmeans_topk trains its centroid literals at resolve
    # time); a callable returning None degrades to the rows-only check
    out: dict[str, str] = {}
    for name, spec in REGISTRY.items():
        sql = spec[1]
        if callable(sql):
            sql = sql()
        if sql is not None:
            out[name] = sql
    return out
