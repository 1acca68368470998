"""Shared physical-plan inspection helpers for plan-audit tests."""

import re


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def n_nodes(plan: str, op: str) -> int:
    """Count physical operators via their detail headers '(k) Op' (the tree
    rendering would double-count)."""
    return len(re.findall(rf"\(\d+\) {op}\b", plan))
