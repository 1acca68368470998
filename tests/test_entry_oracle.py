"""Differential test of every queries() entry against its oracle_sql() at
sf0.01 — the exact check the driver performs, run locally first."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from tests.conftest import SF_DIR_ORACLE as SF_DIR  # noqa: E402
from tests.oracle_utils import compare, duck_connect  # noqa: E402


@pytest.fixture(scope="module")
def duck():
    con = duck_connect(SF_DIR)
    yield con
    con.close()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_query_matches_oracle(spark, duck, name):
    fn = entrymod.queries()[name]
    sql = entrymod.oracle_sql().get(name)
    df = fn(spark, SF_DIR)
    if sql is None:
        assert df.count() >= 0  # rows-only check (non-SQL-expressible op)
        return
    issues = compare(df, duck, sql)
    assert not issues, f"{name}: {issues}"
