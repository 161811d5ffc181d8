"""Replica of the driver's correctness gate: every queries() entry runs at
sf0.001 and matches its oracle_sql() under DuckDB (row count + columns +
order-insensitive values)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as E  # noqa: E402
from duck_harness import compare, duck_con  # noqa: E402

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(not os.path.isdir(SF), reason="testdata missing")


@pytest.fixture(scope="module")
def con():
    return duck_con(SF)


def test_all_oracle_keys_have_queries():
    qs, osql = E.queries(), E.oracle_sql()
    assert set(osql) <= set(qs)


@pytest.mark.parametrize("name", sorted(E.queries().keys()))
def test_query_matches_oracle(spark, con, name):
    fn = E.queries()[name]
    df = fn(spark, SF)
    sql = E.oracle_sql().get(name)
    if sql is None:
        assert df.count() >= 0  # rows-only contract
        return
    problems = compare(name, df, sql, con)
    assert not problems, problems[:3]


def test_entry_smoke(spark):
    df = E.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"subj", "pred", "obj"}
