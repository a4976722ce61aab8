"""Replicates the driver's harness: every queries() entry vs its oracle_sql()."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from tests.conftest import assert_df_equals_sql

QUERY_NAMES = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_vs_oracle(spark, sf_dir, oracle, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql().get(name)
    df = q(spark, sf_dir)
    if sql is None:
        assert df.count() >= 0  # rows-only check for non-SQL-expressible ops
        return
    assert_df_equals_sql(df, oracle, sql)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert len(df.columns) >= 4
