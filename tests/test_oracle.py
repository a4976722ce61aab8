"""Full-surface differential sweep: EVERY ``queries()`` entry replayed
against its ``oracle_sql()`` DuckDB oracle at sf0.001, inside pytest.

This is the reference's whole test philosophy — rebuild-and-compare —
applied to the entire oracle surface on every test run: the driver's
per-round harness checks a rotating ~50-entry prefix of the same pairs
at sf0.01, so this sweep makes that rotation redundancy rather than the
only full-surface correctness gate. A new operator is NOT done until it
has a ``queries()`` entry, an ``oracle_sql()`` entry, and this sweep is
green.

Marked ``oracle`` so it can be deselected (``-m 'not oracle'``) when
iterating on a single operator; the default run always includes it.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from tests.conftest import assert_df_equals_sql

QUERY_NAMES = sorted(entry_mod.queries().keys())


@pytest.mark.oracle
@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_vs_oracle(spark, sf_dir, oracle, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql().get(name)
    df = q(spark, sf_dir)
    if sql is None:
        # non-SQL-expressible ops get the driver's weaker rows-only check
        assert df.count() >= 0
        return
    assert_df_equals_sql(df, oracle, sql)


def test_every_query_has_an_oracle_or_is_whitelisted():
    """Every queries() entry must carry an oracle_sql() entry; genuinely
    non-SQL-expressible ops must be explicitly whitelisted here, so a
    forgotten oracle is a test failure rather than a silent weak check."""
    non_sql_ok: set[str] = set()  # currently every entry has an oracle
    missing = set(entry_mod.queries()) - set(entry_mod.oracle_sql()) - non_sql_ok
    assert not missing, f"queries() entries without an oracle: {sorted(missing)}"
    orphans = set(entry_mod.oracle_sql()) - set(entry_mod.queries())
    assert not orphans, f"oracle_sql() entries without a query: {sorted(orphans)}"
