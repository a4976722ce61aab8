"""Driver entry-point smoke: ``entry(spark)`` runs and returns rows.

The full queries()-vs-oracle_sql() differential sweep lives in
tests/test_oracle.py.
"""

from __future__ import annotations

import __spark_entry__ as entry_mod


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert len(df.columns) >= 4
