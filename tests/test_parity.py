"""Every registered parity query must hash-match its DuckDB oracle at
sf0.001 (fast local gate; the driver re-checks at sf0.01)."""

from __future__ import annotations

import pytest

from old_original_java_little_horse_spark.registry import all_queries

from .conftest import SF_SMOKE
from .oracle_compare import compare

SPECS = all_queries()
WITH_ORACLE = sorted(n for n, s in SPECS.items() if s.oracle)
ROWS_ONLY = sorted(n for n, s in SPECS.items() if not s.oracle)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(spark, name):
    res = compare(spark, SF_SMOKE, name, SPECS[name])
    assert res["ok"], res


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, name):
    df = SPECS[name].fn(spark, SF_SMOKE)
    assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert all(n in entry_mod.oracle_sql() or n in entry_mod.queries() for n in entry_mod.queries())
