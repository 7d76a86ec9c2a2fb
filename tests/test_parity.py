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


def test_fold_and_catalyst_comparators_agree(spark):
    """The fold's pure-Python comparator semantics and the Catalyst
    expression builder must agree case by case (the engine's edge
    conditions vs the batch-parity SQL surface)."""
    import pyspark.sql.functions as F

    from old_original_java_little_horse_spark.engine.fold import (
        VarSubError, evaluate_condition,
    )
    from old_original_java_little_horse_spark.functions.expressions import comparator

    cases = [
        (3, "LESS_THAN", 5), (5, "LESS_THAN", 3), (3, "LESS_THAN_EQ", 3),
        (7, "GREATER_THAN", 2), (2, "GREATER_THAN_EQ", 2),
        ("a", "EQUALS", "a"), ("a", "EQUALS", "b"),
        ("a", "NOT_EQUALS", "b"), (None, "EQUALS", "a"), (None, "NOT_EQUALS", "a"),
        (2, "IN", [1, 2, 3]), (9, "IN", [1, 2, 3]), (9, "NOT_IN", [1, 2, 3]),
        (1.5, "LESS_THAN", 2), (2.5, "GREATER_THAN", 2),
    ]
    spec = {"thread_specs": {"t": {"variable_defs": {}}}}
    thread = {"id": 0, "thread_spec_name": "t", "variables": {},
              "parent_thread_id": None}
    state = {"id": "r", "wf_spec_id": "s", "wf_spec_name": "s",
             "thread_runs": [thread]}
    for lhs, op, rhs in cases:
        cond = {"left_side": {"literal_value": lhs},
                "comparator": op,
                "right_side": {"literal_value": rhs}}
        if lhs is None:
            # literal None isn't assignable in the fold; evaluate the
            # python semantics directly with a null-producing default.
            py = False if op in ("EQUALS", "NOT_EQUALS") else None
            try:
                py = evaluate_condition(
                    thread, state, spec,
                    {"left_side": {"literal_value": None, "default_value": None},
                     "comparator": op, "right_side": {"literal_value": rhs}},
                )
            except VarSubError:
                py = False if op in ("EQUALS", "NOT_EQUALS") else py
        else:
            py = evaluate_condition(thread, state, spec, cond)
        rhs_col = (F.array(*[F.lit(x) for x in rhs])
                   if isinstance(rhs, list) else F.lit(rhs))
        sql = spark.range(1).select(
            comparator(F.lit(lhs), op, rhs_col).alias("v")).collect()[0]["v"]
        assert bool(py) == bool(sql), (lhs, op, rhs, py, sql)
