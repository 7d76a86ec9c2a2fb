"""Registry-wide output-type contract gate.

Round 5's only red driver rows were six queries whose VALUES matched
DuckDB bit-for-bit but whose output surface carried Spark DECIMAL or
DuckDB HUGEINT columns — types the driver's hash path serializes
differently than BIGINT.  The repo convention (money/ratio channels
as `*_cents` / `*_e6` BIGINT fixed-point) makes the hash immune to
engine-specific numeric serialization; this gate makes the
convention structural: every registered query must declare ONLY
{BIGINT, INTEGER, VARCHAR, BOOLEAN} columns on BOTH engines.

The oracle side is checked with `DESCRIBE` (no execution); the Spark
side from the unexecuted plan schema.  Streaming replays (whose fn()
runs a full pipeline on build) are checked on their materialized
result schema by `tools/vanilla_drive.py` via
`oracle_compare.compare`'s `type_violations` field instead.
"""

from __future__ import annotations

import pytest

from .conftest import SF_SMOKE
from .oracle_compare import (
    DUCKDB_ALLOWED_TYPES,
    SPARK_ALLOWED_TYPES_DOC,
    duckdb_conn,
    oracle_type_violations,
    spark_type_violations,
)


def _registry():
    from old_original_java_little_horse_spark.registry import all_queries

    return all_queries()


def test_every_oracle_declares_only_hashable_types():
    con = duckdb_conn(SF_SMOKE)
    bad = {}
    for name, spec in _registry().items():
        if spec.oracle is None:
            continue
        v = oracle_type_violations(con, spec.oracle, name)
        if v:
            bad[name] = v
    assert not bad, (
        f"oracle columns outside {sorted(DUCKDB_ALLOWED_TYPES)} "
        f"(DECIMAL/HUGEINT/DOUBLE hash differently on the driver): {bad}")


# Building a streaming query's DataFrame executes the whole replay
# pipeline; their runtime schemas are enforced by vanilla_drive.
_SKIP_BUILD_PREFIXES = ("stream_",)


@pytest.mark.parametrize(
    "name", sorted(n for n in _registry()
                   if not n.startswith(_SKIP_BUILD_PREFIXES)))
def test_spark_schema_declares_only_hashable_types(spark, name):
    spec = _registry()[name]
    v = spark_type_violations(spec.fn(spark, SF_SMOKE), name)
    assert not v, (
        f"{name} declares Spark columns outside {SPARK_ALLOWED_TYPES_DOC} "
        f"— use *_cents / *_e6 BIGINT fixed-point: {v}")
