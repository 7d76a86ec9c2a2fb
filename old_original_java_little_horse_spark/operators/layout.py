"""Data-layout operators: multi-dimensional clustering keys.

Z-ordering (Morton codes) is how lakehouse tables get data-skipping on
MORE THAN ONE column: interleaving the bits of two key columns makes
rows that are close in (x, y) space land in the same file/row-group,
so min/max pruning works for predicates on either column.  The engine
computes the code as a pure JVM-side bit expression (no UDF) and
reports the resulting file-level clustering; a writer would follow
with `repartitionByRange(zval).sortWithinPartitions(zval)` and let the
parquet footers carry the min/max stats.

The oracle is GENERATED from the same Python loop that builds the
Spark expression — bit-for-bit identical arithmetic on both engines,
so the hash gate verifies the interleave itself, not a summary.

Reference anchor: the reference engine tags every stored object with a
partition key (`WfRunIdModel.java` store keys) but has no
multi-dimensional layout; this extends the engine for the lakehouse
maintenance profile (BASELINE.json north star).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from ..registry import query
from ..sources.parquet import load_table

Z_BITS = 16          # bits per dimension (keys max-normalized onto 16 bits)
Z_FILE_SHIFT = 26    # file id = z >> 26  ⇒ 64 logical files for 32 bits


def _interleave_spark(x: Column, y: Column) -> Column:
    """Morton code: bit i of x → bit 2i+1, bit i of y → bit 2i."""
    z = F.lit(0).cast("long")
    for i in range(Z_BITS):
        z = (z
             .bitwiseOR(F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)),
                                    2 * i + 1))
             .bitwiseOR(F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)),
                                    2 * i)))
    return z


def _interleave_sql(x: str, y: str) -> str:
    """The same Morton interleave as a DuckDB SQL expression."""
    terms = []
    for i in range(Z_BITS):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i})")
    return " | ".join(terms)


_Z_ORACLE = f"""
WITH mx AS (
  SELECT MAX(l_partkey) AS mp, MAX(l_suppkey) AS ms FROM lineitem
), keyed AS (
  SELECT {_interleave_sql(f"(l_partkey * {(1 << Z_BITS) - 1} // mx.mp)",
                          f"(l_suppkey * {(1 << Z_BITS) - 1} // mx.ms)")} AS z
  FROM lineitem, mx
)
SELECT z >> {Z_FILE_SHIFT} AS file_id,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       MIN(z) AS z_min,
       MAX(z) AS z_max
FROM keyed GROUP BY 1
"""


@query("t_zorder_layout", oracle=_Z_ORACLE)
def t_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering of lineitem on (l_partkey,
    l_suppkey): every row's 32-bit interleaved code, rolled up to the
    64 logical files a `repartitionByRange(z)` writer would produce —
    per file the row count and the [z_min, z_max] footer stats that
    data skipping would prune against.

    Why an analytics engine ships this: a query filtering on EITHER
    part or supplier prunes ~sqrt-fraction of z-ordered files, where
    single-column sort layout prunes only its own column.  The Morton
    code is a chain of shiftleft/shiftright/AND/OR on longs — pure
    whole-stage-codegen arithmetic, no UDF, no shuffle for the code
    itself; the only exchange is the final rollup on file_id (64
    keys).  At 100 TB the identical expression feeds
    `repartitionByRange` + `sortWithinPartitions`, which adds the one
    range exchange any re-layout fundamentally requires.

    The oracle SQL is generated from the same loop that builds the
    Spark expression — the hash gate checks the interleave bit-for-bit
    across engines.
    """
    li = load_table(spark, sf_dir, "lineitem")
    top = (1 << Z_BITS) - 1
    # Each dimension is max-normalized onto the full 16-bit range with
    # exact integer arithmetic (x * 65535 // max_x) so every SF uses
    # the whole z space — the one-row max aggregate broadcasts.
    mx = li.agg(F.max("l_partkey").alias("mp"), F.max("l_suppkey").alias("ms"))
    z = _interleave_spark(
        F.expr(f"l_partkey * {top} div mp"),
        F.expr(f"l_suppkey * {top} div ms"))
    return (li.crossJoin(F.broadcast(mx)).select(z.alias("z"))
            .groupBy(F.shiftright("z", Z_FILE_SHIFT).alias("file_id"))
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.min("z").alias("z_min"),
                 F.max("z").alias("z_max")))
