"""Parquet source for the driver's synthetic tables (TESTDATA.md).

Spark-first notes: ``spark.read.parquet`` gives predicate pushdown,
column pruning and partition pruning for free — callers should select
columns *before* heavy ops so the scan's ReadSchema shrinks (verified
in tests via ``plans.explain_str``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    if name == "events":
        # events.ts has been written as TIMESTAMP(NANOS) in some testdata
        # generations, which Spark has no type for — read it as a
        # nanos-since-epoch long and convert (integer div, not fp: 1.7e18 ns
        # > 2^53).  Set at runtime so the loader also works under a
        # caller-built vanilla SparkSession.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # Testdata writes micros TIMESTAMP_NTZ (events.ts, o_orderdate,
    # l_shipdate, ...).  The session is pinned to UTC (session.py), so
    # NTZ -> TIMESTAMP is value-preserving; downstream ops
    # (unix_micros, windows, watermarks) require the zoned type.
    for f in df.schema.fields:
        if isinstance(f.dataType, TimestampNTZType):
            df = df.withColumn(f.name, F.col(f.name).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` parity
    queries can reference them by name."""
    for t, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(t)
