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


def timed_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events with a non-NULL timestamp — the TIME-ORDERED operator
    contract (COVERAGE.md parity-divergence ledger #6).

    Every operator whose semantics ride on `ts` (session gaps, as-of
    matches, interval joins, tumbling/sliding/range windows, date
    spines, path order, recency) consumes THIS loader, and its DuckDB
    oracle states the same `ts IS NOT NULL` — because the two engines
    place NULLs on OPPOSITE ends of an ascending sort by default
    (Spark NULLS FIRST, DuckDB NULLS LAST) and a session or as-of
    match at a NULL instant has no defined meaning in either.  On the
    streaming side NULL event times are not structurally dropped
    either (a NULL window can never be closed by a watermark — it
    would sit in state forever — and dropDuplicatesWithinWatermark
    passes NULL-ts rows through, measured r12), so the twins filter
    before watermarking.  Operators that don't read `ts` (sketches,
    projections, id scans) keep consuming `load_table` — an
    untimestamped event still counts there."""
    from pyspark.sql import functions as F

    return load_table(spark, sf_dir, "events").where(F.col("ts").isNotNull())


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` parity
    queries can reference them by name."""
    for t, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(t)
