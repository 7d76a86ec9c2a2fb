"""Compacted serving tables for point GETs and index search.

The reference serves every GET from a materialized RocksDB store
(`J/api/util/APIStreamsContext.java:62-83` — `store.get(objectId)`),
maintained continuously by the streams topology.  The Spark engine's
raw output is an append-only tagged changelog; re-scanning + windowing
it per request (the previous `cli._snapshots` path) is O(history) per
GET — fine for replay verification, wrong for a serving layer.

This module is the RocksDB equivalent in Spark's storage idiom: a
**bucket-partitioned, latest-wins compacted parquet store**, upserted
incrementally from each micro-batch inside the continuous query's
`foreachBatch`:

- The store is hive-partitioned on `bucket = pmod(xxhash64(key), N)`.
- Per batch, only the buckets containing *changed* keys are rewritten:
  read those partitions, merge latest-wins against the batch's rows,
  overwrite those partitions (dynamic partition overwrite).  Work per
  batch is O(changed buckets), never O(store) — the same property as
  a RocksDB write or a Delta MERGE (which is what you'd use for the
  store format on a production cluster; plain parquet keeps the
  sandbox dependency-free and the partition-overwrite is the same
  motion Delta's MERGE performs under the hood).
- A point GET reads exactly one bucket directory (partition pruning on
  the bucket literal), independent of run-count; an index search reads
  one bucket of the alias store keyed by (key, value).

Two stores, same motion:

- **snapshots**: one row per wf_run_id — (wf_run_id, status, seq,
  state_json), latest `seq` wins (S5's monotonic per-key version).
- **aliases**: one row per (object_id, key, value) changelog triple —
  latest op wins; DELETE rows are retained as tombstones so an older
  CREATE replayed later can never resurrect a dropped alias
  (`ResourceIndexProcessor.java:41-131` compaction semantics), and
  filtered out at read time.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..operators.index_store import index_changelog

N_BUCKETS = 16  # serving-store fanout; raise with key cardinality


def _bucket(col) -> F.Column:
    return F.pmod(F.xxhash64(col), F.lit(N_BUCKETS)).cast("int")


def _upsert(batch: DataFrame, store_dir: str, key_cols: list[str],
            bucket_on: str, order_cols: list) -> None:
    """Partition-pruned latest-wins merge of `batch` into `store_dir`.

    Reads ONLY the bucket partitions the batch touches, unions them
    with the batch, keeps the first row per key under `order_cols`,
    and overwrites just those partitions.  `foreachBatch` invocations
    are serial per query, so there is no concurrent writer per store.
    """
    spark = batch.sparkSession
    batch = batch.withColumn("bucket", _bucket(F.col(bucket_on)))
    touched = [r["bucket"] for r in batch.select("bucket").distinct().collect()]
    if not touched:
        return
    merged = batch
    if os.path.isdir(store_dir):
        try:
            existing = (spark.read.parquet(store_dir)
                        .where(F.col("bucket").isin(touched)))
            merged = batch.unionByName(existing)
        except Exception:
            pass  # first batch: store not created yet
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    compacted = (merged.withColumn("_rn", F.row_number().over(w))
                 .where(F.col("_rn") == 1).drop("_rn"))
    with _dynamic_overwrite(spark):
        # One shuffle partition per bucket: each task owns whole bucket
        # directories (one output file per bucket), and writes
        # parallelize across buckets as the store grows.
        (compacted.repartition(len(touched), "bucket")
         .write.mode("overwrite").partitionBy("bucket")
         .parquet(store_dir))


class _dynamic_overwrite:
    """Scoped `partitionOverwriteMode=dynamic`: overwrite replaces only
    the partitions present in the written data, not the whole store."""

    KEY = "spark.sql.sources.partitionOverwriteMode"

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def __enter__(self):
        self.old = self.spark.conf.get(self.KEY, None)
        self.spark.conf.set(self.KEY, "dynamic")

    def __exit__(self, *exc):
        if self.old is None:
            self.spark.conf.unset(self.KEY)
        else:
            self.spark.conf.set(self.KEY, self.old)


# --------------------------------------------------------------------------
# per-batch maintenance (called from the continuous query's foreachBatch)
# --------------------------------------------------------------------------

def snapshots_dir(serving_dir: str) -> str:
    return os.path.join(serving_dir, "snapshots")


def aliases_dir(serving_dir: str) -> str:
    return os.path.join(serving_dir, "aliases")


def upsert_serving_stores(batch_df: DataFrame, serving_dir: str) -> None:
    """Maintain both compacted stores from one tagged micro-batch."""
    snaps = (batch_df.where(F.col("kind") == "snapshot")
             .select("wf_run_id", "status", "seq",
                     F.col("payload").alias("state_json")))
    if not snaps.isEmpty():
        _upsert(snaps, snapshots_dir(serving_dir),
                key_cols=["wf_run_id"], bucket_on="wf_run_id",
                order_cols=[F.col("seq").desc_nulls_last()])
    idx = index_changelog(batch_df).withColumn(
        "kv", F.concat_ws("\x1f", "key", "value"))
    if not idx.isEmpty():
        _upsert(idx, aliases_dir(serving_dir),
                key_cols=["object_id", "key", "value"], bucket_on="kv",
                order_cols=[F.col("seq").desc_nulls_last(), F.col("op").desc()])


# --------------------------------------------------------------------------
# serving reads (each touches exactly one bucket partition)
# --------------------------------------------------------------------------

def read_snapshot(spark: SparkSession, serving_dir: str,
                  run_id: str) -> DataFrame:
    """Point lookup: one bucket directory, then the exact key."""
    return (spark.read.parquet(snapshots_dir(serving_dir))
            .where((F.col("bucket") == _bucket(F.lit(run_id)))
                   & (F.col("wf_run_id") == run_id))
            .select("wf_run_id", "status", "state_json"))


def read_all_snapshots(spark: SparkSession, serving_dir: str) -> DataFrame:
    """Full compacted table — one row per run, no windowing needed."""
    return (spark.read.parquet(snapshots_dir(serving_dir))
            .select("wf_run_id", "status", "state_json"))


def search_aliases(spark: SparkSession, serving_dir: str,
                   key: str, value: str) -> DataFrame:
    """(key, value) → live object ids; one bucket read, tombstones
    filtered."""
    kv = key + "\x1f" + value
    return (spark.read.parquet(aliases_dir(serving_dir))
            .where((F.col("bucket") == _bucket(F.lit(kv)))
                   & (F.col("key") == key) & (F.col("value") == value)
                   & (F.col("op") == "CREATE"))
            .select(F.col("object_id").alias("wf_run_id")))
