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
  N is fixed at store creation (persisted in a `.nbuckets` marker so
  readers and later writers keep hashing consistently) and should be
  sized to key cardinality: per-batch write work is
  O(touched_buckets / N × store_size), so keep N well above the
  typical batch's distinct-key count and the touched fraction stays
  small.  With N at or below batch key count every batch rewrites
  ~the whole store — on a production cluster you would either raise N
  (it only costs directories) or switch the same motion to Delta
  MERGE / per-batch delta files + periodic compaction.  Plain parquet
  + dynamic partition overwrite keeps the sandbox dependency-free and
  is the identical physical motion Delta's MERGE performs under the
  hood.
- Per batch, only the buckets containing *changed* keys are rewritten:
  read those partitions, merge latest-wins against the batch's rows,
  overwrite those partitions (dynamic partition overwrite).
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

# Default serving-store fanout; raise with key cardinality (see module
# docstring — write cost scales with the touched-bucket fraction).
N_BUCKETS = int(os.environ.get("LH_SPARK_SERVING_BUCKETS", "16"))

# Fanout of stores written before the marker existed (the old
# hard-coded constant).  A populated store with no marker was hashed
# with THIS N — never with the env-configured current default.
_LEGACY_N_BUCKETS = 16

_NBUCKETS_MARKER = ".nbuckets"


def _store_nbuckets(store_dir: str, create_with: int | None = None) -> int:
    """Bucket count pinned at store creation.

    The hash→bucket mapping must never change under an existing store
    (old rows would land in the wrong partition for pruning), so the
    creation-time N is persisted in a marker file and always wins over
    the current default.  Two recovery rules keep that invariant under
    upgrades: a POPULATED store with no marker predates the marker and
    is stamped with the legacy constant its rows were hashed with (not
    the env default, which may have changed); a marker that exists but
    cannot be parsed is an integrity error and raises — silently
    re-stamping it could re-bucket a live store.
    """
    marker = os.path.join(store_dir, _NBUCKETS_MARKER)
    try:
        with open(marker) as f:
            return int(f.read().strip())
    except OSError:
        pass  # no marker yet — creation or pre-marker store, below
    except ValueError:
        raise RuntimeError(
            f"corrupt {_NBUCKETS_MARKER} in {store_dir}: refusing to "
            "guess the bucket fanout of an existing store") from None
    if _has_parquet(store_dir):
        n = _LEGACY_N_BUCKETS
    else:
        n = create_with if create_with is not None else N_BUCKETS
    if create_with is not None:
        os.makedirs(store_dir, exist_ok=True)
        with open(marker, "w") as f:
            f.write(str(n))
    return n


def _bucket(col, n_buckets: int) -> F.Column:
    return F.pmod(F.xxhash64(col), F.lit(n_buckets)).cast("int")


def _has_parquet(store_dir: str) -> bool:
    """True iff the store directory holds committed parquet data.

    Skips `_temporary`/hidden directories, so files left by an
    interrupted write don't count as committed data."""
    for root, dirs, files in os.walk(store_dir):
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        if any(f.endswith(".parquet") for f in files):
            return True
    return False


def _upsert(batch: DataFrame, store_dir: str, key_cols: list[str],
            bucket_on: str, order_cols: list,
            n_buckets: int | None = None) -> None:
    """Partition-pruned latest-wins merge of `batch` into `store_dir`.

    Reads ONLY the bucket partitions the batch touches, unions them
    with the batch, keeps the first row per key under `order_cols`,
    and overwrites just those partitions.  `foreachBatch` invocations
    are serial per query, so there is no concurrent writer per store.
    """
    spark = batch.sparkSession
    n = _store_nbuckets(store_dir, create_with=n_buckets or N_BUCKETS)
    batch = batch.withColumn("bucket", _bucket(F.col(bucket_on), n))
    touched = [r["bucket"] for r in batch.select("bucket").distinct().collect()]
    if not touched:
        return
    merged = batch
    # Merge against existing data only when the store genuinely has
    # committed parquet; any OTHER read failure (corrupt footer, FS
    # hiccup, schema drift) must propagate so foreachBatch retries the
    # micro-batch instead of committing a lossy batch-only overwrite
    # that would silently drop every previously-stored key in the
    # touched buckets.
    if _has_parquet(store_dir):
        existing = (spark.read.parquet(store_dir)
                    .where(F.col("bucket").isin(touched)))
        merged = batch.unionByName(existing)
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


def upsert_serving_stores(batch_df: DataFrame, serving_dir: str,
                          n_buckets: int | None = None) -> None:
    """Maintain both compacted stores from one tagged micro-batch.

    `n_buckets` applies only when a store is first created; existing
    stores keep their creation-time fanout (see `_store_nbuckets`).
    """
    snaps = (batch_df.where(F.col("kind") == "snapshot")
             .select("wf_run_id", "status", "seq",
                     F.col("payload").alias("state_json")))
    if not snaps.isEmpty():
        _upsert(snaps, snapshots_dir(serving_dir),
                key_cols=["wf_run_id"], bucket_on="wf_run_id",
                order_cols=[F.col("seq").desc_nulls_last()],
                n_buckets=n_buckets)
    idx = index_changelog(batch_df).withColumn(
        "kv", F.concat_ws("\x1f", "key", "value"))
    if not idx.isEmpty():
        _upsert(idx, aliases_dir(serving_dir),
                key_cols=["object_id", "key", "value"], bucket_on="kv",
                order_cols=[F.col("seq").desc_nulls_last(), F.col("op").desc()],
                n_buckets=n_buckets)


# --------------------------------------------------------------------------
# serving reads (each touches exactly one bucket partition)
# --------------------------------------------------------------------------

def has_snapshots(serving_dir: str) -> bool:
    """True iff this engine has ever folded a run (store exists).

    Callers use this to distinguish 'no store yet' (skip quietly) from
    a real read failure on an existing store (must surface as an
    error, not an empty result)."""
    return _has_parquet(snapshots_dir(serving_dir))


def has_aliases(serving_dir: str) -> bool:
    return _has_parquet(aliases_dir(serving_dir))


def read_snapshot(spark: SparkSession, serving_dir: str,
                  run_id: str) -> DataFrame:
    """Point lookup: one bucket directory, then the exact key."""
    sdir = snapshots_dir(serving_dir)
    n = _store_nbuckets(sdir)
    return (spark.read.parquet(sdir)
            .where((F.col("bucket") == _bucket(F.lit(run_id), n))
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
    adir = aliases_dir(serving_dir)
    n = _store_nbuckets(adir)
    return (spark.read.parquet(adir)
            .where((F.col("bucket") == _bucket(F.lit(kv), n))
                   & (F.col("key") == key) & (F.col("value") == value)
                   & (F.col("op") == "CREATE"))
            .select(F.col("object_id").alias("wf_run_id")))
