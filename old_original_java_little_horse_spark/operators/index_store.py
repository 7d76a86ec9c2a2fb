"""Incrementally-maintained id + alias index over the engine's output
(SURVEY §3.1/§3.3; reference `ResourceIndexProcessor.java:41-131`,
`ResourceByKeyProcessor.java:117-161`).

The engine — the only component that sees a run's old AND new state —
emits `kind='index'` changelog rows per micro-batch: CREATE for
aliases the batch added, DELETE for aliases it removed (the
reference's tag CREATE/DELETE entries on the repartition topic).  The
sink is append-only, so maintenance is O(changed runs) per batch;
the *current* index is the changelog compacted latest-op-wins —
exactly the RocksDB + changelog-topic pair the reference runs, in
Spark's native append + compact idiom (the S2 changelog-upsert
shape; in production the compaction is a Delta/Iceberg MERGE in
`foreachBatch` and reads are against the compacted table).

Scale notes: compaction shuffles once on (object_id, key) —
hash-partitioned, map-side combined via the max-seq window; the
posting-list rollup reuses the same exchange via a groupBy on a
prefix of the window key.  Nothing here rereads snapshots: the
changelog is radically smaller than the document stream (only alias
*churn* is recorded).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window
from pyspark.sql.types import StringType, StructField, StructType

_OP = StructType([
    StructField("op", StringType()),
    StructField("key", StringType()),
    StructField("value", StringType()),
])


def index_changelog(tagged: DataFrame) -> DataFrame:
    """(object_id, key, value, op, seq) rows from the tagged stream."""
    return (
        tagged.where(F.col("kind") == "index")
        .select(F.col("wf_run_id").alias("object_id"), "seq",
                F.from_json("payload", _OP).alias("p"))
        .select("object_id", F.col("p.op").alias("op"),
                F.col("p.key").alias("key"), F.col("p.value").alias("value"),
                "seq")
    )


def current_aliases(tagged: DataFrame) -> DataFrame:
    """Latest-op-wins compaction → live (object_id, key, value) rows.

    A triple's newest changelog entry decides: CREATE is live, DELETE
    is a tombstone.  The engine emits at most one op per triple per
    batch (it diffs sets) and `seq` strictly increases per folding
    invocation, so seq ordering is decisive; the op tie-break only
    matters for identical-seq rows from an at-least-once replay, and
    it prefers DELETE — the safe side (a dropped alias re-appears on
    the next CREATE; a resurrected one would serve deleted data).
    """
    w = Window.partitionBy("object_id", "key", "value").orderBy(
        F.col("seq").desc(), F.col("op").desc())
    return (
        index_changelog(tagged)
        .withColumn("_rn", F.row_number().over(w))
        .where((F.col("_rn") == 1) & (F.col("op") == "CREATE"))
        .select("object_id", "key", "value")
    )


def posting_lists(tagged: DataFrame) -> DataFrame:
    """(key, value) → posting list over the LIVE index — same output
    contract as `run_index.run_index`, but from the incremental
    changelog instead of a full snapshot recompute."""
    return current_aliases(tagged).groupBy("key", "value").agg(
        F.count(F.lit(1)).alias("n_entries"),
        F.concat_ws(",", F.sort_array(F.collect_list("object_id")))
         .alias("posting_list"),
    )


def search_live(tagged: DataFrame, key: str, value: str) -> DataFrame:
    """Index hit → run ids (the broadcast-join back to snapshots is
    the caller's choice of id store, as in `run_index.search`)."""
    return (
        current_aliases(tagged)
        .where((F.col("key") == key) & (F.col("value") == value))
        .select(F.col("object_id").alias("wf_run_id"))
    )
