"""Training-shard export sink: the terminal write of a curation
pipeline — cleaned, chunked, split-assigned text written as
hive-partitioned parquet shards ready for a training dataloader.

The sink counterpart of the engine's Kafka/snapshot sinks (SURVEY
§2.1 S4/S5) for the corpus side of the house.

Scale design:
- `repartition(split, bucket_group)` BEFORE `partitionBy(split)`: a
  naive `df.write.partitionBy` makes every task write a file into
  every partition directory — tasks × partitions small files at
  100 TB.  Repartitioning on the partition key first means each task
  owns whole output directories; the extra `bucket_group` term in the
  key spreads one split across many tasks (a split is ~80% of the
  corpus — one task writing it would serialize the job).
- `maxRecordsPerFile` bounds shard size so the dataloader gets
  uniform units regardless of executor count.
- `sortWithinPartitions(doc_id, chunk_idx)` makes shard contents
  deterministic run-to-run (same rows → same files), which makes the
  export reproducible and diffable — and groups a document's chunks
  for better parquet compression.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..functions.corpus import t_doc_chunks, t_hash_split, t_pii_redact

N_BUCKET_GROUPS = 8  # writer-parallelism per split; raise with cluster size


def curated_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The export pipeline: redact PII → chunk → attach split.

    Composes the registered operators (each independently
    oracle-checked) rather than re-deriving the transforms; the joins
    are all on doc_id and collapse into one key family.
    """
    clean = t_pii_redact(spark, sf_dir).select("doc_id", "clean_text")
    chunks = t_doc_chunks(spark, sf_dir).select("doc_id", "chunk_idx", "n_tokens")
    split = t_hash_split(spark, sf_dir).select("doc_id", "bucket", "split")
    # Chunk the *redacted* text: re-chunk clean_text with the same
    # word-window as t_doc_chunks, but reuse its chunk index/token
    # accounting to stay consistent with the registered operator.
    from ..functions.corpus import CHUNK_SIZE, CHUNK_STRIDE
    from ..functions.text import words_col

    w = words_col(F.col("clean_text"))
    rechunk = (clean
               .select("doc_id", w.alias("w"),
                       F.explode(F.sequence(F.lit(0), F.size(w) - 1,
                                            F.lit(CHUNK_STRIDE))).alias("start"))
               .select("doc_id",
                       (F.col("start") / CHUNK_STRIDE).cast("long").alias("chunk_idx"),
                       F.concat_ws(" ", F.slice(F.col("w"), F.col("start") + 1,
                                                CHUNK_SIZE)).alias("chunk_text")))
    return (rechunk
            .join(chunks, ["doc_id", "chunk_idx"])
            .join(split, "doc_id")
            .select("doc_id", "chunk_idx", "chunk_text", "n_tokens",
                    "bucket", "split"))


def export_training_shards(df: DataFrame, out_dir: str,
                           max_records_per_file: int = 100_000) -> None:
    """Write (doc_id, chunk_idx, chunk_text, n_tokens, bucket, split)
    as parquet partitioned by split — see module docstring for why
    the repartition/sort comes first."""
    (df.withColumn("_bg", F.pmod(F.col("doc_id"), F.lit(N_BUCKET_GROUPS)))
       .repartition("split", "_bg")
       .sortWithinPartitions("doc_id", "chunk_idx")
       .drop("_bg")
       .write.partitionBy("split")
       .option("maxRecordsPerFile", max_records_per_file)
       .mode("overwrite")
       .parquet(out_dir))


def export_corpus(spark: SparkSession, sf_dir: str, out_dir: str,
                  max_records_per_file: int = 100_000) -> None:
    """End-to-end: documents at `sf_dir` → curated shards at `out_dir`."""
    export_training_shards(curated_chunks(spark, sf_dir), out_dir,
                           max_records_per_file)
