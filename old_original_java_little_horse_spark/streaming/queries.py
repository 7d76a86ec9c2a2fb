"""Streaming-engine parity query: the applyInPandasWithState engine
run end-to-end (availableNow) and hash-checked against the same SQL
oracle as the batch fold — streaming == batch == closed form.
"""

from __future__ import annotations

import shutil
import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..engine.batch_queries import (
    _ORACLE_AGG, _wf_events_from_users, pipeline_executor, pipeline_spec,
)
from ..registry import query
from .engine import run_streaming_availablenow


@query(
    "engine_streaming_fold",
    oracle=_ORACLE_AGG + """
SELECT 'user-' || CAST(user_id AS VARCHAR) AS wf_run_id,
       'COMPLETED' AS status,
       CAST(n_purch * 2 + n_click + 7 AS BIGINT) AS score,
       CASE WHEN n_click > n_purch THEN 'clicky' ELSE 'buyy' END AS tier
FROM agg
""",
)
def engine_streaming_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full Structured Streaming engine (state store, micro-batch,
    foreachBatch sink) over the per-user pipeline; the oracle is the
    workflow's closed form.  Proves streaming == batch == SQL."""
    workdir = tempfile.mkdtemp(prefix="engine-stream-q-")
    events_dir = f"{workdir}/events"
    _wf_events_from_users(spark, sf_dir).write.parquet(events_dir)
    tagged = run_streaming_availablenow(
        spark, events_dir, pipeline_spec(),
        checkpoint_dir=f"{workdir}/ckpt",
        output_dir=f"{workdir}/out",
        executor=pipeline_executor,
    )
    out = tagged.where(F.col("kind") == "snapshot").select(
        "wf_run_id", "status",
        F.get_json_object("payload", "$.thread_runs[0].variables.score")
         .cast("bigint").alias("score"),
        F.get_json_object("payload", "$.thread_runs[0].variables.tier").alias("tier"),
    )
    # Materialize before the temp dirs are removed.
    rows = out.collect()
    shutil.rmtree(workdir, ignore_errors=True)
    return spark.createDataFrame(rows, out.schema)


@query(
    "engine_index_incremental",
    oracle="""
WITH agg AS (
  SELECT user_id,
         COUNT(*) FILTER (event_type = 'purchase') AS n_purch,
         COUNT(*) FILTER (event_type = 'click')    AS n_click
  FROM events GROUP BY user_id
), tiers AS (
  SELECT 'user-' || CAST(user_id AS VARCHAR) AS run_id,
         CASE WHEN n_click > n_purch THEN 'clicky' ELSE 'buyy' END AS tier
  FROM agg
)
SELECT 'tier' AS key, tier AS value,
       COUNT(*) AS n_entries,
       STRING_AGG(run_id, ',' ORDER BY run_id) AS posting_list
FROM tiers GROUP BY tier
UNION ALL
SELECT 'name', run_id, 1, run_id FROM tiers
""",
)
def engine_index_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Posting lists built ONLY from the engine's incremental index
    changelog (kind='index' CREATE/DELETE rows, compacted latest-op-
    wins) — never from snapshot recompute.  Hash-matching the same
    oracle as `engine_run_index` proves incremental == recompute ==
    closed form (ResourceIndexProcessor.java:41-131 parity)."""
    from ..operators.index_store import posting_lists

    workdir = tempfile.mkdtemp(prefix="engine-idx-q-")
    events_dir = f"{workdir}/events"
    _wf_events_from_users(spark, sf_dir).write.parquet(events_dir)
    tagged = run_streaming_availablenow(
        spark, events_dir, pipeline_spec(),
        checkpoint_dir=f"{workdir}/ckpt",
        output_dir=f"{workdir}/out",
        executor=pipeline_executor,
    )
    out = posting_lists(tagged)
    rows = out.collect()
    shutil.rmtree(workdir, ignore_errors=True)
    return spark.createDataFrame(rows, out.schema)
