"""Incremental index maintenance: the engine emits CREATE/DELETE alias
changelog rows per micro-batch (`kind='index'`); compaction yields the
live index without ever recomputing from snapshots
(`ResourceIndexProcessor.java:41-131` parity)."""

from __future__ import annotations

import json
import shutil
import tempfile
from pathlib import Path

import pyspark.sql.functions as F

from old_original_java_little_horse_spark.engine.batch import WF_EVENT_SCHEMA
from old_original_java_little_horse_spark.operators.index_store import (
    current_aliases, index_changelog, posting_lists, search_live,
)
from old_original_java_little_horse_spark.sdk.builder import Workflow
from old_original_java_little_horse_spark.streaming.engine import (
    run_streaming_availablenow,
)


def _promo_spec():
    wf = Workflow("promo")
    t = wf.thread("entrypoint")
    t.add_variable("tier", "STRING", default="bronze")
    n = t.wait_for_event("promote")
    t.mutate(n, "tier", "ASSIGN")
    return wf.build()


def test_index_updates_incrementally_across_microbatches(spark):
    """Batch 1 CREATEs the run's aliases; batch 2 (a variable change)
    emits DELETE old + CREATE new — the compacted index always shows
    exactly the live alias set, and old values stop resolving."""
    workdir = Path(tempfile.mkdtemp(prefix="idx-inc-"))
    try:
        events_dir = workdir / "events"
        events_dir.mkdir()
        start = [("r1", "s", "s", "WF_RUN_STARTED", 0, 1000, 1,
                  json.dumps({"variables": {}}))]
        spark.createDataFrame(start, schema=WF_EVENT_SCHEMA) \
             .coalesce(1).write.parquet(str(events_dir / "wave1"))
        tagged = run_streaming_availablenow(
            spark, str(events_dir) + "/*", _promo_spec(),
            checkpoint_dir=str(workdir / "ckpt"),
            output_dir=str(workdir / "out"))

        log1 = index_changelog(tagged).collect()
        assert {(r["op"], r["key"], r["value"]) for r in log1} == {
            ("CREATE", "name", "r1"), ("CREATE", "tier", "bronze")}
        live1 = {(r["key"], r["value"]) for r in current_aliases(tagged).collect()}
        assert live1 == {("name", "r1"), ("tier", "bronze")}

        # Batch 2: the external event reassigns tier -> gold.
        promote = [("r1", "s", "s", "EXTERNAL_EVENT", -1, 2000, 2,
                    json.dumps({"external_event_def_name": "promote",
                                "content": "gold", "timestamp": 2000}))]
        spark.createDataFrame(promote, schema=WF_EVENT_SCHEMA) \
             .coalesce(1).write.parquet(str(events_dir / "wave2"))
        tagged2 = run_streaming_availablenow(
            spark, str(events_dir) + "/*", _promo_spec(),
            checkpoint_dir=str(workdir / "ckpt"),
            output_dir=str(workdir / "out2"))

        # The second batch's changelog is ONLY the diff — O(changed
        # runs), no re-emission of unchanged aliases (e.g. 'name').
        log2 = index_changelog(tagged2).collect()
        assert {(r["op"], r["key"], r["value"]) for r in log2} == {
            ("DELETE", "tier", "bronze"), ("CREATE", "tier", "gold")}

        # Compacted over the full changelog: old value deleted.
        full = tagged.unionByName(tagged2)
        live = {(r["key"], r["value"]) for r in current_aliases(full).collect()}
        assert live == {("name", "r1"), ("tier", "gold")}
        assert [r["wf_run_id"] for r in search_live(full, "tier", "gold").collect()] == ["r1"]
        assert search_live(full, "tier", "bronze").count() == 0

        posts = {(r["key"], r["value"]): (r["n_entries"], r["posting_list"])
                 for r in posting_lists(full).collect()}
        assert posts[("tier", "gold")] == (1, "r1")
        assert ("tier", "bronze") not in posts
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def test_incremental_index_matches_batch_recompute(spark):
    """The changelog-compacted posting lists equal the full snapshot
    recompute (`run_index.run_index`) on the same engine output."""
    from old_original_java_little_horse_spark.engine.batch import (
        run_events_batch,
    )
    from old_original_java_little_horse_spark.engine.batch_queries import (
        _wf_events_from_users, pipeline_executor, pipeline_spec,
    )
    from old_original_java_little_horse_spark.operators.run_index import (
        run_index,
    )

    from .conftest import SF_SMOKE

    workdir = Path(tempfile.mkdtemp(prefix="idx-parity-"))
    try:
        events_dir = workdir / "events"
        _wf_events_from_users(spark, SF_SMOKE).coalesce(1) \
            .write.parquet(str(events_dir))
        tagged = run_streaming_availablenow(
            spark, str(events_dir), pipeline_spec(),
            checkpoint_dir=str(workdir / "ckpt"),
            output_dir=str(workdir / "out"),
            executor=pipeline_executor)
        incremental = {tuple(r) for r in posting_lists(tagged).collect()}

        events = _wf_events_from_users(spark, SF_SMOKE)
        snaps = run_events_batch(events, pipeline_spec(),
                                 executor=pipeline_executor)
        recomputed = {tuple(r) for r in run_index(snaps).collect()}
        assert incremental == recomputed
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
