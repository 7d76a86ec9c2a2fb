"""Full async engine ⇄ worker loop: streaming engine emits
task_schedule rows, the worker executes and produces TASK_EVENT
waves, the engine folds them — cycled to quiescence.  This is the
reference's Kafka round-trip (§3.2) minus the broker, including
duplicate-delivery idempotency."""

from __future__ import annotations

import json
import shutil
import tempfile
from pathlib import Path

from old_original_java_little_horse_spark.engine.batch import WF_EVENT_SCHEMA
from old_original_java_little_horse_spark.engine.worker import TaskWorker
from old_original_java_little_horse_spark.sdk.builder import Workflow, var
from old_original_java_little_horse_spark.streaming.engine import (
    run_streaming_availablenow,
)


def two_task_spec():
    wf = Workflow("two-tasks")
    t = wf.thread("entrypoint")
    t.add_variable("total", "INT", default=0)
    n1 = t.execute("add_one", x=var("total"))
    t.mutate(n1, "total", "ASSIGN")
    n2 = t.execute("add_one", x=var("total"))
    t.mutate(n2, "total", "ASSIGN")
    return wf.build()


def test_async_worker_loop_to_quiescence(spark):
    spec = two_task_spec()
    worker = TaskWorker({"add_one": lambda subs: {
        "stdout": json.dumps(subs["x"] + 1), "success": True, "returncode": 0}})

    workdir = Path(tempfile.mkdtemp(prefix="worker-loop-"))
    try:
        events_dir = workdir / "events"
        events_dir.mkdir()
        runs = [(f"r{i}", "s", "s", "WF_RUN_STARTED", 0, 1000, 0,
                 json.dumps({"variables": {"total": i}})) for i in range(5)]
        spark.createDataFrame(runs, schema=WF_EVENT_SCHEMA) \
             .coalesce(1).write.parquet(str(events_dir / "wave0"))

        final = {}
        for wave in range(1, 6):  # 2 task waves expected, rest no-ops
            tagged = run_streaming_availablenow(
                spark, str(events_dir) + "/*", spec,
                checkpoint_dir=str(workdir / "ckpt"),
                output_dir=str(workdir / f"out{wave}"),
            )
            rows = tagged.collect()
            for r in rows:
                if r["kind"] == "snapshot":
                    final[r["wf_run_id"]] = json.loads(r["payload"])
            scheds = [json.loads(r["payload"]) for r in rows
                      if r["kind"] == "task_schedule"]
            if not scheds:
                break
            # Duplicate delivery on purpose: worker must dedupe.
            events = worker.drain(scheds + scheds,
                                  start_offset=1000 * wave, timestamp=1000 + wave)
            assert len(events) == 2 * len(scheds)  # dupes skipped
            spark.createDataFrame(
                [(e["wf_run_id"], e["wf_spec_id"], e["wf_spec_name"],
                  e["event_type"], e["thread_id"], e["timestamp"], e["offset"],
                  e["content"]) for e in events],
                schema=WF_EVENT_SCHEMA,
            ).coalesce(1).write.parquet(str(events_dir / f"wave{wave}"))

        assert len(final) == 5
        for i in range(5):
            st = final[f"r{i}"]
            assert st["status"] == "COMPLETED", st["status"]
            assert st["thread_runs"][0]["variables"]["total"] == i + 2
            positions = [t["position"] for t in st["thread_runs"][0]["task_runs"]]
            assert positions == [0, 1]  # no duplicate task runs
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def test_durable_seen_ledger_survives_restart():
    """A worker restarted with the same `seen_path` must skip attempt
    keys an earlier process already executed — the cross-root /
    cross-restart half of the idempotent-consumer contract (an
    engine-root migration replays schedule rows a dead worker
    already ran; only the durable ledger can know that)."""
    calls = []

    def fn(subs):
        calls.append(subs)
        return {"stdout": "1", "success": True, "returncode": 0}

    tsr = {"wf_run_id": "wf-1", "thread_id": 0, "task_run_position": 0,
           "attempt_number": 0, "task_def_name": "t",
           "variable_substitutions": {}}
    workdir = Path(tempfile.mkdtemp(prefix="worker-ledger-"))
    try:
        ledger = str(workdir / "t.jsonl")
        w1 = TaskWorker({"t": fn}, seen_path=ledger)
        assert len(w1.handle(tsr, 1000, 10)) == 2
        assert w1.handle(tsr, 1001, 12) == []  # in-memory dedupe
        # fresh process, same ledger: still a duplicate
        w2 = TaskWorker({"t": fn}, seen_path=ledger)
        assert w2.handle(tsr, 1002, 14) == []
        # a NEW attempt of the same position executes
        tsr2 = dict(tsr, attempt_number=1)
        assert len(w2.handle(tsr2, 1003, 16)) == 2
        assert len(calls) == 2
        # and a ledger-less worker (unit-test shape) is unaffected
        w3 = TaskWorker({"t": fn})
        assert len(w3.handle(tsr, 1004, 18)) == 2
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def test_worker_none_result_posts_started_only():
    """A task function returning None (started, never answers — the
    timeout-case contract shared with the inline drain) posts ONLY the
    started event, and the attempt key is still deduped so a
    redelivery cannot re-start the hung task."""
    calls = []

    def hung(subs):
        calls.append(subs)
        return None

    tsr = {"wf_run_id": "wf-1", "thread_id": 0, "task_run_position": 0,
           "attempt_number": 0, "task_def_name": "slow",
           "variable_substitutions": {}}
    w = TaskWorker({"slow": hung})
    evs = w.handle(tsr, 1000, 10)
    assert len(evs) == 1 and len(calls) == 1
    content = json.loads(evs[0]["content"])
    assert "started_event" in content and "ended_event" not in content
    assert w.handle(tsr, 1001, 12) == []  # duplicate delivery skipped
