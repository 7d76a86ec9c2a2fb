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


def test_ledger_intent_record_detects_crash_before_done():
    """VERDICT r6 item 4: a 'started' intent line is appended BEFORE
    the user function runs, so a crash between user-function return
    and the 'done' append is detected as IN-DOUBT on restart — the
    replacement worker re-executes (at-least-once fallback) but
    records the detection instead of treating the attempt as never
    started.  (Reference comparable: the Kafka-txn exactly-once
    commit, TaskWorker.java:102-142.)"""
    calls = []

    def fn(subs):
        calls.append(subs)
        return {"stdout": "ok", "success": True, "returncode": 0}

    tsr = {"wf_run_id": "wf-1", "thread_id": 0, "task_run_position": 0,
           "attempt_number": 0, "task_def_name": "t",
           "variable_substitutions": {}}
    workdir = Path(tempfile.mkdtemp(prefix="worker-intent-"))
    try:
        ledger = str(workdir / "t.jsonl")
        # Simulate the crash window: monkeypatch the 'done' append away
        # so the process dies after fn() returned but before completion
        # was recorded — only the 'started' intent survives on disk.
        w1 = TaskWorker({"t": fn}, seen_path=ledger)
        real_append = w1._append_ledger
        w1._append_ledger = lambda key, state: (
            None if state == "done" else real_append(key, state))
        assert len(w1.handle(tsr, 1000, 10)) == 2
        lines = [json.loads(s) for s in Path(ledger).read_text().splitlines()]
        assert lines == [{"k": ["wf-1", 0, 0, 0], "s": "started"}]
        # Restarted worker: key is in-doubt, NOT silently skipped and
        # NOT silently re-executed — detection is surfaced.
        w2 = TaskWorker({"t": fn}, seen_path=ledger)
        assert w2.detected_in_doubt == []
        evs = w2.handle(tsr, 1001, 12)
        assert len(evs) == 2  # at-least-once fallback: re-executed
        assert w2.detected_in_doubt == [("wf-1", 0, 0, 0)]
        assert len(calls) == 2
        # The re-execution completed normally, so a THIRD worker sees
        # 'done' and skips cleanly.
        w3 = TaskWorker({"t": fn}, seen_path=ledger)
        assert w3.handle(tsr, 1002, 14) == []
        assert w3.detected_in_doubt == []
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def test_reload_seen_tolerates_partial_and_malformed_lines():
    """ADVICE r6 (medium): another process may be mid-append when
    reload_seen() runs.  Only complete lines are consumed — a trailing
    fragment with no newline is left for the next poll (and the byte
    offset does NOT advance past it) — and a malformed complete line
    is skipped instead of crashing the poll loop."""
    calls = []

    def fn(subs):
        calls.append(subs)
        return {"stdout": "ok", "success": True, "returncode": 0}

    keyline = json.dumps({"k": ["wf-9", 0, 0, 0], "s": "done"})
    workdir = Path(tempfile.mkdtemp(prefix="worker-partial-"))
    try:
        ledger = workdir / "t.jsonl"
        # complete malformed line + partial (torn) trailing write
        ledger.write_text('{"k": [garbage\n' + keyline[: len(keyline) // 2])
        w = TaskWorker({"t": fn}, seen_path=str(ledger))  # must not raise
        assert w._seen == set() and w._in_doubt == set()
        # offset sits at the end of the malformed line, before the tear
        assert w._seen_offset == len('{"k": [garbage\n')
        # the other process finishes its append
        with open(ledger, "a") as f:
            f.write(keyline[len(keyline) // 2:] + "\n")
        w.reload_seen()
        assert ("wf-9", 0, 0, 0) in w._seen
        tsr = {"wf_run_id": "wf-9", "thread_id": 0, "task_run_position": 0,
               "attempt_number": 0, "task_def_name": "t",
               "variable_substitutions": {}}
        assert w.handle(tsr, 1000, 10) == [] and calls == []
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def test_legacy_bare_key_ledger_lines_still_load():
    """Pre-intent ledgers (bare JSON-array lines) keep working: a bare
    key is treated as 'done'."""
    workdir = Path(tempfile.mkdtemp(prefix="worker-legacy-"))
    try:
        ledger = workdir / "t.jsonl"
        ledger.write_text(json.dumps(["wf-L", 0, 0, 0]) + "\n")
        w = TaskWorker({}, seen_path=str(ledger))
        assert ("wf-L", 0, 0, 0) in w._seen
        tsr = {"wf_run_id": "wf-L", "thread_id": 0, "task_run_position": 0,
               "attempt_number": 0, "task_def_name": "t",
               "variable_substitutions": {}}
        assert w.handle(tsr, 1000, 10) == []
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def test_reload_seen_concurrent_appender_fuzz():
    """Live version of the torn-append contract: a writer thread
    appends ledger entries in deliberately split chunks (every byte
    boundary a slow filesystem could expose) while the reader polls
    reload_seen() between chunks.  The reader must never crash, never
    mis-parse, and must converge to exactly the writer's key set."""
    import threading

    workdir = Path(tempfile.mkdtemp(prefix="worker-fuzz-"))
    try:
        ledger = workdir / "t.jsonl"
        ledger.touch()
        keys = [("wf-%d" % i, 0, i, 0) for i in range(200)]
        step = threading.Event()   # reader turn
        wrote = threading.Event()  # writer progressed

        def writer():
            with open(ledger, "a") as f:
                for i, k in enumerate(keys):
                    line = json.dumps({"k": list(k), "s": "done"}) + "\n"
                    # split each line at a position that walks through
                    # every byte offset across the run
                    cut = (i * 7) % (len(line) - 1) + 1
                    f.write(line[:cut]); f.flush()
                    wrote.set(); step.wait(); step.clear()
                    f.write(line[cut:]); f.flush()
                    if i % 3 == 0:  # sometimes let the reader see
                        wrote.set(); step.wait(); step.clear()
            wrote.set()

        w = TaskWorker({}, seen_path=str(ledger))
        t = threading.Thread(target=writer)
        t.start()
        while t.is_alive():
            wrote.wait(timeout=5)
            wrote.clear()
            w.reload_seen()  # must tolerate whatever is on disk now
            step.set()
        t.join()
        w.reload_seen()
        assert w._seen == set(keys)
        assert w._in_doubt == set()
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def test_reload_seen_skips_wrong_shape_json_lines():
    """Valid JSON of the wrong SHAPE is corruption too: a scalar 'k',
    a string 'k' (tuple('wf-1') would silently become a per-character
    key), nested lists, or a bare string line must be skipped, never
    crash the poll or load a mangled key."""
    workdir = Path(tempfile.mkdtemp(prefix="worker-shape-"))
    try:
        ledger = workdir / "t.jsonl"
        good = json.dumps({"k": ["wf-ok", 0, 0, 0], "s": "done"})
        ledger.write_text("\n".join([
            '{"k": 5, "s": "done"}',            # scalar k
            '{"k": "wf-1", "s": "done"}',       # string k -> would explode
            '[["wf-1"]]',                        # nested list (unhashable)
            '"just a string"',                  # bare scalar line
            '{"s": "done"}',                    # no k at all
            good,
        ]) + "\n")
        w = TaskWorker({}, seen_path=str(ledger))  # must not raise
        assert w._seen == {("wf-ok", 0, 0, 0)}
        assert w._in_doubt == set()
        # in particular, no per-character key leaked in
        assert ("w", "f", "-", "1") not in w._seen
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def test_done_is_appended_only_after_publish_succeeds():
    """Lost-result window (round-9 review): with a caller that
    publishes events AFTER handle() returns, a crash between the
    'done' append and the publish marks the attempt done while the
    engine never sees its TASK_EVENTs — at-most-once for that result.
    The `publish` hook closes it: events are durably published INSIDE
    handle(), before 'done', so a crash mid-publish leaves the key
    in-doubt and a restarted worker re-executes and re-publishes."""
    published: list[list[dict]] = []

    def fn(subs):
        return {"stdout": "ok", "success": True, "returncode": 0}

    tsr = {"wf_run_id": "wf-p", "thread_id": 0, "task_run_position": 0,
           "attempt_number": 0, "task_def_name": "t",
           "variable_substitutions": {}}
    workdir = Path(tempfile.mkdtemp(prefix="worker-pub-"))
    try:
        ledger = workdir / "t.jsonl"

        # Crash INSIDE publish: 'started' on disk, no 'done'.
        w1 = TaskWorker({"t": fn}, seen_path=str(ledger))
        try:
            w1.handle(tsr, 1000, 10,
                      publish=lambda evs: (_ for _ in ()).throw(
                          OSError("disk gone")))
        except OSError:
            pass
        lines = [json.loads(s) for s in ledger.read_text().splitlines()]
        assert lines == [{"k": ["wf-p", 0, 0, 0], "s": "started"}]

        # Restart: in-doubt -> re-executed AND re-published; 'done'
        # lands only after publish returned.
        order: list[str] = []
        w2 = TaskWorker({"t": fn}, seen_path=str(ledger))
        real_append = w2._append_ledger

        def spy_append(key, state):
            order.append(state)
            real_append(key, state)

        w2._append_ledger = spy_append
        evs = w2.handle(tsr, 1001, 12,
                        publish=lambda e: (order.append("publish"),
                                           published.append(e)))
        assert len(evs) == 2
        assert w2.detected_in_doubt == [("wf-p", 0, 0, 0)]
        assert published == [evs]
        assert order == ["started", "publish", "done"]

        # Third worker: done -> clean skip, nothing re-published.
        w3 = TaskWorker({"t": fn}, seen_path=str(ledger))
        assert w3.handle(tsr, 1002, 14, publish=published.append) == []
        assert len(published) == 1
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
