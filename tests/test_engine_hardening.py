"""Failure-edge hardening of the streaming update function (round-7
review findings): poison-pill TIMER_EVENT content, pandas-nullified
(NaN) offset/timestamp columns, and eviction of COMPLETED runs whose
dead task-timeout timers would otherwise pin state forever in replay
mode.  All pure-Python — no SparkSession needed."""

from __future__ import annotations

import json

import pandas as pd

from old_original_java_little_horse_spark.sdk.builder import Workflow, lit
from old_original_java_little_horse_spark.streaming.engine import (
    _ival,
    make_update_fn,
    prepare_events,
)


class FakeGroupState:
    def __init__(self):
        self._v = None
        self.hasTimedOut = False

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def remove(self):
        self._v = None

    def setTimeoutDuration(self, ms):
        pass


def _spec(timeout: int | None = None):
    wf = Workflow("hardening")
    t = wf.thread("entrypoint")
    node = t.execute("echo", x=lit("hi"))
    if timeout is not None:
        node.with_timeout(timeout)
    return wf.build()


def _events(rid="r1"):
    return [
        {"wf_run_id": rid, "wf_spec_id": "s", "wf_spec_name": "s",
         "event_type": "WF_RUN_STARTED", "thread_id": 0,
         "timestamp": 1000, "offset": 0,
         "content": json.dumps({"variables": {}})},
        {"wf_run_id": rid, "wf_spec_id": "s", "wf_spec_name": "s",
         "event_type": "TASK_EVENT", "thread_id": 0,
         "timestamp": 1001, "offset": 1,
         "content": json.dumps({
             "thread_id": 0, "task_run_position": 0,
             "started_event": {"worker_id": "w"}})},
        {"wf_run_id": rid, "wf_spec_id": "s", "wf_spec_name": "s",
         "event_type": "TASK_EVENT", "thread_id": 0,
         "timestamp": 1002, "offset": 2,
         "content": json.dumps({
             "thread_id": 0, "task_run_position": 0,
             "ended_event": {"result": {
                 "stdout": "hi", "stderr": None,
                 "success": True, "returncode": 0}}})},
    ]


def _drive(update, gs, events):
    rows = []
    for res in update(("r1",), iter([pd.DataFrame(events)]), gs):
        rows.extend(res.to_dict("records"))
    return rows


def test_poison_timer_event_content_is_tolerated():
    """TIMER_EVENT content that is valid JSON but not an object
    ('123', '[1,2]', 'null') must not crash the micro-batch — a crash
    would replay from the checkpoint and crash forever."""
    update = make_update_fn(_spec())
    gs = FakeGroupState()
    events = _events()
    for i, poison in enumerate(("123", "[1,2]", "null", "\"str\"")):
        events.append({
            "wf_run_id": "r1", "wf_spec_id": "s", "wf_spec_name": "s",
            "event_type": "TIMER_EVENT", "thread_id": 0,
            "timestamp": 1003 + i, "offset": 3 + i, "content": poison})
    rows = _drive(update, gs, events)  # must not raise
    snap = [r for r in rows if r["kind"] == "snapshot"][-1]
    assert json.loads(snap["payload"])["status"] == "COMPLETED"


def test_out_of_range_timer_ids_are_tolerated():
    """A well-SHAPED timer whose thread_run_id/task_run_id are out of
    range or mistyped is just as unattributable as a shapeless one:
    it must be skipped, not raise IndexError/TypeError into the
    blanket handler and halt the run with INTERNAL_ERROR (ADVICE r7:
    the shape guard validated key presence but not range)."""
    update = make_update_fn(_spec())
    gs = FakeGroupState()
    events = _events()
    bad_ids = [
        {"thread_run_id": 7, "task_run_id": 0},     # no such thread
        {"thread_run_id": -1, "task_run_id": 0},    # negative index
        {"thread_run_id": 0, "task_run_id": -3},    # negative task
        {"thread_run_id": "0", "task_run_id": 0},   # stringly typed
        {"thread_run_id": 0, "task_run_id": "x"},   # would TypeError <
        {"thread_run_id": True, "task_run_id": 0},  # bool is not an id
    ]
    for i, content in enumerate(bad_ids):
        content["node_name"] = "nope"
        events.append({
            "wf_run_id": "r1", "wf_spec_id": "s", "wf_spec_name": "s",
            "event_type": "TIMER_EVENT", "thread_id": 0,
            "timestamp": 1003 + i, "offset": 3 + i,
            "content": json.dumps(content)})
    rows = _drive(update, gs, events)  # must not raise
    snap = [r for r in rows if r["kind"] == "snapshot"][-1]
    assert json.loads(snap["payload"])["status"] == "COMPLETED"


def test_prepare_events_normalizes_nan_offsets_and_timestamps():
    """One null in a LongType column makes pandas deliver the WHOLE
    column as float64 with NaN; nan is truthy so `or 0` passes it
    through, poisoning sort order, max(), and the lateness gate."""
    nan = float("nan")
    events = [
        {"offset": nan, "timestamp": nan, "event_type": "A"},
        {"offset": 2.0, "timestamp": 2000.0, "event_type": "B"},
        {"offset": 1.0, "timestamp": nan, "event_type": "C"},
    ]
    out, max_offset, max_ts = prepare_events(events, 0, 0,
                                             allowed_lateness_ms=10_000)
    assert [e["event_type"] for e in out] == ["A", "C", "B"]
    assert all(isinstance(e["offset"], int) for e in out)
    assert all(isinstance(e["timestamp"], int) for e in out)
    assert max_offset == 2 and max_ts == 2000
    # the helper itself
    assert _ival(nan) == 0 and _ival(None) == 0 and _ival("x") == 0
    assert _ival(7.0) == 7 and _ival(7) == 7


def test_evict_completed_drops_dead_task_timeout_timers():
    """A COMPLETED run whose task had a timeout still holds that
    (now-dead) timer in `pending`; with evict_completed it must be
    tombstoned anyway — in replay mode (no timer wheel) nothing else
    ever drains the timer, and the full document would be pinned
    forever (round-7 review finding)."""
    update = make_update_fn(_spec(timeout=3600), evict_completed=True)
    gs = FakeGroupState()
    rows = _drive(update, gs, _events())
    snap = [r for r in rows if r["kind"] == "snapshot"][-1]
    assert json.loads(snap["payload"])["status"] == "COMPLETED"
    # a timeout timer WAS created for the task...
    assert any(r["kind"] == "timer" for r in rows)
    # ...and the stored state is nevertheless the tombstone
    state_json, _off, _ts, pending_json, tomb = gs._v
    assert tomb == 1 and state_json == ""


def test_completed_run_without_evict_keeps_document():
    """Control: without evict_completed the document stays readable."""
    update = make_update_fn(_spec(timeout=3600), evict_completed=False)
    gs = FakeGroupState()
    _drive(update, gs, _events())
    state_json, _off, _ts, _pending, tomb = gs._v
    assert tomb == 0
    assert json.loads(state_json)["status"] == "COMPLETED"
