"""Property-based fold tests: random event interleavings must never
corrupt run state (SURVEY.md §7 step 6 — 'property-test with
randomized event interleavings').

Invariants checked after every event, under arbitrary orderings,
duplications, and garbage events:

- statuses are always legal enum values;
- task positions are contiguous 0..n-1 per thread;
- retries share `number` and increment `attempt_number`;
- a COMPLETED run has every thread COMPLETED;
- the engine never throws (error containment → HALTED +
  INTERNAL_LITTLEHORSE_ERROR, SchedulerProcessor.java:67-85);
- folding is deterministic (same event list → same state).
"""

from __future__ import annotations

import copy
import json

from hypothesis import given, settings, strategies as st

from old_original_java_little_horse_spark.engine import fold as E
from old_original_java_little_horse_spark.sdk.builder import Workflow, var

from .test_fold import ended_ev, ext_event, start_ev, started_ev

STATUSES = {"SCHEDULED", "RUNNING", "HALTING", "HALTED", "COMPLETED"}


def spec_with_everything():
    wf = Workflow("prop")
    t = wf.thread("entrypoint")
    t.add_variable("x", "INT", default=0)
    t.add_variable("msg", "STRING", default="")
    t.handle_interrupt("irq", "handler")
    n1 = t.execute("t1", a=var("x"))
    n1.with_retries(1)
    t.mutate(n1, "x", "ADD", literal=1)
    w = t.wait_for_event("evt")
    w.with_timeout(5)
    t.mutate(w, "msg", "ASSIGN")
    n2 = t.execute("t2", b=var("x"))
    t.mutate(n2, "x", "MULTIPLY", literal=2)

    h = wf.thread("handler")
    h.execute("ht", z=1)
    wf.entrypoint = "entrypoint"
    return wf.build()


SPEC = spec_with_everything()


def event_pool():
    """Plausible + garbage events for run r1."""
    pool = [
        start_ev("r1", {"x": 3}),
        started_ev("r1", 0, 0),
        ended_ev("r1", 0, 0, "4"),
        ended_ev("r1", 0, 0, None, success=False),       # failure → retry
        ended_ev("r1", 0, 1, "5"),                        # retry result
        ext_event("r1", "evt", "hello"),
        ext_event("r1", "evt", "again"),                  # extra buffered
        ext_event("r1", "irq", "{}"),                     # interrupt
        started_ev("r1", 0, 2),
        ended_ev("r1", 0, 2, "9"),
        ended_ev("r1", 0, 3, "10"),
        {"wf_run_id": "r1", "event_type": "TIMER_EVENT", "thread_id": 0,
         "timestamp": 9000, "offset": 50,
         "content": {"wf_run_id": "r1", "thread_run_id": 0, "task_run_id": 1,
                     "node_name": "wait-evt", "maturation_timestamp": 6000}},
        {"wf_run_id": "r1", "event_type": "WF_RUN_STOP_REQUEST", "thread_id": 0,
         "timestamp": 1800, "offset": 60, "content": {}},
        {"wf_run_id": "r1", "event_type": "WF_RUN_RESUME_REQUEST", "thread_id": 0,
         "timestamp": 1900, "offset": 61, "content": {}},
        # Garbage: out-of-range positions / threads
        ended_ev("r1", 0, 99, "zz"),
        {"wf_run_id": "r1", "event_type": "TASK_EVENT", "thread_id": 7,
         "timestamp": 1000, "offset": 70,
         "content": {"thread_id": 7, "task_run_position": 0,
                     "started_event": {"worker_id": "w"}}},
    ]
    return pool


def check_invariants(state: dict | None) -> None:
    if state is None:
        return
    assert state["status"] in STATUSES
    for t in state["thread_runs"]:
        assert t["status"] in STATUSES
        positions = [tr["position"] for tr in t["task_runs"]]
        assert positions == list(range(len(positions))), positions
        for tr in t["task_runs"]:
            assert tr["status"] in STATUSES
        # retries: same number ⇒ attempts strictly increasing
        by_number: dict[int, list[int]] = {}
        for tr in t["task_runs"]:
            by_number.setdefault(tr["number"], []).append(tr["attempt_number"])
        for attempts in by_number.values():
            assert attempts == sorted(attempts)
    if state["status"] == "COMPLETED":
        assert all(t["status"] == "COMPLETED" for t in state["thread_runs"])


@settings(max_examples=200, deadline=None)
@given(st.data())
def test_random_interleavings_keep_invariants(data):
    pool = event_pool()
    n = data.draw(st.integers(min_value=1, max_value=14))
    seq = [copy.deepcopy(pool[i]) for i in
           data.draw(st.lists(st.integers(0, len(pool) - 1),
                              min_size=n, max_size=n))]
    state = None
    for i, ev in enumerate(seq):
        ev["offset"] = i
        state, ctx = E.process_event(SPEC, state, ev)
        check_invariants(state)
        # Internal errors must be contained, never raised.
        if state is not None and state.get("error_code"):
            assert state["error_code"] == "INTERNAL_LITTLEHORSE_ERROR"


@settings(max_examples=50, deadline=None)
@given(st.data())
def test_fold_is_deterministic(data):
    pool = event_pool()
    idxs = data.draw(st.lists(st.integers(0, len(pool) - 1),
                              min_size=3, max_size=10))

    def run():
        state = None
        for i, idx in enumerate(idxs):
            ev = copy.deepcopy(pool[idx])
            ev["offset"] = i
            state, _ = E.process_event(SPEC, state, ev)
        return state

    a, b = run(), run()
    assert json.dumps(a, sort_keys=True) == json.dumps(b, sort_keys=True)


# ---------------------------------------------------------------------------
# Task-run consistency cross-check (reference harness/logic.py:79-121):
# a ground-truth execution ledger reconciled against engine-reported
# TaskRuns — zero phantoms ("engine says ran, never ran") and zero
# orphans ("ran, engine lost it") under randomized retry outcomes,
# schedule redeliveries, and cross-run interleavings.
# ---------------------------------------------------------------------------

from old_original_java_little_horse_spark.engine.worker import TaskWorker


class LedgeredWorker(TaskWorker):
    """The reference's Postgres side channel: records every ACTUAL
    execution (post-dedupe), keyed by task-run identity."""

    def __init__(self, tasks):
        super().__init__(tasks)
        self.ledger: list[tuple] = []

    def handle(self, tsr, timestamp, base_offset):
        evs = super().handle(tsr, timestamp, base_offset)
        if evs:  # really executed (not an idempotent-skip)
            self.ledger.append(self._key(tsr))
        return evs


def chain_spec():
    wf = Workflow("consistency")
    t = wf.thread("entrypoint")
    t.add_variable("x", "INT", default=0)
    n1 = t.execute("step1", a=var("x"))
    n1.with_retries(2)
    t.mutate(n1, "x", "ADD", literal=1)
    n2 = t.execute("step2", b=var("x"))
    n2.with_retries(1)
    return wf.build()


CHAIN = chain_spec()


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_no_phantom_or_orphan_task_runs(data):
    runs = [f"r{i}" for i in range(3)]
    # Per-execution outcome oracle, drawn lazily (keyed so duplicate
    # deliveries of one attempt would get the same verdict).
    outcomes: dict[tuple, bool] = {}

    def result_for(key):
        if key not in outcomes:
            outcomes[key] = data.draw(st.booleans(), label=f"ok{key}")
        return outcomes[key]

    worker = LedgeredWorker({})
    # Bind task fns through the worker's key via a mutable cell the
    # drain loop sets before each handle() call.
    current: dict = {}
    worker.tasks = {
        name: (lambda subs, _n=name: (
            {"stdout": "ok", "success": True, "returncode": 0}
            if result_for(current["key"]) else
            {"stdout": None, "stderr": "boom", "success": False,
             "returncode": 1}))
        for name in ("step1", "step2")
    }

    states: dict[str, dict | None] = {r: None for r in runs}
    offsets: dict[str, int] = {r: 0 for r in runs}
    pending: list[dict] = []

    def fold(run_id, ev):
        ev = dict(ev)
        offsets[run_id] += 1
        ev["offset"] = offsets[run_id]
        states[run_id], ctx = E.process_event(CHAIN, states[run_id], ev)
        pending.extend(ctx.to_schedule)

    for r in runs:
        fold(r, start_ev(r, {"x": 0}))

    guard = 0
    while pending and guard < 200:
        guard += 1
        i = data.draw(st.integers(0, len(pending) - 1), label="pick")
        tsr = pending.pop(i)
        # At-least-once delivery: sometimes redeliver the same TSR.
        if data.draw(st.booleans(), label="redeliver"):
            pending.append(dict(tsr))
        current["key"] = worker._key(tsr)
        for ev in worker.handle(tsr, timestamp=2000, base_offset=0):
            ev["content"] = json.loads(ev["content"])
            fold(tsr["wf_run_id"], ev)
    assert not pending, "drive loop did not quiesce"

    # Reconcile: engine-reported executed TaskRuns ⇄ ledger.
    engine_executed = set()
    for r in runs:
        st_ = states[r]
        assert st_ is not None and st_["status"] in ("COMPLETED", "HALTED")
        for t in st_["thread_runs"]:
            for tr in t["task_runs"]:
                assert tr["status"] in ("COMPLETED", "HALTED"), \
                    f"non-terminal task_run after quiescence: {tr}"
                engine_executed.add(
                    (r, t["id"], tr["position"], tr["attempt_number"]))

    ledger = worker.ledger
    assert len(ledger) == len(set(ledger)), "double execution (exactly-once broken)"
    phantoms = engine_executed - set(ledger)
    orphans = set(ledger) - engine_executed
    assert not phantoms, f"engine reports runs that never executed: {phantoms}"
    assert not orphans, f"executions the engine lost: {orphans}"
