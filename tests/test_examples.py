"""The example workflows (`examples/workflows.py` — the reference's
`examples/workflows/` twins) must all compile to valid WFSpecs, and a
representative subset must run to the expected outcome through the
inline fold engine."""

from __future__ import annotations

import json

import old_original_java_little_horse_spark.engine.fold as E
from examples.tasks import execute
from examples.workflows import ALL, basic_exceptions, basic_threads


def _run(spec: dict, variables: dict | None = None) -> dict:
    start = {"wf_run_id": "r1", "wf_spec_id": spec["id"],
             "wf_spec_name": spec["name"], "event_type": "WF_RUN_STARTED",
             "thread_id": 0, "timestamp": 1000, "offset": 0,
             "content": {"variables": variables or {}}}
    state, _ = E.process_event(spec, None, start, executor=execute)
    return state


def test_all_examples_compile():
    specs = [fn().build() for fn in ALL]  # build() validates
    assert len({s["name"] for s in specs}) == len(specs)


def test_basic_threads_runs():
    state = _run(basic_threads().build())
    assert state["status"] == "COMPLETED"
    assert len(state["thread_runs"]) == 2
    child = state["thread_runs"][1]
    assert "child_task()" in child["task_runs"][0]["stdout"]


def test_basic_exceptions_handler_repairs_parent_var():
    """The unreliable task fails ~70% of runs; over 40 runs both paths
    occur with overwhelming probability.  Success assigns 5; failure
    runs the exception handler, which assigns dummy_42's 42 to the
    PARENT's my_var (parent-chain variable resolution) and the run
    still COMPLETES — the reference example's whole point."""
    spec = basic_exceptions().build()
    outcomes = set()
    for _ in range(40):
        state = _run(spec)
        assert state["status"] == "COMPLETED"
        my_var = state["thread_runs"][0]["variables"]["my_var"]
        assert my_var in (5, 42)
        outcomes.add(my_var)
    assert outcomes == {5, 42}  # P(miss a path) < 1e-5
