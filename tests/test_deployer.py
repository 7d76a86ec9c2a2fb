"""LocalDeployer: one worker process per TaskDef, per-TaskDef routing,
full engine ⇄ deployer round-trip (the reference deployer contract —
DockerTaskDeployer.java launches one worker deployment per TaskDef
consuming its own request topic)."""

from __future__ import annotations

import json

from old_original_java_little_horse_spark.engine.deployer import (
    LocalDeployer, run_with_deployer,
)
from old_original_java_little_horse_spark.sdk.builder import Workflow, var


def add_one(subs: dict) -> dict:
    return {"stdout": json.dumps(subs["x"] + 1), "success": True, "returncode": 0}


def double(subs: dict) -> dict:
    return {"stdout": json.dumps(subs["x"] * 2), "success": True, "returncode": 0}


def two_taskdef_spec() -> dict:
    wf = Workflow("deployer-wf")
    t = wf.thread("entrypoint")
    t.add_variable("total", "INT", default=0)
    n1 = t.execute("add_one", x=var("total"))
    t.mutate(n1, "total", "ASSIGN")
    n2 = t.execute("double", x=var("total"))
    t.mutate(n2, "total", "ASSIGN")
    return wf.build()


def start_event(rid: str, total: int) -> dict:
    return {"wf_run_id": rid, "wf_spec_id": "s", "wf_spec_name": "s",
            "event_type": "WF_RUN_STARTED", "thread_id": 0,
            "timestamp": 1000, "offset": 0,
            "content": {"variables": {"total": total}}}


def test_route_sends_each_taskdef_to_its_own_worker():
    with LocalDeployer({"add_one": add_one, "double": double}) as dep:
        rows = [
            {"task_def_name": "add_one", "wf_run_id": "r0", "wf_spec_id": "s",
             "wf_spec_name": "s", "thread_id": 0, "task_run_position": 0,
             "attempt_number": 0, "variable_substitutions": {"x": 1}},
            {"task_def_name": "double", "wf_run_id": "r0", "wf_spec_id": "s",
             "wf_spec_name": "s", "thread_id": 0, "task_run_position": 1,
             "attempt_number": 0, "variable_substitutions": {"x": 21}},
        ]
        events = dep.route(rows)
        assert len(events) == 4  # started+ended per task
        ended = [json.loads(e["content"]) for e in events
                 if "ended_event" in e["content"]]
        by_pos = {e["task_run_position"]:
                  e["ended_event"]["result"]["stdout"] for e in ended}
        assert by_pos == {0: "2", 1: "42"}
        # Worker identity proves per-TaskDef isolation.
        started = [json.loads(e["content"]) for e in events
                   if "started_event" in e["content"]]
        workers = {s["task_run_position"]:
                   s["started_event"]["worker_id"] for s in started}
        assert workers == {0: "worker-add_one", 1: "worker-double"}


def test_route_duplicate_delivery_yields_no_extra_events_and_no_stall():
    with LocalDeployer({"add_one": add_one}) as dep:
        row = {"task_def_name": "add_one", "wf_run_id": "r0", "wf_spec_id": "s",
               "wf_spec_name": "s", "thread_id": 0, "task_run_position": 0,
               "attempt_number": 0, "variable_substitutions": {"x": 1}}
        events = dep.route([row, dict(row)])  # at-least-once redelivery
        assert len(events) == 2  # one started+ended; duplicate deduped


def test_route_unknown_taskdef_raises():
    with LocalDeployer({"add_one": add_one}) as dep:
        try:
            dep.route([{"task_def_name": "nope", "wf_run_id": "r", "thread_id": 0,
                        "task_run_position": 0, "attempt_number": 0}])
            raise AssertionError("expected KeyError")
        except KeyError:
            pass


def test_full_round_trip_to_completion():
    spec = two_taskdef_spec()
    for i in range(3):
        state = run_with_deployer(
            spec, [start_event(f"r{i}", i)],
            {"add_one": add_one, "double": double})
        assert state["status"] == "COMPLETED"
        # total := (i+1) then := 2*(i+1)
        assert state["thread_runs"][0]["variables"]["total"] == 2 * (i + 1)
        positions = [t["position"] for t in state["thread_runs"][0]["task_runs"]]
        assert positions == [0, 1]
