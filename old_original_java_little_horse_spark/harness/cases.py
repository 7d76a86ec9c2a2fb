"""The harness test cases — the reference's
`lh_test_harness/tests/*.py` files re-expressed on our SDK builder.

Each case carries: the WFSpec (built from `sdk.builder`), the
TaskDef / ExternalEventDef names it needs, and one or more LAUNCHES —
(variables, external events to send, check function over the served
WFRun document).  Checks assert on exactly what the reference's
check_* functions assert on: thread/task counts, statuses, stdout
values, final variable values.

`retries_task_timeout` runs against the inline drain via the
executor's None contract (`engine/fold.py::_drain_inline`): the
executor reports `slow_task` as started-but-never-answered, and the
engine's own live timeout timers do the failing — the same
TIMER_EVENT path a detached worker's silence would trigger.
"""

from __future__ import annotations

import uuid

from dataclasses import dataclass, field
from typing import Any, Callable

from ..sdk.builder import Workflow, lit, var
from .executor import HELLO


@dataclass
class Launch:
    check: Callable[[dict], None]
    variables: Callable[[int], dict] = field(default=lambda i: {})
    events: list = field(default_factory=list)  # [(event_name, payload)]
    # Optional action script, run in order after the run POST (when
    # set, `events` is ignored).  Verbs:
    #   ("event", name, payload)  POST /externalEvent/{run}/{name}
    #   ("stop", thread_id)       POST /wfrun/{run}/stop?thread=N
    #   ("resume", thread_id)     POST /wfrun/{run}/resume?thread=N
    #   ("await", status)         poll GET /wfrun/{run} until status
    actions: list = field(default_factory=list)


@dataclass
class Case:
    name: str
    spec: dict
    launches: list
    task_defs: list = field(default_factory=list)
    event_defs: list = field(default_factory=list)


def _thread0(doc: dict) -> dict:
    return doc["thread_runs"][0]


def _completed(doc: dict) -> None:
    assert doc["status"] == "COMPLETED", doc["status"]


# -- basic.py ---------------------------------------------------------------

def _basic() -> Case:
    wf = Workflow("hn-basic")
    t = wf.thread("entrypoint")
    t.execute("echo", x=lit(HELLO))

    def check(doc: dict) -> None:
        _completed(doc)
        assert len(doc["thread_runs"]) == 1
        trs = _thread0(doc)["task_runs"]
        assert len(trs) == 1
        assert trs[0]["status"] == "COMPLETED"
        assert trs[0]["stdout"] == HELLO

    return Case("basic", wf.build(), [Launch(check)], task_defs=["echo"])


# -- conditionals_basic.py --------------------------------------------------

def _conditionals_basic() -> Case:
    wf = Workflow("hn-conditionals-basic")
    t = wf.thread("entrypoint")
    t.add_variable("x", "INT", default=0)
    with t.condition(var("x"), "GREATER_THAN", lit(5)).is_true():
        t.execute("echo", x=lit("big"))
    with t.condition(var("x"), "GREATER_THAN", lit(5)).is_false():
        t.execute("echo", x=lit("small"))

    def _echo_outs(doc: dict) -> list:
        # if/else contexts add NOP join nodes; compare the echoes only
        return [tr["stdout"] for tr in _thread0(doc)["task_runs"]
                if tr["node_name"].startswith("echo")]

    def check_big(doc: dict) -> None:
        _completed(doc)
        assert _echo_outs(doc) == ["big"]

    def check_small(doc: dict) -> None:
        _completed(doc)
        assert _echo_outs(doc) == ["small"]

    return Case(
        "conditionals_basic", wf.build(),
        [Launch(check_big, variables=lambda i: {"x": 10}),
         Launch(check_small, variables=lambda i: {"x": 1})],
        task_defs=["echo"])


# -- conditionals_edge_1.py -------------------------------------------------

def _conditionals_edge_1() -> Case:
    # Condition over a TASK RESULT (not an input): double x, assign,
    # then branch on the doubled value — the edge case where the
    # condition is only decidable after the feeder node completes.
    wf = Workflow("hn-conditionals-edge-1")
    t = wf.thread("entrypoint")
    t.add_variable("x", "INT", default=0)
    n = t.execute("double", x=var("x"))
    t.mutate(n, "x", "ASSIGN")
    with t.condition(var("x"), "GREATER_THAN_EQ", lit(10)).is_true():
        t.execute("echo", x=lit("ge10"))
    with t.condition(var("x"), "GREATER_THAN_EQ", lit(10)).is_false():
        t.execute("echo", x=lit("lt10"))

    def _echoes(doc: dict) -> list:
        return [tr["stdout"] for tr in _thread0(doc)["task_runs"]
                if tr["node_name"].startswith("echo")]

    def check_taken(doc: dict) -> None:
        _completed(doc)
        th = _thread0(doc)
        assert th["variables"]["x"] == 12
        assert th["task_runs"][0]["stdout"] == 12
        assert _echoes(doc) == ["ge10"]

    def check_skipped(doc: dict) -> None:
        _completed(doc)
        th = _thread0(doc)
        assert th["variables"]["x"] == 4
        assert _echoes(doc) == ["lt10"]

    return Case(
        "conditionals_edge_1", wf.build(),
        [Launch(check_taken, variables=lambda i: {"x": 6}),
         Launch(check_skipped, variables=lambda i: {"x": 2})],
        task_defs=["double", "echo"])


# -- external_event_basic.py ------------------------------------------------

def _external_event_basic() -> Case:
    wf = Workflow("hn-external-event-basic")
    t = wf.thread("entrypoint")
    t.add_variable("answer", "STRING", default="")
    n = t.wait_for_event("hn-evt")
    t.mutate(n, "answer", "ASSIGN")
    t.execute("echo", x=var("answer"))

    def check(doc: dict) -> None:
        _completed(doc)
        th = _thread0(doc)
        assert th["variables"]["answer"] == "from-the-outside"
        assert th["task_runs"][-1]["stdout"] == "from-the-outside"

    return Case(
        "external_event_basic", wf.build(),
        [Launch(check, events=[("hn-evt", "from-the-outside")])],
        task_defs=["echo"], event_defs=["hn-evt"])


# -- interrupts.py ----------------------------------------------------------
#
# The reference's interrupt cases hold the parent open with
# sleep_for(5) and trust wall-clock to land the interrupt inside the
# window — racy against a cold engine (the first read-your-writes
# barrier can outlast any fixed sleep).  Here the parent blocks on a
# `wait_for_event` gate instead: event POSTs are serialized through
# the barrier, so the interrupt is FOLDED while the parent is
# provably mid-workflow, then the gate event releases it.  Same
# interrupt semantics, zero timing dependence; the sleep/timer path
# through serve is `sleep_basic`'s job.

def _interrupts() -> Case:
    wf = Workflow("hn-interrupts")
    t = wf.thread("entrypoint")
    t.handle_interrupt("hn-int", "handler")
    t.execute("echo", x=lit("before"))
    t.wait_for_event("hn-go")
    t.execute("echo", x=lit("after"))
    h = wf.thread("handler")
    h.execute("echo", x=lit("interrupted"))
    wf.entrypoint = "entrypoint"

    def check(doc: dict) -> None:
        _completed(doc)
        assert len(doc["thread_runs"]) == 2  # parent + handler
        parent, handler = doc["thread_runs"][0], doc["thread_runs"][1]
        assert [tr["stdout"] for tr in parent["task_runs"]
                if tr["node_name"].startswith("echo")] == ["before", "after"]
        assert handler["status"] == "COMPLETED"
        assert handler["task_runs"][0]["stdout"] == "interrupted"

    return Case(
        "interrupts", wf.build(),
        [Launch(check, events=[("hn-int", {}), ("hn-go", "go")])],
        task_defs=["echo"], event_defs=["hn-int", "hn-go"])


# -- interrupts_multiple.py -------------------------------------------------

def _interrupts_multiple() -> Case:
    wf = Workflow("hn-interrupts-multiple")
    t = wf.thread("entrypoint")
    t.handle_interrupt("hn-int-a", "handler_a")
    t.handle_interrupt("hn-int-b", "handler_b")
    t.execute("echo", x=lit("start"))
    t.wait_for_event("hn-go-m")
    t.execute("echo", x=lit("end"))
    wf.thread("handler_a").execute("echo", x=lit("handled-a"))
    wf.thread("handler_b").execute("echo", x=lit("handled-b"))
    wf.entrypoint = "entrypoint"

    def check(doc: dict) -> None:
        _completed(doc)
        assert len(doc["thread_runs"]) == 3
        outs = {th["task_runs"][0]["stdout"]
                for th in doc["thread_runs"][1:]}
        assert outs == {"handled-a", "handled-b"}
        for th in doc["thread_runs"][1:]:
            assert th["status"] == "COMPLETED"

    return Case(
        "interrupts_multiple", wf.build(),
        [Launch(check, events=[("hn-int-a", {}), ("hn-int-b", {}),
                               ("hn-go-m", "go")])],
        task_defs=["echo"], event_defs=["hn-int-a", "hn-int-b", "hn-go-m"])


# -- interrupts_with_payload.py ---------------------------------------------

def _interrupts_with_payload() -> Case:
    wf = Workflow("hn-interrupts-payload")
    t = wf.thread("entrypoint")
    t.handle_interrupt("hn-int-p", "handler")
    t.execute("hello_there", name=lit("Kenobi"))
    t.wait_for_event("hn-go-p")
    t.execute("hello_there", name=lit("R2-D2"))
    h = wf.thread("handler")
    h.add_variable("Jedi", "STRING", default="")
    h.add_variable("Sith", "STRING", default="")
    h.execute("hello_there", name=var("Jedi"))
    wf.entrypoint = "entrypoint"

    def check(doc: dict) -> None:
        _completed(doc)
        parent = doc["thread_runs"][0]
        task_outs = [tr["stdout"] for tr in parent["task_runs"]
                     if tr["node_name"].startswith("hello_there")]
        assert task_outs == ["General Kenobi!", "General R2-D2!"]
        handler = doc["thread_runs"][1]
        # interrupt payload becomes the handler's input variables
        assert handler["variables"]["Jedi"] == "Obi-Wan"
        assert handler["task_runs"][0]["stdout"] == "General Obi-Wan!"

    return Case(
        "interrupts_with_payload", wf.build(),
        [Launch(check,
                events=[("hn-int-p", {"Jedi": "Obi-Wan", "Sith": "Vader"}),
                        ("hn-go-p", "go")])],
        task_defs=["hello_there"], event_defs=["hn-int-p", "hn-go-p"])


# -- stop / resume through the serve path -----------------------------------
#
# Beyond the reference's harness cases: its `lhctl` has no stop verb
# in the test set, but the engine's WF_RUN_STOP/RESUME_REQUEST
# commands (ST3) deserve an HTTP-path proof — a run halted by an
# operator must be resumable and then complete normally.

def _stop_resume() -> Case:
    wf = Workflow("hn-stop-resume")
    t = wf.thread("entrypoint")
    t.execute("echo", x=lit("before"))
    t.wait_for_event("hn-release")
    t.execute("echo", x=lit("after"))

    def check(doc: dict) -> None:
        _completed(doc)
        th = _thread0(doc)
        assert th["halt_reasons"] == []  # resume cleared MANUAL_STOP
        assert [tr["stdout"] for tr in th["task_runs"]
                if tr["node_name"].startswith("echo")] == ["before", "after"]

    return Case(
        "stop_resume", wf.build(),
        [Launch(check, actions=[
            ("stop", 0), ("await", "HALTED"),
            ("resume", 0), ("await", "RUNNING"),
            ("event", "hn-release", "go")])],
        task_defs=["echo"], event_defs=["hn-release"])


# -- sleep / native timer through the serve path ----------------------------

def _sleep_basic() -> Case:
    wf = Workflow("hn-sleep-basic")
    t = wf.thread("entrypoint")
    t.execute("echo", x=lit("before"))
    t.sleep_for(1)
    t.execute("echo", x=lit("after"))

    def check(doc: dict) -> None:
        _completed(doc)
        trs = _thread0(doc)["task_runs"]
        assert [tr["node_name"] for tr in trs] == ["echo", "sleep", "echo-1"]
        assert trs[1]["status"] == "COMPLETED"  # timer matured + folded
        assert trs[2]["stdout"] == "after"

    return Case("sleep_basic", wf.build(), [Launch(check)],
                task_defs=["echo"])


# -- retries_task.py --------------------------------------------------------

def _retries_task() -> Case:
    wf = Workflow("hn-retries-task")
    t = wf.thread("entrypoint")
    t.add_variable("marker", "STRING", default="")
    t.execute("fail_once", marker=var("marker")).with_retries(2)

    def check(doc: dict) -> None:
        _completed(doc)
        trs = _thread0(doc)["task_runs"]
        # first attempt fails, retry recovers; retries share `number`
        assert [tr["attempt_number"] for tr in trs] == [0, 1]
        assert len({tr["number"] for tr in trs}) == 1
        assert trs[0]["status"] in ("HALTED", "FAILED", "ERROR", "TIMEOUT")
        assert trs[-1]["status"] == "COMPLETED"
        assert trs[-1]["stdout"] == "recovered"

    return Case(
        "retries_task", wf.build(),
        # The marker must be unique PER LAUNCH, not per launch index:
        # the executor's _FAIL_ONCE_SEEN set is process-global, so a
        # second `cli test retries_task` against the same long-lived
        # --api server would otherwise reuse "m-0", the first attempt
        # would succeed immediately, and attempt_numbers == [0] would
        # falsely fail a correct engine (ADVICE r6).
        [Launch(check, variables=lambda i:
                {"marker": f"m-{i}-{uuid.uuid4().hex[:12]}"})],
        task_defs=["fail_once"])


# -- retries_task_timeout.py ------------------------------------------------

def _retries_task_timeout() -> Case:
    """`slow_task.with_timeout(1).with_retries(1)`
    (retries_task_timeout.py:10-34): the task never answers inside
    its window, so the LIVE timeout timer fails attempt 0, the retry
    is a real reschedule, and the second timeout halts the run.  Both
    timers fire on the engine's own wall clock — nothing in the
    harness injects TIMER_EVENTs."""
    wf = Workflow("hn-retries-timeout")
    t = wf.thread("entrypoint")
    t.execute("slow_task").with_timeout(1).with_retries(1)

    def check(doc: dict) -> None:
        assert doc["status"] == "HALTED", doc["status"]
        trs = _thread0(doc)["task_runs"]
        assert len(trs) == 2, "should have retried exactly once"
        for tr in trs:
            assert tr["status"] == "HALTED", tr["status"]
            assert tr["failure_reason"] == "TIMEOUT", tr["failure_reason"]
        assert [tr["attempt_number"] for tr in trs] == [0, 1]
        assert len({tr["number"] for tr in trs}) == 1

    return Case("retries_task_timeout", wf.build(), [Launch(check)],
                task_defs=["slow_task"])


# -- threads_basic.py -------------------------------------------------------

def _threads_basic() -> Case:
    wf = Workflow("hn-threads-basic")
    t = wf.thread("entrypoint")
    t.add_variable("x", "INT", default=0)
    sp = t.spawn_thread("child", x=var("x"))
    t.wait_for_thread(sp)
    child = wf.thread("child")
    child.add_variable("x", "INT", default=0)
    child.execute("double", x=var("x"))
    wf.entrypoint = "entrypoint"

    def check(doc: dict) -> None:
        _completed(doc)
        assert len(doc["thread_runs"]) == 2
        child_th = doc["thread_runs"][1]
        assert child_th["status"] == "COMPLETED"
        assert child_th["variables"]["x"] == 21
        assert child_th["task_runs"][0]["stdout"] == 42

    return Case(
        "threads_basic", wf.build(),
        [Launch(check, variables=lambda i: {"x": 21})],
        task_defs=["double"])


# -- var_adds.py ------------------------------------------------------------

def _var_adds() -> Case:
    wf = Workflow("hn-var-adds")
    t = wf.thread("entrypoint")
    t.add_variable("n", "INT", default=0)
    n1 = t.execute("add_one", x=var("n"))
    t.mutate(n1, "n", "ASSIGN")
    n2 = t.execute("add_one", x=var("n"))
    t.mutate(n2, "n", "ASSIGN")

    def check(doc: dict) -> None:
        _completed(doc)
        assert _thread0(doc)["variables"]["n"] == 7

    return Case(
        "var_adds", wf.build(),
        [Launch(check, variables=lambda i: {"n": 5})],
        task_defs=["add_one"])


# -- var_mutations.py -------------------------------------------------------

def _var_mutations() -> Case:
    wf = Workflow("hn-var-mutations")
    t = wf.thread("entrypoint")
    t.add_variable("count", "INT", default=10)
    t.add_variable("label", "STRING", default="run")
    n = t.execute("echo", x=lit("-done"))
    t.mutate(n, "count", "MULTIPLY", literal=3)
    t.mutate(n, "label", "ADD")  # string ADD = concat of stdout

    def check(doc: dict) -> None:
        _completed(doc)
        v = _thread0(doc)["variables"]
        assert v["count"] == 30
        assert v["label"] == "run-done"

    return Case("var_mutations", wf.build(), [Launch(check)],
                task_defs=["echo"])


# -- var_assign_jsonpath_happy.py -------------------------------------------

def _var_assign_jsonpath_happy() -> Case:
    wf = Workflow("hn-var-jsonpath")
    t = wf.thread("entrypoint")
    t.add_variable("extracted", "INT", default=0)
    n = t.execute("make_json", seed=lit(2))
    t.mutate(n, "extracted", "ASSIGN", json_path="$.x")

    def check(doc: dict) -> None:
        _completed(doc)
        assert _thread0(doc)["variables"]["extracted"] == 42

    return Case("var_assign_jsonpath_happy", wf.build(), [Launch(check)],
                task_defs=["make_json"])


def all_cases() -> dict[str, Case]:
    built = [
        _basic(), _conditionals_basic(), _conditionals_edge_1(),
        _external_event_basic(), _interrupts(), _interrupts_multiple(),
        _interrupts_with_payload(), _retries_task(),
        _retries_task_timeout(), _sleep_basic(), _stop_resume(),
        _threads_basic(), _var_adds(), _var_mutations(),
        _var_assign_jsonpath_happy(),
    ]
    return {c.name: c for c in built}
