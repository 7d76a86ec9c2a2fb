"""Engine-fold unit tests mirroring the reference integration harness
(`lhctl/lh_test_harness/tests/*` — see SURVEY.md §5, FIXTURES.md §6).

No Spark: the fold is pure Python, which is exactly the testing lever
the batch/streaming engines then reuse.
"""

from __future__ import annotations

import json

from old_original_java_little_horse_spark.engine import fold as E
from old_original_java_little_horse_spark.sdk.builder import Workflow, lit, var


# ---------------------------------------------------------------------------
# Inline task executor (shared_tasks.py equivalents, deterministic)
# ---------------------------------------------------------------------------

def executor(task_def_name: str, subs: dict) -> dict:
    if task_def_name == "echo":
        return {"stdout": str(subs["x"]), "success": True, "returncode": 0}
    if task_def_name == "echo_int":
        return {"stdout": json.dumps(subs["x"]), "success": True, "returncode": 0}
    if task_def_name == "echo_float":
        return {"stdout": json.dumps(subs["x"]), "success": True, "returncode": 0}
    if task_def_name == "increment":
        return {"stdout": json.dumps(subs["x"] + 1), "success": True, "returncode": 0}
    if task_def_name == "big_blob":
        return {"stdout": json.dumps({
            "some_blob": {"some_int": 1, "some_float": 2.5, "some_bool": False},
            "some_list": [1, 2, 3, 4],
            "some_str": "Hello, there!",
        }), "success": True, "returncode": 0}
    if task_def_name == "fail_n_times":
        # Deterministic retry driver: fails while attempt < subs["n"].
        ok = subs["attempt"] >= subs["n"]
        return {"stdout": "ok" if ok else None,
                "stderr": None if ok else "boom",
                "success": ok, "returncode": 0 if ok else 1}
    raise AssertionError(f"unknown task {task_def_name}")


def started_ev(run_id, thread_id, pos, ts=1000, offset=0):
    return {"wf_run_id": run_id, "event_type": "TASK_EVENT", "thread_id": thread_id,
            "timestamp": ts, "offset": offset,
            "content": {"thread_id": thread_id, "task_run_position": pos,
                        "started_event": {"worker_id": "w1", "stdin": None}}}


def ended_ev(run_id, thread_id, pos, stdout, ts=1000, offset=0, success=True):
    return {"wf_run_id": run_id, "event_type": "TASK_EVENT", "thread_id": thread_id,
            "timestamp": ts, "offset": offset,
            "content": {"thread_id": thread_id, "task_run_position": pos,
                        "ended_event": {"result": {
                            "stdout": stdout, "stderr": None if success else "err",
                            "success": success, "returncode": 0 if success else 1}}}}


def start_ev(run_id, variables=None, ts=1000):
    return {"wf_run_id": run_id, "wf_spec_id": "s", "wf_spec_name": "s",
            "event_type": "WF_RUN_STARTED", "thread_id": 0, "timestamp": ts,
            "offset": 0, "content": {"variables": variables or {}}}


def run_inline(spec, variables=None):
    state, ctx = E.process_event(spec, None, start_ev("r1", variables),
                                 executor=executor)
    return state


# ---------------------------------------------------------------------------
# basic.py:11-35 — linear task chain
# ---------------------------------------------------------------------------

def basic_spec():
    wf = Workflow("basic")
    t = wf.thread("entrypoint")
    t.execute("echo", x="Hello, there!")
    return wf.build()


def test_basic_completed():
    state = run_inline(basic_spec())
    assert state["status"] == "COMPLETED"
    assert len(state["thread_runs"]) == 1
    trs = state["thread_runs"][0]["task_runs"]
    assert len(trs) == 1
    assert trs[0]["stdout"] == "Hello, there!"
    assert trs[0]["status"] == "COMPLETED"


def test_basic_async_events():
    """Same workflow driven by explicit worker events (no inline exec)."""
    spec = basic_spec()
    state, ctx = E.process_event(spec, None, start_ev("r1"))
    assert len(ctx.to_schedule) == 1
    tsr = ctx.to_schedule[0]
    assert tsr["task_def_name"] == "echo"
    assert tsr["variable_substitutions"] == {"x": "Hello, there!"}
    state, _ = E.process_event(spec, state, started_ev("r1", 0, 0, offset=1))
    assert state["thread_runs"][0]["task_runs"][0]["status"] == "RUNNING"
    state, _ = E.process_event(spec, state, ended_ev("r1", 0, 0, "Hello, there!", offset=2))
    assert state["status"] == "COMPLETED"


# ---------------------------------------------------------------------------
# conditionals_basic.py:23-142 — nested if/else + IN
# ---------------------------------------------------------------------------

def conditionals_spec():
    wf = Workflow("conditionals")
    t = wf.thread("entrypoint")
    t.add_variable("my_int", "INT")
    t.execute("echo", x="ENTRYPOINT")
    gt0 = t.condition(var("my_int"), "GREATER_THAN", 0)
    with gt0.is_true():
        under10 = t.condition(var("my_int"), "LESS_THAN", 10)
        with under10.is_true():
            t.execute("echo", x="UNDER_TEN")
        with under10.is_false():
            t.execute("echo", x="TEN_OR_MORE")
        lucky = t.condition(var("my_int"), "IN", [42, 137])
        with lucky.is_true():
            t.execute("echo", x="FEELING_LUCKY")
    t.execute("echo", x="MERGER")
    eq20 = t.condition(var("my_int"), "EQUALS", 20)
    with eq20.is_true():
        t.execute("echo", x="COLT")
    return wf.build()


EXPECTED_CONDITIONAL_TASKS = {
    -10: ["ENTRYPOINT", "MERGER"],
    0: ["ENTRYPOINT", "MERGER"],
    2: ["ENTRYPOINT", "UNDER_TEN", "MERGER"],
    10: ["ENTRYPOINT", "TEN_OR_MORE", "MERGER"],
    15: ["ENTRYPOINT", "TEN_OR_MORE", "MERGER"],
    42: ["ENTRYPOINT", "TEN_OR_MORE", "FEELING_LUCKY", "MERGER"],
    20: ["ENTRYPOINT", "TEN_OR_MORE", "MERGER", "COLT"],
    137: ["ENTRYPOINT", "TEN_OR_MORE", "FEELING_LUCKY", "MERGER"],
    1888: ["ENTRYPOINT", "TEN_OR_MORE", "MERGER"],
}


def test_conditionals_branching():
    spec = conditionals_spec()
    for my_int, expected in EXPECTED_CONDITIONAL_TASKS.items():
        state = run_inline(spec, {"my_int": my_int})
        assert state["status"] == "COMPLETED", (my_int, state["status"])
        stdouts = [tr["stdout"] for tr in state["thread_runs"][0]["task_runs"]
                   if tr["node_name"].startswith("echo")]
        assert stdouts == expected, (my_int, stdouts)


# ---------------------------------------------------------------------------
# var_mutations.py:11-120 — every mutation op + forced VarSubOrzDash
# ---------------------------------------------------------------------------

def var_mutations_spec():
    wf = Workflow("var_mutations")
    t = wf.thread("entrypoint")
    t.add_variable("my_int", "INT")
    t.add_variable("my_bool", "BOOLEAN")
    t.add_variable("my_list", "ARRAY")
    t.add_variable("my_str", "STRING")
    t.add_variable("my_float", "FLOAT")
    t.add_variable("my_obj", "OBJECT")

    n1 = t.execute("echo", x="dummy")
    t.mutate(n1, "my_int", "ASSIGN", source=var("my_obj", "$.my_int"))
    t.mutate(n1, "my_str", "ADD")  # rhs = stdout

    n2 = t.execute("echo_int", x=3)
    t.mutate(n2, "my_int", "SUBTRACT")
    t.mutate(n2, "my_list", "ADD", source=var("my_obj", "$.some_thing"))

    n3 = t.execute("echo_float", x=-2.5)
    t.mutate(n3, "my_float", "ADD")
    t.mutate(n3, "my_list", "REMOVE_INDEX", literal=2)
    t.mutate(n3, "my_bool", "ASSIGN", source=var("my_obj", "$.my_bool"))
    t.mutate(n3, "my_obj", "REMOVE_KEY", literal=1234)
    t.mutate(n3, "my_list", "REMOVE_IF_PRESENT", literal="asdf")
    return wf.build()


def test_var_mutations_happy():
    state = run_inline(var_mutations_spec(), {
        "my_obj": {"some_thing": [1, 2, 3], "my_bool": True, "my_int": 50,
                   "1234": "not in the thing"},
        "my_list": [],
        "my_float": 3.2,
    })
    assert state["status"] == "COMPLETED"
    vs = state["thread_runs"][0]["variables"]
    assert vs["my_int"] == 47
    assert vs["my_bool"] is True
    assert vs["my_list"] == [[1, 2, 3]]
    assert vs["my_str"] == "dummy"
    assert "1234" not in vs["my_obj"]
    assert vs["my_float"] == 3.2 - 2.5


def test_var_mutations_missing_jsonpath():
    state = run_inline(var_mutations_spec(), {
        "my_obj": {"some_thing": [1, 2, 3], "my_bool": True},
        "my_list": [], "my_float": 3.2,
    })
    assert state["status"] == "HALTED"
    thr = state["thread_runs"][0]
    assert "jsonpath" in thr["error_message"]
    tr = thr["task_runs"][0]
    assert tr["status"] == "HALTED"
    assert tr["failure_reason"] == "VARIABLE_LOOKUP_ERROR"


def test_var_mutations_wrong_type():
    state = run_inline(var_mutations_spec(), {
        "my_obj": {"my_int": "not a real int"},
        "my_list": [], "my_float": 3.2,
    })
    assert state["status"] == "HALTED"
    assert "my_int" in state["thread_runs"][0]["error_message"]


# ---------------------------------------------------------------------------
# var_adds.py / var_assign_jsonpath_happy.py — EXTEND, jsonpath slices
# ---------------------------------------------------------------------------

def test_jsonpath_assignments():
    wf = Workflow("jsonpath")
    t = wf.thread("entrypoint")
    t.add_variable("an_int", "INT")
    t.add_variable("a_float", "FLOAT")
    t.add_variable("a_bool", "BOOLEAN")
    t.add_variable("a_str", "STRING")
    t.add_variable("second_item", "INT")
    n = t.execute("big_blob", x=lit(0))
    t.mutate(n, "an_int", "ASSIGN", json_path="$.some_blob.some_int")
    t.mutate(n, "a_float", "ASSIGN", json_path="$.some_blob.some_float")
    t.mutate(n, "a_bool", "ASSIGN", json_path="$.some_blob.some_bool")
    t.mutate(n, "a_str", "ASSIGN", json_path="$.some_str")
    t.mutate(n, "second_item", "ASSIGN", json_path="$.some_list[1]")
    state = run_inline(wf.build())
    vs = state["thread_runs"][0]["variables"]
    assert state["status"] == "COMPLETED"
    assert vs == {"an_int": 1, "a_float": 2.5, "a_bool": False,
                  "a_str": "Hello, there!", "second_item": 2}


def _var_adds_spec():
    """The FULL var_adds.py workflow: EXTEND + jsonpath ADD, then a
    literal ADD and REMOVE_IF_PRESENT on a second node."""
    wf = Workflow("var_adds")
    t = wf.thread("entrypoint")
    t.add_variable("arr", "ARRAY", default=[])
    t.add_variable("counter", "INT", default=-1)
    n = t.execute("big_blob", x=lit(0))
    t.mutate(n, "arr", "EXTEND", json_path="$.some_list")
    t.mutate(n, "counter", "ADD", json_path="$.some_list[1]")
    n2 = t.execute("echo", x=lit("Hello, there!"))
    t.mutate(n2, "counter", "ADD", literal=1)
    t.mutate(n2, "arr", "REMOVE_IF_PRESENT", literal=4)
    return wf.build()


def test_extend_and_defaults():
    # var_adds.py check_var_adds_1: defaults ([], -1)
    state = run_inline(_var_adds_spec())
    vs = state["thread_runs"][0]["variables"]
    assert state["status"] == "COMPLETED"
    assert vs["arr"] == [1, 2, 3]   # EXTEND [1,2,3,4], then remove 4
    assert vs["counter"] == 2       # -1 + 2 + 1


def test_var_adds_with_inputs():
    # var_adds.py check_var_adds_2: arr=[5,4,3,2], counter=0 —
    # REMOVE_IF_PRESENT drops EVERY occurrence of 4.
    state = run_inline(_var_adds_spec(),
                       variables={"arr": [5, 4, 3, 2], "counter": 0})
    vs = state["thread_runs"][0]["variables"]
    assert state["status"] == "COMPLETED"
    assert vs["arr"] == [5, 3, 2, 1, 2, 3]
    assert vs["counter"] == 3


# ---------------------------------------------------------------------------
# threads_basic.py:20-69 — children mutate shared parent var under locks
# ---------------------------------------------------------------------------

def threads_basic_spec():
    wf = Workflow("threads_basic")
    t = wf.thread("entrypoint")
    t.add_variable("input_var", "INT")
    t.add_variable("parent_var", "INT")

    n1 = t.execute("increment", x=var("input_var"))
    t.mutate(n1, "parent_var", "ASSIGN")

    c1 = t.spawn_thread("subthread")
    c2 = t.spawn_thread("subthread")
    c3 = t.spawn_thread("bigger_subthread")
    t.wait_for_thread(c1)
    t.wait_for_thread(c2)
    t.wait_for_thread(c3)

    n2 = t.execute("increment", x=2)
    t.mutate(n2, "parent_var", "DIVIDE")

    sub = wf.thread("subthread")
    s1 = sub.execute("increment", x=12)
    sub.mutate(s1, "parent_var", "ADD")  # +13

    big = wf.thread("bigger_subthread")
    b1 = big.execute("increment", x=4)
    big.mutate(b1, "parent_var", "SUBTRACT")  # -5

    wf.entrypoint = "entrypoint"
    return wf.build()


def test_threads_basic():
    spec = threads_basic_spec()
    for i in range(-20, 20):
        state = run_inline(spec, {"input_var": i})
        assert len(state["thread_runs"]) == 4, (i, len(state["thread_runs"]))
        for tr in state["thread_runs"]:
            assert tr["status"] == "COMPLETED", (i, tr)
        parent_var = state["thread_runs"][0]["variables"]["parent_var"]
        expected = int(((i + 1) + 13 + 13 - 5) / 3)
        assert parent_var == expected, (i, parent_var, expected)
        assert state["status"] == "COMPLETED"


# ---------------------------------------------------------------------------
# retries_task.py:256-303 — retries share number, attempt increments
# ---------------------------------------------------------------------------

def retries_spec(n_fail: int):
    wf = Workflow("retries")
    t = wf.thread("entrypoint")
    t.add_variable("attempts", "INT", default=0)
    n = t.execute("fail_n_times", attempt=var("attempts"), n=lit(n_fail))
    n.with_retries(2)
    t.mutate(n, "attempts", "ADD", literal=1)
    return wf.build()


def test_retries_eventually_succeeds():
    """Task fails twice then succeeds on third attempt (2 retries allowed)."""
    spec = retries_spec(2)
    # attempts counter only increments on success (mutations run on
    # success only), so drive attempt number via the task's attempt arg.
    state, ctx = E.process_event(spec, None, start_ev("r1"))
    for offset in range(1, 10):
        if not ctx.to_schedule:
            break
        tsr = ctx.to_schedule[0]
        attempt = tsr["attempt_number"]
        ok = attempt >= 2
        state, ctx = E.process_event(
            spec, state,
            ended_ev("r1", 0, tsr["task_run_position"], "ok" if ok else None,
                     offset=offset, success=ok))
    trs = state["thread_runs"][0]["task_runs"]
    assert [t["attempt_number"] for t in trs] == [0, 1, 2]
    assert len({t["number"] for t in trs}) == 1  # retries share number
    assert [t["position"] for t in trs] == [0, 1, 2]
    assert trs[-1]["status"] == "COMPLETED"
    assert state["status"] == "COMPLETED"


def test_retries_exhausted_halts():
    spec = retries_spec(5)  # needs 5 failures; only 3 attempts allowed
    state, ctx = E.process_event(spec, None, start_ev("r1"))
    for offset in range(1, 10):
        if not ctx.to_schedule:
            break
        tsr = ctx.to_schedule[0]
        state, ctx = E.process_event(
            spec, state,
            ended_ev("r1", 0, tsr["task_run_position"], None,
                     offset=offset, success=False))
    trs = state["thread_runs"][0]["task_runs"]
    assert len(trs) == 3
    assert state["status"] == "HALTED"
    assert trs[-1]["failure_reason"] == "TASK_FAILURE"


# ---------------------------------------------------------------------------
# external_event_basic.py:89-134 — wait_for_event with timeout
# ---------------------------------------------------------------------------

def external_event_spec():
    wf = Workflow("ext")
    t = wf.thread("entrypoint")
    t.add_variable("my_var", "STRING")
    n = t.wait_for_event("my-name")
    n.with_timeout(3)
    t.mutate(n, "my_var", "ASSIGN")
    return wf.build()


def ext_event(run_id, name, content, ts=2000, offset=1):
    return {"wf_run_id": run_id, "event_type": "EXTERNAL_EVENT", "thread_id": -1,
            "timestamp": ts, "offset": offset,
            "content": {"external_event_def_name": name, "content": content,
                        "timestamp": ts}}


def test_external_event_arrives():
    spec = external_event_spec()
    state, ctx = E.process_event(spec, None, start_ev("r1"))
    assert state["status"] == "RUNNING"
    assert len(ctx.timers) == 1  # the timeout timer
    state, _ = E.process_event(spec, state, ext_event("r1", "my-name", "GENERAL KENOBI"))
    assert state["status"] == "COMPLETED"
    assert state["thread_runs"][0]["variables"]["my_var"] == "GENERAL KENOBI"


def test_external_event_timeout():
    spec = external_event_spec()
    state, ctx = E.process_event(spec, None, start_ev("r1"))
    timer = ctx.timers[0]
    assert timer["maturation_timestamp"] == 1000 + 3000
    timer_event = {"wf_run_id": "r1", "event_type": "TIMER_EVENT", "thread_id": 0,
                   "timestamp": 4000, "offset": 1, "content": timer}
    state, _ = E.process_event(spec, state, timer_event)
    assert state["status"] == "HALTED"
    tr = state["thread_runs"][0]["task_runs"][0]
    assert tr["failure_reason"] == "TIMEOUT"


def test_external_event_before_node_is_buffered():
    """FIFO correlation: events arriving early are buffered and matched
    1:1 in arrival order (WFRun.java:181-199)."""
    wf = Workflow("ext2")
    t = wf.thread("entrypoint")
    t.add_variable("a", "STRING")
    t.add_variable("b", "STRING")
    n1 = t.wait_for_event("evt")
    t.mutate(n1, "a", "ASSIGN")
    n2 = t.wait_for_event("evt")
    t.mutate(n2, "b", "ASSIGN")
    spec = wf.build()

    state, _ = E.process_event(spec, None, start_ev("r1"))
    state, _ = E.process_event(spec, state, ext_event("r1", "evt", "first", offset=1))
    state, _ = E.process_event(spec, state, ext_event("r1", "evt", "second", offset=2))
    assert state["status"] == "COMPLETED"
    vs = state["thread_runs"][0]["variables"]
    assert vs == {"a": "first", "b": "second"}


# ---------------------------------------------------------------------------
# interrupts.py:23-60 — interrupt handler thread; parent resumes
# ---------------------------------------------------------------------------

def interrupts_spec():
    wf = Workflow("interrupts")
    t = wf.thread("entrypoint")
    t.add_variable("interrupt_count", "INT", default=0)
    t.handle_interrupt("some-event", "handler")
    t.execute("echo", x="task1")
    t.sleep_for(5)
    t.execute("echo", x="task2")

    h = wf.thread("handler")
    hn = h.execute("echo", x="handling")
    h.mutate(hn, "interrupt_count", "ADD", literal=1)
    wf.entrypoint = "entrypoint"
    return wf.build()


def test_interrupt_mid_sleep():
    spec = interrupts_spec()
    state, ctx = E.process_event(spec, None, start_ev("r1"), executor=executor)
    # task1 done inline; now sleeping.
    assert state["status"] == "RUNNING"
    sleep_timer = ctx.timers[0]

    # Interrupt arrives mid-sleep.
    state, _ = E.process_event(spec, state, ext_event("r1", "some-event", "{}"),
                               executor=executor)
    assert len(state["thread_runs"]) == 2
    handler = state["thread_runs"][1]
    assert handler["is_interrupt_thread"]
    assert handler["status"] == "COMPLETED"  # handler ran inline
    # Parent is halting until the sleep node terminates.
    assert state["thread_runs"][0]["status"] == "HALTING"

    # Sleep matures → parent resumes → task2 runs → completes.
    timer_event = {"wf_run_id": "r1", "event_type": "TIMER_EVENT", "thread_id": 0,
                   "timestamp": 7000, "offset": 2, "content": sleep_timer}
    state, _ = E.process_event(spec, state, timer_event, executor=executor)
    assert state["status"] == "COMPLETED"
    assert state["thread_runs"][0]["variables"]["interrupt_count"] == 1
    stdouts = [tr["stdout"] for tr in state["thread_runs"][0]["task_runs"]]
    assert "task2" in stdouts


# ---------------------------------------------------------------------------
# Stop / resume (WFRun.java:221-243)
# ---------------------------------------------------------------------------

def test_stop_resume():
    spec = basic_spec()
    state, ctx = E.process_event(spec, None, start_ev("r1"))
    stop = {"wf_run_id": "r1", "event_type": "WF_RUN_STOP_REQUEST", "thread_id": 0,
            "timestamp": 1500, "offset": 1, "content": {}}
    state, _ = E.process_event(spec, state, stop)
    assert state["status"] in ("HALTING", "HALTED")
    resume = {"wf_run_id": "r1", "event_type": "WF_RUN_RESUME_REQUEST", "thread_id": 0,
              "timestamp": 1600, "offset": 2, "content": {}}
    state, _ = E.process_event(spec, state, resume)
    assert state["status"] == "RUNNING"
    state, _ = E.process_event(spec, state, ended_ev("r1", 0, 0, "done", offset=3))
    assert state["status"] == "COMPLETED"


# ---------------------------------------------------------------------------
# THROW_EXCEPTION + stale-result guard
# ---------------------------------------------------------------------------

def test_throw_exception():
    wf = Workflow("thrower")
    t = wf.thread("entrypoint")
    t.execute("echo", x="before")
    t.throw_exception("my-exception")
    state = run_inline(wf.build())
    assert state["status"] == "HALTED"
    assert state["thread_runs"][0]["exception_name"] == "my-exception"


def test_stale_task_result_dropped():
    """A result for a task that already timed out is ignored
    (ThreadRun.java:375-391)."""
    wf = Workflow("stale")
    t = wf.thread("entrypoint")
    t.add_variable("out", "STRING")
    n = t.execute("echo", x="slow")
    n.with_timeout(1)
    t.mutate(n, "out", "ASSIGN")
    spec = wf.build()

    state, ctx = E.process_event(spec, None, start_ev("r1"))
    timer = ctx.timers[0]
    timer_event = {"wf_run_id": "r1", "event_type": "TIMER_EVENT", "thread_id": 0,
                   "timestamp": 3000, "offset": 1, "content": timer}
    state, _ = E.process_event(spec, state, timer_event)
    assert state["thread_runs"][0]["task_runs"][0]["failure_reason"] == "TIMEOUT"
    # Late result arrives — must be dropped.
    state, _ = E.process_event(spec, state, ended_ev("r1", 0, 0, "late!", offset=2))
    assert state["thread_runs"][0]["task_runs"][0]["failure_reason"] == "TIMEOUT"
    assert state["thread_runs"][0]["variables"]["out"] is None


# ---------------------------------------------------------------------------
# WAIT_FOR_THREAD failure paths (ThreadRun.java:1038-1070)
# ---------------------------------------------------------------------------

def test_wait_for_failed_child_subthread_failure():
    """Child thread throws; parent's wait node fails with
    SUBTHREAD_FAILURE when no handler is attached."""
    wf = Workflow("subfail")
    t = wf.thread("entrypoint")
    c = t.spawn_thread("child")
    t.wait_for_thread(c)
    ch = wf.thread("child")
    ch.throw_exception("kaboom")
    wf.entrypoint = "entrypoint"
    state = run_inline(wf.build())
    assert state["status"] == "HALTED"
    parent = state["thread_runs"][0]
    wait_tr = [tr for tr in parent["task_runs"] if tr["node_name"] == "wait-thread"][0]
    assert wait_tr["failure_reason"] == "SUBTHREAD_FAILURE"
    assert state["thread_runs"][1]["exception_name"] == "kaboom"


def test_wait_for_failed_child_with_exception_handler():
    """catch_exception routes the named child exception to a handler
    thread instead of failing the run outright."""
    wf = Workflow("subhandled")
    t = wf.thread("entrypoint")
    t.add_variable("handled", "INT", default=0)
    c = t.spawn_thread("child")
    w = t.wait_for_thread(c)
    w.catch_exception("handler", exception_name="kaboom")
    ch = wf.thread("child")
    ch.throw_exception("kaboom")
    h = wf.thread("handler")
    hn = h.execute("echo", x="handled!")
    h.mutate(hn, "handled", "ADD", literal=1)
    wf.entrypoint = "entrypoint"
    state = run_inline(wf.build())
    # The handler thread ran to completion.
    handlers = [t for t in state["thread_runs"]
                if t["thread_spec_name"] == "handler"]
    assert len(handlers) == 1
    assert handlers[0]["status"] == "COMPLETED"
    assert state["thread_runs"][0]["variables"]["handled"] == 1


def test_interrupt_with_payload():
    """interrupts_with_payload.py: the interrupt payload's keys become
    the handler thread's input variables (LHUtil.unsplat)."""
    wf = Workflow("irq-payload")
    t = wf.thread("entrypoint")
    t.add_variable("seen", "STRING", default="")
    t.handle_interrupt("some-event", "handler")
    t.execute("echo", x="task1")
    t.sleep_for(5)

    h = wf.thread("handler")
    h.add_variable("some_input", "STRING", default="")
    hn = h.execute("echo", x=var("some_input"))
    h.mutate(hn, "seen", "ASSIGN")
    wf.entrypoint = "entrypoint"
    spec = wf.build()

    state, ctx = E.process_event(spec, None, start_ev("r1"), executor=executor)
    payload = {"wf_run_id": "r1", "event_type": "EXTERNAL_EVENT", "thread_id": -1,
               "timestamp": 2000, "offset": 1,
               "content": {"external_event_def_name": "some-event",
                           "content": {"some_input": "BOLD ONE"},
                           "timestamp": 2000}}
    state, _ = E.process_event(spec, state, payload, executor=executor)
    handler = state["thread_runs"][1]
    assert handler["is_interrupt_thread"]
    assert handler["status"] == "COMPLETED"
    assert handler["variables"]["some_input"] == "BOLD ONE"
    assert state["thread_runs"][0]["variables"]["seen"] == "BOLD ONE"


def test_duplicate_ended_event_is_idempotent():
    """At-least-once delivery: a replayed TASK ended event must not
    re-apply variable mutations (double ADD) or alter the task."""
    wf = Workflow("dup")
    t = wf.thread("entrypoint")
    t.add_variable("n", "INT", default=0)
    n1 = t.execute("echo", x="go")
    t.mutate(n1, "n", "ADD", literal=5)
    spec = wf.build()

    state, _ = E.process_event(spec, None, start_ev("r1"))
    state, _ = E.process_event(spec, state, ended_ev("r1", 0, 0, "go", offset=1))
    assert state["thread_runs"][0]["variables"]["n"] == 5
    # Replay the same ended event (source replay after failure).
    state, _ = E.process_event(spec, state, ended_ev("r1", 0, 0, "go", offset=1))
    assert state["thread_runs"][0]["variables"]["n"] == 5  # not 10
    assert state["status"] == "COMPLETED"
    assert len(state["thread_runs"][0]["task_runs"]) == 1


def test_no_aliasing_between_variables():
    """lhCopy parity (LHUtil.java:206-235): after `my_list ADD
    my_obj.$.arr`, further mutations of my_obj must not leak into
    my_list (no shared references across variables)."""
    wf = Workflow("alias")
    t = wf.thread("entrypoint")
    t.add_variable("my_obj", "OBJECT")
    t.add_variable("my_list", "ARRAY", default=[])
    n1 = t.execute("echo", x="a")
    t.mutate(n1, "my_list", "ADD", source=var("my_obj", "$.arr"))
    n2 = t.execute("echo", x="b")
    t.mutate(n2, "my_obj", "REMOVE_KEY", literal="arr")
    spec = wf.build()
    state = run_inline(spec, {"my_obj": {"arr": [1, 2], "keep": "x"}})
    vs = state["thread_runs"][0]["variables"]
    assert state["status"] == "COMPLETED"
    assert vs["my_list"] == [[1, 2]]          # captured value survives
    assert vs["my_obj"] == {"keep": "x"}      # key removed from obj only


# ---------------------------------------------------------------------------
# interrupts_multiple.py:17-92 — two registered interrupts on one thread
# ---------------------------------------------------------------------------

def interrupts_multiple_spec():
    """interrupts_multiple.py:28-33: two handle_interrupt registrations,
    then a task and a sleep on the parent."""
    wf = Workflow("interrupts-multiple")
    t = wf.thread("entrypoint")
    t.handle_interrupt("some-event", "some_event_handler")
    t.handle_interrupt("another-event", "another_event_handler")
    t.execute("echo", x="Hello there, R2-D2!")
    t.sleep_for(5)

    h1 = wf.thread("some_event_handler")
    h1.execute("echo", x="Hello there, General Kenobi!")
    h2 = wf.thread("another_event_handler")
    h2.execute("echo", x="Hello there, Padawan!")
    wf.entrypoint = "entrypoint"
    return wf.build()


def _drive_interrupts_multiple(event_name: str, expected_stdout: str):
    """launch/check_interrupts_multiple_{0,1}: send ONE of the two
    registered events mid-sleep; the matching handler thread runs and
    the parent resumes + completes when the sleep matures."""
    spec = interrupts_multiple_spec()
    state, ctx = E.process_event(spec, None, start_ev("r1"), executor=executor)
    sleep_timer = ctx.timers[0]
    state, _ = E.process_event(spec, state,
                               ext_event("r1", event_name, "hola"),
                               executor=executor)
    timer_event = {"wf_run_id": "r1", "event_type": "TIMER_EVENT",
                   "thread_id": 0, "timestamp": 7000, "offset": 2,
                   "content": sleep_timer}
    state, _ = E.process_event(spec, state, timer_event, executor=executor)

    # check_interrupts_multiple_*: 2 thread runs, parent has the R2
    # task + the sleep node, handler ran exactly its one task.
    assert state["status"] == "COMPLETED"
    assert len(state["thread_runs"]) == 2
    thr = state["thread_runs"][0]
    assert len(thr["task_runs"]) == 2
    assert thr["task_runs"][0]["stdout"] == "Hello there, R2-D2!"
    assert all(t["status"] == "COMPLETED" for t in thr["task_runs"])
    handler = state["thread_runs"][1]
    assert handler["status"] == "COMPLETED"
    assert len(handler["task_runs"]) == 1
    assert handler["task_runs"][0]["status"] == "COMPLETED"
    assert handler["task_runs"][0]["stdout"] == expected_stdout
    return state


def test_interrupts_multiple_first_event():
    _drive_interrupts_multiple("some-event", "Hello there, General Kenobi!")


def test_interrupts_multiple_second_event():
    _drive_interrupts_multiple("another-event", "Hello there, Padawan!")


# ---------------------------------------------------------------------------
# retries_task_timeout.py:10-34 — retry × timeout interaction
# ---------------------------------------------------------------------------

def test_retries_task_timeout():
    """A task that never reports (slow_task) times out, is retried once,
    and times out again: run HALTED with two TIMEOUT task runs
    (retries_task_timeout.py:20-34)."""
    wf = Workflow("retries-timeout")
    t = wf.thread("entrypoint")
    t.execute("slow").with_timeout(1).with_retries(1)
    spec = wf.build()

    # No executor: the worker never responds, only timers fire.
    state, ctx = E.process_event(spec, None, start_ev("r1"))
    assert len(ctx.to_schedule) == 1 and len(ctx.timers) == 1
    assert ctx.timers[0]["maturation_timestamp"] == 1000 + 1000

    state, ctx = E.process_event(spec, state, {
        "wf_run_id": "r1", "event_type": "TIMER_EVENT", "thread_id": 0,
        "timestamp": 2000, "offset": 1, "content": ctx.timers[0]})
    # First attempt timed out; the retry is scheduled with its own
    # timeout timer.
    assert len(ctx.to_schedule) == 1 and len(ctx.timers) == 1
    assert ctx.to_schedule[0]["attempt_number"] == 1

    state, ctx = E.process_event(spec, state, {
        "wf_run_id": "r1", "event_type": "TIMER_EVENT", "thread_id": 0,
        "timestamp": 3000, "offset": 2, "content": ctx.timers[0]})
    assert not ctx.to_schedule

    assert state["status"] == "HALTED"
    trs = state["thread_runs"][0]["task_runs"]
    assert len(trs) == 2, "should have retried exactly once"
    for tr in trs:
        assert tr["status"] == "HALTED"
        assert tr["failure_reason"] == "TIMEOUT"
    assert len({t["number"] for t in trs}) == 1  # retries share number


def test_retry_after_timeout_can_succeed():
    """The retry attempt is a real schedule: a worker answering the
    second attempt completes the run (timeout ∧ retry interaction, not
    just double-failure)."""
    wf = Workflow("retries-timeout-ok")
    t = wf.thread("entrypoint")
    t.execute("slow").with_timeout(1).with_retries(1)
    spec = wf.build()

    state, ctx = E.process_event(spec, None, start_ev("r1"))
    state, ctx = E.process_event(spec, state, {
        "wf_run_id": "r1", "event_type": "TIMER_EVENT", "thread_id": 0,
        "timestamp": 2000, "offset": 1, "content": ctx.timers[0]})
    retry = ctx.to_schedule[0]
    state, ctx = E.process_event(
        spec, state,
        ended_ev("r1", 0, retry["task_run_position"], "made it", offset=2))
    assert state["status"] == "COMPLETED"
    trs = state["thread_runs"][0]["task_runs"]
    assert [t["failure_reason"] for t in trs] == ["TIMEOUT", None]
    assert trs[-1]["stdout"] == "made it"
    # The stale timeout timer for the completed attempt is a no-op.
    leftover = [t for t in ctx.timers]
    for t in leftover:
        state, _ = E.process_event(spec, state, {
            "wf_run_id": "r1", "event_type": "TIMER_EVENT", "thread_id": 0,
            "timestamp": 4000, "offset": 3, "content": t})
    assert state["status"] == "COMPLETED"


def test_inline_executor_none_means_started_never_answered():
    """An inline executor returning None folds ONLY the started event:
    the task goes RUNNING (worker_id recorded), no result arrives, and
    the timeout timer armed at scheduling later TIMEOUTs it — the
    contract the harness's retries_task_timeout case runs on."""
    wf = Workflow("inline-none")
    t = wf.thread("entrypoint")
    t.execute("slow").with_timeout(1).with_retries(0)
    spec = wf.build()

    calls = []

    def hung(name, subs):
        calls.append(name)
        return None

    state, ctx = E.process_event(spec, None, start_ev("r1"), executor=hung)
    assert calls == ["slow"]
    tr = state["thread_runs"][0]["task_runs"][0]
    assert tr["status"] == "RUNNING" and tr["worker_id"] == "inline"
    assert state["status"] == "RUNNING"
    assert len(ctx.timers) == 1  # the timeout timer survives the drain

    state, ctx = E.process_event(spec, state, {
        "wf_run_id": "r1", "event_type": "TIMER_EVENT", "thread_id": 0,
        "timestamp": 2000, "offset": 1, "content": ctx.timers[0]},
        executor=hung)
    assert calls == ["slow"]  # no retries -> no second attempt
    tr = state["thread_runs"][0]["task_runs"][0]
    assert tr["status"] == "HALTED" and tr["failure_reason"] == "TIMEOUT"
    assert state["status"] == "HALTED"


# ---------------------------------------------------------------------------
# conditionals_edge_1.py:24-90 — single-branch if + merge task; bad input
# ---------------------------------------------------------------------------

def conditionals_edge_spec():
    wf = Workflow("conditionals-edge")
    t = wf.thread("entrypoint")
    t.add_variable("my_int", "INT")
    with t.condition(var("my_int"), "GREATER_THAN", lit(10)).is_true():
        t.execute("echo", x="Its 10 or more!")
    t.execute("echo", x="This task should execute on all WFRun's.")
    return wf.build()


def test_conditionals_edge_taken_and_skipped():
    """check_conditionals_edge_1: 11 → branch + merger; 9 → merger only."""
    spec = conditionals_edge_spec()
    for my_int in (9, 11):
        state = E.process_event(spec, None,
                                start_ev("r1", {"my_int": my_int}),
                                executor=executor)[0]
        assert state["status"] == "COMPLETED"
        assert len(state["thread_runs"]) == 1
        thr = state["thread_runs"][0]
        assert isinstance(thr["variables"]["my_int"], int)
        # The reference filters to node_type == TASK (the NOP merge
        # node also records a task run, conditionals_edge_1.py:61).
        nodes = spec["thread_specs"]["entrypoint"]["nodes"]
        stdouts = [tr["stdout"] for tr in thr["task_runs"]
                   if nodes[tr["node_name"]]["node_type"] == "TASK"]
        if my_int > 10:
            assert stdouts == ["Its 10 or more!",
                               "This task should execute on all WFRun's."]
        else:
            assert stdouts == ["This task should execute on all WFRun's."]


def test_conditionals_edge_bad_input_halts():
    """check_conditionals_edge_2: a non-INT input makes the condition
    unevaluable — the run HALTS with VARIABLE_LOOKUP_ERROR instead of
    crashing the engine (conditionals_edge_1.py:74-90)."""
    spec = conditionals_edge_spec()
    state, _ = E.process_event(spec, None,
                               start_ev("r1", {"my_int": "not an int"}),
                               executor=executor)
    assert state["status"] == "HALTED"
    thr = state["thread_runs"][0]
    assert any(tr["failure_reason"] == "VARIABLE_LOOKUP_ERROR"
               for tr in thr["task_runs"])


# ---------------------------------------------------------------------------
# Round-7 review hardening: reference-parity and containment edges
# ---------------------------------------------------------------------------

def test_external_event_timeout_with_retries_terminates():
    """An EXTERNAL_EVENT timeout on a node with retries must fail ONE
    attempt per timer firing, arm a fresh wait (new timer), and stop
    at the retry cap — not livelock appending retry pairs while
    iterating up_next (measured pre-fix: millions of task_runs from a
    single timer event)."""
    wf = Workflow("ext-retry")
    t = wf.thread("entrypoint")
    t.wait_for_event("evt").with_timeout(1).with_retries(2)
    spec = wf.build()
    state, ctx = E.process_event(spec, None, start_ev("r1"))
    rounds = 0
    off = 1
    while ctx.timers and rounds < 10:
        timer = ctx.timers[0]
        tev = {"wf_run_id": "r1", "event_type": "TIMER_EVENT",
               "thread_id": 0, "offset": off,
               "timestamp": timer["maturation_timestamp"] + 1,
               "content": timer}
        state, ctx = E.process_event(spec, state, tev)
        rounds += 1
        off += 1
    trs = state["thread_runs"][0]["task_runs"]
    assert [tr["attempt_number"] for tr in trs] == [0, 1, 2]
    assert all(tr["failure_reason"] == "TIMEOUT" for tr in trs)
    assert state["status"] == "HALTED"
    assert rounds == 3  # one attempt per firing, then the cap halts


def test_started_event_does_not_resurrect_terminated_task():
    """At-least-once redelivery: a late started event for a COMPLETED
    task must not flip it back to RUNNING — that would let the
    redelivered ended event past the idempotency guard and re-apply
    mutations (double ADD)."""
    wf = Workflow("resurrect")
    t = wf.thread("entrypoint")
    t.add_variable("n", "INT", default=0)
    n1 = t.execute("echo_int", x=5)
    t.mutate(n1, "n", "ADD")
    spec = wf.build()
    state, ctx = E.process_event(spec, None, start_ev("r1"))
    started = {"wf_run_id": "r1", "event_type": "TASK_EVENT", "thread_id": 0,
               "timestamp": 1001, "offset": 1,
               "content": {"thread_id": 0, "task_run_position": 0,
                           "started_event": {"worker_id": "w"}}}
    ended = {"wf_run_id": "r1", "event_type": "TASK_EVENT", "thread_id": 0,
             "timestamp": 1002, "offset": 2,
             "content": {"thread_id": 0, "task_run_position": 0,
                         "ended_event": {"result": {
                             "stdout": "5", "stderr": None,
                             "success": True, "returncode": 0}}}}
    state, _ = E.process_event(spec, state, started)
    state, _ = E.process_event(spec, state, ended)
    assert state["status"] == "COMPLETED"
    assert state["thread_runs"][0]["variables"]["n"] == 5
    # full redelivery of the started+ended pair
    state, _ = E.process_event(spec, state, dict(started, offset=3))
    tr = state["thread_runs"][0]["task_runs"][0]
    assert tr["status"] == "COMPLETED"  # NOT resurrected to RUNNING
    state, _ = E.process_event(spec, state, dict(ended, offset=4))
    assert state["thread_runs"][0]["variables"]["n"] == 5  # no double ADD
    assert len(state["thread_runs"][0]["task_runs"]) == 1


def test_buffered_events_consume_last_unassigned():
    """Reference parity (ThreadRun.java:950-957): when SEVERAL events
    of one def are buffered before the wait node activates, the
    candidate loop overwrites without break — the LAST unassigned
    event is consumed."""
    wf = Workflow("ext-last")
    t = wf.thread("entrypoint")
    t.add_variable("got", "STRING")
    n1 = t.execute("echo", x="unblock")  # async: wait activates later
    w = t.wait_for_event("evt")
    t.mutate(w, "got", "ASSIGN")
    spec = wf.build()
    state, _ = E.process_event(spec, None, start_ev("r1"))  # no executor
    # both events buffer while the TASK is still outstanding
    state, _ = E.process_event(spec, state, ext_event("r1", "evt", "first", offset=1))
    state, _ = E.process_event(spec, state, ext_event("r1", "evt", "second", offset=2))
    # task completes -> wait activates with TWO unassigned candidates
    ended = {"wf_run_id": "r1", "event_type": "TASK_EVENT", "thread_id": 0,
             "timestamp": 1003, "offset": 3,
             "content": {"thread_id": 0, "task_run_position": 0,
                         "started_event": {"worker_id": "w"}}}
    state, _ = E.process_event(spec, state, ended)
    done = {"wf_run_id": "r1", "event_type": "TASK_EVENT", "thread_id": 0,
            "timestamp": 1004, "offset": 4,
            "content": {"thread_id": 0, "task_run_position": 0,
                        "ended_event": {"result": {
                            "stdout": "unblock", "stderr": None,
                            "success": True, "returncode": 0}}}}
    state, _ = E.process_event(spec, state, done)
    assert state["status"] == "COMPLETED"
    assert state["thread_runs"][0]["variables"]["got"] == "second"


def test_equals_is_type_strict_like_object_equals():
    """EQUALS uses Object.equals semantics (ThreadRun.java:497-498):
    Integer(1) != Double(1.0), Boolean != Integer — where Python's ==
    would say True."""
    assert E._java_equals(1, 1) is True
    assert E._java_equals(1, 1.0) is False
    assert E._java_equals(1.0, 1.0) is True
    assert E._java_equals(True, 1) is False
    assert E._java_equals(True, True) is True
    assert E._java_equals("1", 1) is False


def test_coercion_and_jsonpath_errors_are_varsub_contained():
    """Raw ValueError/JSONDecodeError from coercions or jsonpath must
    surface as VarSubError so fail_task can route them (retry /
    exception handler) instead of halting the run INTERNAL_ERROR."""
    import pytest

    for fn, arg in ((E.to_int, "abc"), (E.to_int, "3.5"),
                    (E.to_double, "x"), (E.to_array, "{bad"),
                    (E.to_map, "[bad")):
        with pytest.raises(E.VarSubError):
            fn(arg)
    with pytest.raises(E.VarSubError):
        E.json_path({"a": [1]}, "$.a[0")  # unterminated bracket
    with pytest.raises(E.VarSubError):
        E.json_path({"a": [1]}, "$.a[x]")  # non-integer list index


def test_bad_mutation_rhs_fails_task_not_run():
    """End-to-end containment: ADD of non-numeric task stdout onto an
    INT variable fails the TASK (VARIABLE_LOOKUP_ERROR routing) —
    the run document stays coherent instead of INTERNAL_ERROR."""
    wf = Workflow("bad-add")
    t = wf.thread("entrypoint")
    t.add_variable("n", "INT", default=0)
    n1 = t.execute("echo", x="notanint")
    t.mutate(n1, "n", "ADD")
    spec = wf.build()
    state = run_inline(spec)
    assert state["status"] == "HALTED"
    assert state["error_message"] is None or \
        "INTERNAL" not in (state["error_message"] or "")
