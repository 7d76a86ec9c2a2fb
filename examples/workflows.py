"""Example workflows — the reference's `examples/workflows/` directory
re-expressed on this repo's SDK builder, one function per reference
file.  Every function here returns a `Workflow`, so each one compiles
and deploys with the CLI verbatim:

    python -m old_original_java_little_horse_spark.cli \
        compile examples.workflows:basic_wf > spec.json
    python -m old_original_java_little_horse_spark.cli \
        deploy spec.json --api http://localhost:5000
    python -m old_original_java_little_horse_spark.cli \
        run basic-wf --api http://localhost:5000 --var name=Obi-Wan

Task implementations live in `examples/tasks.py` (bind it to `serve`
or a worker with `--executor examples.tasks:execute`).  The
reference's `heterogeneous/` example (a Java task beside Python
tasks) has no twin: task heterogeneity here is a worker-binding
concern, not a spec concern — any `cli work --executor` process can
serve any TaskDef, whatever language it shells out to.
"""

from __future__ import annotations

from old_original_java_little_horse_spark.sdk.builder import (
    Workflow,
    lit,
    var,
)


# -- basic_wf.py ------------------------------------------------------------

def basic_wf() -> Workflow:
    wf = Workflow("basic-wf")
    t = wf.thread("entrypoint")
    t.add_variable("name", "STRING", default="there")
    t.execute("hello_there", name=var("name"))
    return wf


# -- simple_5_tasks.py ------------------------------------------------------

def simple_5_tasks() -> Workflow:
    wf = Workflow("simple-5-tasks")
    t = wf.thread("entrypoint")
    for who in ("Obi-Wan", "Anakin", "Ahsoka", "Yoda", "Qui-Gon"):
        t.execute("hello_there", name=lit(who))
    return wf


# -- speed_test_50_tasks.py -------------------------------------------------

def speed_test_50_tasks() -> Workflow:
    wf = Workflow("speed-test-50-tasks")
    t = wf.thread("entrypoint")
    for i in range(50):
        t.execute("hello_there", name=lit(f"task-{i}"))
    return wf


# -- conditionals.py --------------------------------------------------------

def conditionals() -> Workflow:
    wf = Workflow("conditionals-example")
    t = wf.thread("entrypoint")
    t.add_variable("my_int", "INT", default=0)
    t.execute("dummy")
    with t.condition(var("my_int"), "LESS_THAN", lit(10)).is_true():
        n = t.execute("multiply", some_number=var("my_int"))
        t.mutate(n, "my_int", "ASSIGN")
        with t.condition(var("my_int"), "GREATER_THAN", lit(15)).is_true():
            t.execute("dummy")
    t.execute("dummy")
    return wf


# -- conditionals_else.py ---------------------------------------------------

def conditionals_else() -> Workflow:
    wf = Workflow("conditionals-else-example")
    t = wf.thread("entrypoint")
    t.add_variable("my_int", "INT", default=0)
    t.execute("dummy")
    cond = t.condition(var("my_int"), "LESS_THAN", lit(10))
    with cond.is_true():
        n = t.execute("multiply", some_number=var("my_int"))
        t.mutate(n, "my_int", "ASSIGN")
        with t.condition(var("my_int"), "GREATER_THAN", lit(5)).is_true():
            t.execute("happy")
    with t.condition(var("my_int"), "LESS_THAN", lit(10)).is_false():
        t.execute("false_dummy")
    t.execute("dummy")
    return wf


# -- basic_threads.py -------------------------------------------------------

def basic_threads() -> Workflow:
    wf = Workflow("basic-threads")
    t = wf.thread("entrypoint")
    t.add_variable("parent_var", "STRING", default="parent value")
    t.execute("parent_task", input_str=var("parent_var"))
    sp = t.spawn_thread("subthread", input_str=var("parent_var"))
    t.wait_for_thread(sp)
    child = wf.thread("subthread")
    child.add_variable("input_str", "STRING", default="")
    child.execute("child_task", input_str=var("input_str"))
    wf.entrypoint = "entrypoint"
    return wf


# -- basic_exceptions.py ----------------------------------------------------

def basic_exceptions() -> Workflow:
    wf = Workflow("basic-exceptions")
    t = wf.thread("entrypoint")
    t.add_variable("my_var", "INT", default=137)
    n = t.execute("unreliable_task").catch_exception("exception_handler")
    t.mutate(n, "my_var", "ASSIGN")
    t.execute("dummy_42")
    h = wf.thread("exception_handler")
    hn = h.execute("dummy_42")
    # the handler repairs the parent's variable, like the reference's
    # exception_handler assigning get_parent_var("my_var")
    h.mutate(hn, "my_var", "ASSIGN")
    wf.entrypoint = "entrypoint"
    return wf


# -- interrupts.py ----------------------------------------------------------

def interrupts() -> Workflow:
    wf = Workflow("interrupts-example")
    t = wf.thread("entrypoint")
    t.handle_interrupt("some-event", "interrupt_handler_thread")
    t.execute("hello_there", name=lit("General Kenobi"))
    h = wf.thread("interrupt_handler_thread")
    h.execute("hello_there", name=lit("from the interrupt thread"))
    wf.entrypoint = "entrypoint"
    return wf


ALL = [basic_wf, simple_5_tasks, speed_test_50_tasks, conditionals,
       conditionals_else, basic_threads, basic_exceptions, interrupts]
