"""Workflow-as-code SDK: a thin Python builder emitting the WFSpec
dict shape the engine fold consumes.

Port of the reference SDK surface (`lhctl/lh_sdk/thread_spec_builder.py
:42-324`, `condition_utils.py:25-181`, `node_output.py:68-98`):
`execute`, `add_variable`, if/else contexts (`cond.is_true()` /
`cond.is_false()`), `spawn_thread`, `wait_for_thread`,
`wait_for_event`, `sleep_for`, `handle_interrupt`, `throw_exception`,
`with_retries`, `with_timeout`, `mutate`.

Control flow uses the reference's *feeder-node* model
(`condition_utils.py:120-190`): the builder tracks the set of nodes
whose outgoing edges feed the next added node, each with an optional
edge condition; if/else scopes rewrite that set, inserting NOP merge
nodes so every edge carries at most one condition.

Pure spec construction — no engine coupling, no Spark imports.
"""

from __future__ import annotations

from typing import Any

INVERSE_COMPARATOR = {  # wf_spec_schema.py:76-86
    "LESS_THAN": "GREATER_THAN_EQ",
    "GREATER_THAN_EQ": "LESS_THAN",
    "GREATER_THAN": "LESS_THAN_EQ",
    "LESS_THAN_EQ": "GREATER_THAN",
    "EQUALS": "NOT_EQUALS",
    "NOT_EQUALS": "EQUALS",
    "IN": "NOT_IN",
    "NOT_IN": "IN",
}


def var(name: str, json_path: str | None = None, default: Any = None) -> dict:
    """VariableAssignment referencing a wfRun variable."""
    out: dict = {"wf_run_variable_name": name}
    if json_path:
        out["json_path"] = json_path
    if default is not None:
        out["default_value"] = default
    return out


def lit(value: Any) -> dict:
    return {"literal_value": value}


def meta(md: str) -> dict:
    """WF_RUN_GUID | WF_SPEC_GUID | WF_SPEC_NAME | THREAD_GUID | THREAD_ID."""
    return {"wf_run_metadata": md}


def _as_assignment(v: Any) -> dict:
    if isinstance(v, dict) and (
        "wf_run_variable_name" in v or "literal_value" in v or "wf_run_metadata" in v
    ):
        return v
    return lit(v)


class NodeOutput:
    """Handle to a node, for mutations on its output and fluent node
    options (node_output.py:68-98)."""

    def __init__(self, builder: "ThreadBuilder", node_name: str):
        self.builder = builder
        self.node_name = node_name

    def with_retries(self, n: int) -> "NodeOutput":
        self.builder._node(self.node_name)["num_retries"] = n
        return self

    def with_timeout(self, seconds: Any) -> "NodeOutput":
        self.builder._node(self.node_name)["timeout_seconds"] = _as_assignment(seconds)
        return self

    def catch_exception(self, handler_thread: str,
                        exception_name: str | None = None) -> "NodeOutput":
        node = self.builder._node(self.node_name)
        if exception_name is None:
            node["base_exception_handler"] = handler_thread
        else:
            node.setdefault("exception_handlers", {})[exception_name] = handler_thread
        return self


class IfElseCondition:
    """condition_utils.py:25-106 — `with cond.is_true(): ...` then
    optionally `with cond.is_false(): ...`."""

    def __init__(self, tb: "ThreadBuilder", cond: dict):
        self.tb = tb
        self.cond = cond

    @property
    def reverse(self) -> dict:
        return {
            "left_side": self.cond["left_side"],
            "comparator": INVERSE_COMPARATOR[self.cond["comparator"]],
            "right_side": self.cond["right_side"],
        }

    def is_true(self) -> "_IfCtx":
        return _IfCtx(self)

    def is_false(self) -> "_ElseCtx":
        return _ElseCtx(self)


class _IfCtx:
    """condition_utils.py:110-152."""

    def __init__(self, parent: IfElseCondition):
        self.parent = parent
        self._saved: dict[str, dict | None] = {}

    def __enter__(self):
        tb = self.parent.tb
        if not tb.nodes:
            tb.add_nop_node()
        # If any current feeder already carries a condition, merge at a
        # NOP first so each edge holds at most one condition.
        if any(c is not None for c in tb._feeders.values()):
            tb.add_nop_node()
        for name in tb._feeders:
            tb._feeders[name] = self.parent.cond
        self._saved.update(tb._feeders)
        self._saved[tb._last_node] = self.parent.reverse
        return self

    def __exit__(self, *exc):
        tb = self.parent.tb
        tb._feeders.update(self._saved)
        return False


class _ElseCtx:
    """condition_utils.py:155-190: must directly follow is_true()."""

    def __init__(self, parent: IfElseCondition):
        self.parent = parent
        self._popped: str | None = None

    def __enter__(self):
        tb = self.parent.tb
        self._popped = tb._last_node
        del tb._feeders[self._popped]
        return self

    def __exit__(self, *exc):
        tb = self.parent.tb
        tb._feeders[self._popped] = None
        tb.add_nop_node()  # merge both arms
        return False


class ThreadBuilder:
    def __init__(self, wf: "Workflow", name: str):
        self.wf = wf
        self.name = name
        self.nodes: dict[str, dict] = {}
        self.edges: list[dict] = []
        self.variable_defs: dict[str, dict] = {}
        self.interrupt_defs: dict[str, str] = {}
        self._last_node: str | None = None
        self._feeders: dict[str, dict | None] = {}
        self._name_counts: dict[str, int] = {}

    # -- plumbing ----------------------------------------------------------

    def _node(self, name: str) -> dict:
        return self.nodes[name]

    def _unique(self, base: str) -> str:
        n = self._name_counts.get(base, 0)
        self._name_counts[base] = n + 1
        return base if n == 0 else f"{base}-{n}"

    def _add_node(self, base_name: str, node: dict) -> str:
        name = self._unique(base_name)
        node["name"] = name
        self.nodes[name] = node
        for feeder, cond in self._feeders.items():
            self.edges.append({
                "source_node_name": feeder,
                "sink_node_name": name,
                "condition": cond,
            })
        self._feeders = {name: None}
        self._last_node = name
        return name

    def add_nop_node(self) -> str:
        return self._add_node("nop", {"node_type": "NOP", "variable_mutations": {}})

    # -- variables ---------------------------------------------------------

    def add_variable(self, name: str, var_type: str, default: Any = None) -> None:
        self.variable_defs[name] = {"type": var_type, "default_value": default}

    # -- nodes -------------------------------------------------------------

    def execute(self, task_def_name: str, **variables: Any) -> NodeOutput:
        name = self._add_node(task_def_name, {
            "node_type": "TASK",
            "task_def_name": task_def_name,
            "variables": {k: _as_assignment(v) for k, v in variables.items()},
            "variable_mutations": {},
            "num_retries": 0,
        })
        return NodeOutput(self, name)

    def sleep_for(self, seconds: Any) -> NodeOutput:
        return NodeOutput(self, self._add_node("sleep", {
            "node_type": "SLEEP",
            "timeout_seconds": _as_assignment(seconds),
            "variable_mutations": {},
        }))

    def wait_for_event(self, event_name: str) -> NodeOutput:
        return NodeOutput(self, self._add_node(f"wait-{event_name}", {
            "node_type": "EXTERNAL_EVENT",
            "external_event_def_name": event_name,
            "variable_mutations": {},
        }))

    def spawn_thread(self, thread_name: str, **variables: Any) -> NodeOutput:
        return NodeOutput(self, self._add_node(f"spawn-{thread_name}", {
            "node_type": "SPAWN_THREAD",
            "thread_spawn_thread_spec_name": thread_name,
            "variables": {k: _as_assignment(v) for k, v in variables.items()},
            "variable_mutations": {},
        }))

    def wait_for_thread(self, spawn_node: "NodeOutput | Any") -> NodeOutput:
        """Wait for the thread spawned by `spawn_node` (its stdout
        carries {"threadId": N})."""
        if isinstance(spawn_node, NodeOutput):
            tid = {"wf_run_variable_name": f"__spawn_{spawn_node.node_name}"}
            # The spawn node records its child id into a hidden variable
            # so the wait node can reference it.
            hidden = tid["wf_run_variable_name"]
            self.variable_defs.setdefault(hidden, {"type": "INT", "default_value": -1})
            self._node(spawn_node.node_name)["variable_mutations"][hidden] = {
                "operation": "ASSIGN", "json_path": "$.threadId",
            }
        else:
            tid = _as_assignment(spawn_node)
        return NodeOutput(self, self._add_node("wait-thread", {
            "node_type": "WAIT_FOR_THREAD",
            "thread_wait_thread_id": tid,
            "variable_mutations": {},
        }))

    def throw_exception(self, name: str) -> NodeOutput:
        return NodeOutput(self, self._add_node(f"throw-{name}", {
            "node_type": "THROW_EXCEPTION",
            "exception_to_throw": name,
            "variable_mutations": {},
        }))

    def handle_interrupt(self, event_name: str, handler_thread: str) -> None:
        self.interrupt_defs[event_name] = handler_thread

    # -- mutations ---------------------------------------------------------

    def mutate(self, node: NodeOutput, var_name: str, operation: str,
               json_path: str | None = None, literal: Any = None,
               source: dict | None = None) -> None:
        """Attach a variable mutation to a node; RHS defaults to the
        node's stdout (ThreadRun.java:157-172 RHS selection)."""
        mut: dict = {"operation": operation}
        if json_path is not None:
            mut["json_path"] = json_path
        if literal is not None:
            mut["literal_value"] = literal
        if source is not None:
            mut["source_variable"] = source
        self._node(node.node_name)["variable_mutations"][var_name] = mut

    # -- control flow ------------------------------------------------------

    def condition(self, left: Any, comparator: str, right: Any) -> IfElseCondition:
        return IfElseCondition(self, {
            "left_side": _as_assignment(left),
            "comparator": comparator,
            "right_side": _as_assignment(right),
        })

    # -- spec emission -----------------------------------------------------

    def build(self) -> dict:
        entry = self._entrypoint()
        return {
            "entrypoint_node_name": entry,
            "nodes": self.nodes,
            "edges": self.edges,
            "variable_defs": self.variable_defs,
            "interrupt_defs": self.interrupt_defs,
        }

    def _entrypoint(self) -> str:
        """Entrypoint inference (ThreadSpec.java:89-118): the unique
        node with no incoming edges."""
        sinks = {e["sink_node_name"] for e in self.edges}
        candidates = [n for n in self.nodes if n not in sinks]
        if len(candidates) != 1:
            raise ValueError(
                f"thread {self.name!r} needs exactly one entrypoint, got {candidates}"
            )
        return candidates[0]


class Workflow:
    """WFSpec builder: named threads + entrypoint."""

    def __init__(self, name: str):
        self.name = name
        self.threads: dict[str, ThreadBuilder] = {}
        self.entrypoint: str | None = None

    def thread(self, name: str, entrypoint: bool = False) -> ThreadBuilder:
        tb = ThreadBuilder(self, name)
        self.threads[name] = tb
        if entrypoint or self.entrypoint is None:
            self.entrypoint = name
        return tb

    def build(self) -> dict:
        spec = {
            "id": f"{self.name}-spec",
            "name": self.name,
            "entrypoint_thread_name": self.entrypoint,
            "thread_specs": {n: tb.build() for n, tb in self.threads.items()},
        }
        validate_spec(spec)
        return spec


def validate_spec(spec: dict) -> None:
    """Spec validation (WFSpec.validate, WFSpec.java:306-362): thread
    and node integrity, edge endpoints, spawn/interrupt/exception
    handler targets exist."""
    tspecs = spec["thread_specs"]
    if spec["entrypoint_thread_name"] not in tspecs:
        raise ValueError("entrypoint thread missing")
    for tname, ts in tspecs.items():
        nodes = ts["nodes"]
        if ts["entrypoint_node_name"] not in nodes:
            raise ValueError(f"{tname}: entrypoint node missing")
        for e in ts["edges"]:
            if e["source_node_name"] not in nodes or e["sink_node_name"] not in nodes:
                raise ValueError(f"{tname}: edge references unknown node: {e}")
        for nname, node in nodes.items():
            nt = node["node_type"]
            if nt == "TASK" and not node.get("task_def_name"):
                raise ValueError(f"{tname}.{nname}: TASK without task_def_name")
            if nt == "SPAWN_THREAD":
                target = node.get("thread_spawn_thread_spec_name")
                if target not in tspecs:
                    raise ValueError(f"{tname}.{nname}: spawns unknown thread {target}")
            if nt == "EXTERNAL_EVENT" and not node.get("external_event_def_name"):
                raise ValueError(f"{tname}.{nname}: EXTERNAL_EVENT without event name")
            if node.get("base_exception_handler") and \
                    node["base_exception_handler"] not in tspecs:
                raise ValueError(f"{tname}.{nname}: unknown exception handler")
            for exc, handler in (node.get("exception_handlers") or {}).items():
                if handler not in tspecs:
                    raise ValueError(
                        f"{tname}.{nname}: exception {exc!r} → unknown "
                        f"handler thread {handler!r}")
        for ev, handler in (ts.get("interrupt_defs") or {}).items():
            if handler not in tspecs:
                raise ValueError(f"{tname}: interrupt {ev} → unknown thread {handler}")
