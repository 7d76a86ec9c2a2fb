"""Local deployer: one isolated worker process per TaskDef.

Parity surface for the reference's deployer plugins
(`J/deployers/docker/DockerTaskDeployer.java:40-88`,
`J/deployers/kubernetes/K8sTaskDeployer.java` — both launch one
worker deployment per TaskDef consuming that TaskDef's own request
topic; `SchedulerTopology.java:62-72` fans schedule requests out per
TaskDef).  Here the "deployment" is an OS process, the per-TaskDef
topic is a multiprocessing queue keyed by `task_def_name`, and the
shared result stream is a single results queue — the same
engine ⇄ worker contract as `worker.py`, now with real process
isolation and per-TaskDef routing.

This is the LOCAL plugin; the CLI's `--executor` hook stays the
in-process variant.  A docker/k8s plugin would swap `_spawn` for a
container launch and the queues for Kafka topics (`sources/kafka.py`
builds those readers/writers) without touching the routing contract.
"""

from __future__ import annotations

import multiprocessing as mp
from typing import Callable

from .worker import TaskFn, TaskWorker

_STOP = "__stop__"


def _worker_main(task_def_name: str, fn: TaskFn, worker_id: str,
                 inbox: mp.Queue, results: mp.Queue) -> None:
    """Process entrypoint: a TaskWorker bound to ONE TaskDef, draining
    its own queue — duplicate deliveries are deduped per-process, like
    the reference worker's consumer group."""
    worker = TaskWorker({task_def_name: fn}, worker_id=worker_id)
    while True:
        msg = inbox.get()
        if msg == _STOP:
            return
        tsr, timestamp, base_offset = msg
        # ONE reply per schedule row, even when the worker's idempotent
        # dedupe yields no events — the router counts replies, not
        # events, so duplicate deliveries can't stall it.
        results.put(worker.handle(tsr, timestamp, base_offset))


class LocalDeployer:
    """Deploys one worker process per TaskDef and routes schedule rows
    to the owning worker's queue (the per-TaskDef topic)."""

    def __init__(self, executors: dict[str, TaskFn]):
        self.executors = executors
        self._ctx = mp.get_context("fork")
        self._inboxes: dict[str, mp.Queue] = {}
        self._results: mp.Queue = self._ctx.Queue()
        self._procs: list = []

    def deploy(self) -> None:
        for name, fn in self.executors.items():
            inbox = self._ctx.Queue()
            proc = self._ctx.Process(
                target=_worker_main,
                args=(name, fn, f"worker-{name}", inbox, self._results),
                daemon=True,
            )
            proc.start()
            self._inboxes[name] = inbox
            self._procs.append(proc)

    def route(self, schedule_rows: list[dict], start_offset: int = 1000,
              timestamp: int = 2000) -> list[dict]:
        """Send each schedule row to its TaskDef's worker; collect the
        started/ended wf_events (2 per non-duplicate row; duplicate
        deliveries yield an empty reply from the worker's idempotent
        dedupe)."""
        sent = 0
        off = start_offset
        for tsr in schedule_rows:
            name = tsr["task_def_name"]
            if name not in self._inboxes:
                raise KeyError(f"no worker deployed for TaskDef {name!r}")
            self._inboxes[name].put((tsr, timestamp, off))
            sent += 1
            off += 2
        out: list[dict] = []
        for _ in range(sent):
            out.extend(self._results.get(timeout=30))
        # Queue arrival order is nondeterministic across workers; the
        # engine sorts by offset before folding anyway — do it here so
        # callers can feed the events straight in.
        out.sort(key=lambda e: e["offset"])
        return out

    def shutdown(self) -> None:
        for inbox in self._inboxes.values():
            inbox.put(_STOP)
        for proc in self._procs:
            proc.join(timeout=10)

    def __enter__(self) -> "LocalDeployer":
        self.deploy()
        return self

    def __exit__(self, *exc) -> None:
        self.shutdown()


def run_with_deployer(spec: dict, run_events: list[dict],
                      executors: dict[str, Callable[[dict], dict]]) -> dict:
    """Convenience loop: fold `run_events`, route every emitted
    schedule request through deployed workers, feed the resulting task
    events back, repeat until no new work — the full engine ⇄ deployer
    round-trip without Spark (the Spark path is `streaming/engine.py`
    with the worker consuming the task_schedule sink)."""
    import json as _json

    from .fold import process_event

    with LocalDeployer(executors) as dep:
        state = None
        pending = list(run_events)
        offset = 10_000
        while pending:
            schedules: list[dict] = []
            for ev in pending:
                state, ctx = process_event(spec, state, ev)
                schedules.extend(ctx.to_schedule)
            pending = []
            if schedules:
                evs = dep.route(schedules, start_offset=offset)
                offset += 2 * len(schedules)
                for ev in evs:
                    c = ev.get("content")
                    if isinstance(c, str):
                        ev = dict(ev, content=_json.loads(c))
                    pending.append(ev)
        return state
