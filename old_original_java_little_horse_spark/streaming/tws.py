"""The engine fold on `transformWithStateInPandas` (Spark 4's
arbitrary-stateful-processing API) — the same semantics as
`engine.make_update_fn`, expressed with typed state variables and
per-timer native callbacks.

Why this API maps cleaner to the reference than
`applyInPandasWithState` (SURVEY §3.2; carried VERDICT item):

- **Per-timer callbacks.**  `handle.registerTimer(ts)` registers one
  native timer per stored `WFRunTimer`; `handleExpiredTimer` fires for
  exactly that maturation — the reference's timer wheel
  (`SchedulerProcessor.java:88-126`: one punctuator visit per matured
  timer) without the single-timeout re-arm dance the old API forces
  (`engine.py` arms only the EARLIEST timer and must re-arm on every
  invocation because any visit clears it).
- **Typed state columns.**  The WFRun document and its bookkeeping
  live in a `ValueState`; pending timers are a `ListState` element
  each (the timer store), appended/cleared independently of the
  document instead of round-tripping one JSON blob of all timers.
- **State removal.**  A drained tombstone deletes its state variables
  (`clear()`), removing the key — the old API can only `remove()` on
  a timeout path.

The fold itself (`engine/fold.py`), output schema, ordering, lateness,
seq, eviction, and index-diff semantics are byte-identical — shared
helpers `emit_ctx_rows` / `prepare_events` / `snapshot_row` /
`index_diff_rows` come from `engine.py`, and the twin tests in
`tests/test_streaming.py` run the same scenarios under both engines.

Select it with `use_tws=True` on `streaming_engine` /
`run_streaming_availablenow` / `start_continuous`.
"""

from __future__ import annotations

import json
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo, StatefulProcessor, StatefulProcessorHandle, TimerValues,
)

from ..engine.fold import TaskExecutor, process_event
from .engine import (
    OUTPUT_SCHEMA, _timer_key, emit_ctx_rows, fire_matured_timers,
    index_diff_rows, prepare_events, snapshot_row,
)

_RUN_STATE_SCHEMA = ("state_json string, max_offset long, "
                     "max_event_ts long, tomb integer")
_TIMER_STATE_SCHEMA = "payload string"

_COLS = [f.name for f in OUTPUT_SCHEMA.fields]


def tws_runtime_available() -> bool:
    """Spark's transformWithStateInPandas Python worker speaks a
    protobuf state-server protocol — without `google.protobuf`
    importable the query crashes at initialization
    (STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE).  Feature-detect
    so callers/tests gate cleanly, as with the Kafka integration
    tests (broker required).  `protobuf_compat.ensure_protobuf`
    first tries to RESOLVE a runtime (a pure-Python bundle shipped
    with the host's gcloud SDK, exposed through a shim path) before
    giving up — where it succeeds, the tws engine runs for real."""
    from ..protobuf_compat import ensure_protobuf

    return ensure_protobuf()


def _export_worker_pythonpath(spark) -> None:
    """transformWithStateInPandas starts a LONG-LIVED state-server
    Python process through `StreamingPythonRunner`, which (unlike
    task workers) does not consult the session's addPyFile includes —
    its import path comes from the PYTHONPATH in the Python
    function's captured env (`sc.environment`, snapshotted when the
    UDF is wrapped).  Export this package's parent dir and, when the
    protobuf fallback is active, the shim path, BEFORE the UDF is
    created.  Driver-local paths are fine: the runner lives on the
    driver node; ordinary executor workers are covered by
    ship_package/ship_protobuf."""
    import os
    import pathlib

    extra = [str(pathlib.Path(__file__).resolve().parents[2])]
    try:
        import google.protobuf as gp

        extra.append(str(pathlib.Path(gp.__file__).resolve().parents[2]))
    except ImportError:
        pass
    env = spark.sparkContext.environment
    parts = [p for p in (env.get("PYTHONPATH") or
                         os.environ.get("PYTHONPATH", "")).split(os.pathsep)
             if p]
    env["PYTHONPATH"] = os.pathsep.join(
        dict.fromkeys(extra + parts))  # ordered de-dup


class WFRunFoldProcessor(StatefulProcessor):
    """One instance per state partition; state accessors are per-key
    (implicit grouping key, as with the reference's processor)."""

    def __init__(self, spec: dict, executor: TaskExecutor | None = None,
                 allowed_lateness_ms: int | None = None,
                 native_timers: bool = False,
                 evict_completed: bool = False,
                 tombstone_ttl_ms: int | None = None):
        self.spec = spec
        self.executor = executor
        self.allowed_lateness_ms = allowed_lateness_ms
        self.native_timers = native_timers
        self.evict_completed = evict_completed
        self.tombstone_ttl_ms = tombstone_ttl_ms

    # -- state plumbing ----------------------------------------------------

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.handle = handle
        self._run = handle.getValueState("run", _RUN_STATE_SCHEMA)
        self._timers = handle.getListState("timers", _TIMER_STATE_SCHEMA)

    def close(self) -> None:
        pass

    def _load(self):
        val = self._run.get()
        if val is None:
            return None, 0, 0, 0, []
        state_json, max_offset, max_event_ts, tomb = val
        pending = [json.loads(p) for (p,) in self._timers.get()]
        state = None if tomb else json.loads(state_json)
        return state, max_offset or 0, max_event_ts or 0, tomb or 0, pending

    def _save(self, state, max_offset: int, max_event_ts: int,
              pending: list, out_rows: list, wf_run_id: str,
              old_aliases: set | None) -> None:
        """Emit snapshot + index diffs, persist state, register one
        native timer per pending WFRunTimer, tombstone terminal runs."""
        if old_aliases is not None:
            index_diff_rows(out_rows, wf_run_id, old_aliases, state, max_offset)
        out_rows.append(snapshot_row(wf_run_id, state, max_offset))
        if self.evict_completed and state["status"] == "COMPLETED":
            # Terminal run (one guard, one motion — see engine._store):
            # stored timers are dead (stale-guarded no-ops), so drop
            # them rather than block eviction on an unmatured
            # task-timeout.  CRITICALLY, also delete every REGISTERED
            # native timer: unlike GroupState's single replaceable
            # timeout, this API keeps each registered expiry alive,
            # and a leftover task-timeout firing on the tombstoned key
            # would look exactly like the TTL expiry — wiping the
            # dedupe marker early (with ttl=None: a PERMANENT marker)
            # and re-opening the run to redelivered events.
            self._run.update(("", max_offset, max_event_ts, 1))
            self._timers.clear()
            if self.native_timers:
                for ts in self.handle.listTimers():
                    self.handle.deleteTimer(ts)
                if self.tombstone_ttl_ms is not None:
                    import time as _time

                    self.handle.registerTimer(
                        int(_time.time() * 1000) + self.tombstone_ttl_ms)
            return
        self._run.update((json.dumps(state, separators=(",", ":")),
                          max_offset, max_event_ts, 0))
        self._timers.clear()
        if pending:
            self._timers.put([(json.dumps(t, separators=(",", ":")),)
                              for t in pending])
            if self.native_timers:
                # Register only NEW maturations: stored timers survive
                # across invocations in this API (no re-arm dance), and
                # re-registering an existing expiry must not double it.
                armed = set(self.handle.listTimers())
                for ts in {t["maturation_timestamp"] for t in pending}:
                    if ts not in armed:
                        self.handle.registerTimer(ts)

    def _fire_matured(self, wf_run_id: str, state, pending: list,
                      max_offset: int, now_ms: int, out_rows: list):
        """Shared with the applyInPandasWithState engine — the firing
        order is a cross-engine parity contract, so one implementation
        (engine.fire_matured_timers) serves both twins."""
        return fire_matured_timers(self.spec, self.executor, wf_run_id,
                                   state, pending, max_offset, now_ms,
                                   out_rows)

    # -- input path --------------------------------------------------------

    def handleInputRows(self, key, rows: Iterator[pd.DataFrame],
                        timerValues: TimerValues) -> Iterator[pd.DataFrame]:
        import time as _time

        (wf_run_id,) = key
        state, max_offset, max_event_ts, tomb, pending = self._load()
        if tomb:
            # Evicted terminal run: duplicates/late events are dropped.
            yield pd.DataFrame([], columns=_COLS)
            return
        from ..operators.run_index import doc_aliases

        old_aliases = doc_aliases(state)

        events: list[dict] = []
        for pdf in rows:
            events.extend(pdf.to_dict("records"))
        events, max_offset, max_event_ts = prepare_events(
            events, max_offset, max_event_ts, self.allowed_lateness_ms)

        out_rows: list = []
        for ev in events:
            if ev.get("event_type") == "TIMER_EVENT":
                # Externally-injected firing (TimerPump replay path).
                try:
                    fired_key = _timer_key(json.loads(ev.get("content") or "{}"))
                    pending = [t for t in pending
                               if _timer_key(t) != fired_key]
                except (KeyError, ValueError, TypeError):
                    # TypeError: valid JSON that is not an object — a
                    # poison pill must be skipped, not crash the batch.
                    pass
            state, ctx = process_event(self.spec, state, ev,
                                       executor=self.executor)
            emit_ctx_rows(out_rows, wf_run_id, ctx, pending)

        if state is not None and self.native_timers:
            state, pending, max_offset, _ = self._fire_matured(
                wf_run_id, state, pending, max_offset,
                int(_time.time() * 1000), out_rows)

        if state is not None:
            self._save(state, max_offset, max_event_ts, pending,
                       out_rows, wf_run_id, old_aliases)
        yield pd.DataFrame(out_rows, columns=_COLS)

    # -- timer path (per-timer callback) -----------------------------------

    def handleExpiredTimer(self, key, timerValues: TimerValues,
                           expiredTimerInfo: ExpiredTimerInfo,
                           ) -> Iterator[pd.DataFrame]:
        (wf_run_id,) = key
        expiry_ms = expiredTimerInfo.getExpiryTimeInMs()
        state, max_offset, max_event_ts, tomb, pending = self._load()
        if tomb:
            # Only a configured TTL may drop the marker.  _save
            # deletes all other registered timers at tombstone time,
            # so an expiry here IS the TTL timer — but pre-fix stores
            # (or a ttl=None config, where the marker is PERMANENT)
            # can still see a stale task-timeout fire on this key, and
            # clearing for one of those would break exactly-once.
            if self.tombstone_ttl_ms is not None:
                self._run.clear()
                self._timers.clear()
            yield pd.DataFrame([], columns=_COLS)
            return
        from ..operators.run_index import doc_aliases

        old_aliases = doc_aliases(state)
        out_rows: list = []
        state, pending, max_offset, fired = self._fire_matured(
            wf_run_id, state, pending, max_offset, expiry_ms, out_rows)
        if fired:
            self._save(state, max_offset, max_event_ts, pending,
                       out_rows, wf_run_id, old_aliases)
        # Not fired (early/stale callback): stored timers and their
        # still-registered native timers are untouched — unlike the
        # old API there is nothing to re-arm.
        yield pd.DataFrame(out_rows, columns=_COLS)


def streaming_engine_tws(events: DataFrame, spec: dict,
                         executor: TaskExecutor | None = None,
                         watermark_delay: str | None = None,
                         allowed_lateness_ms: int | None = None,
                         native_timers: bool = False,
                         evict_completed: bool = False,
                         tombstone_ttl_ms: int | None = None) -> DataFrame:
    """events (streaming DF, WF_EVENT_SCHEMA) → tagged output stream,
    via transformWithStateInPandas.  Same contract as
    `engine.streaming_engine`."""
    from pyspark.sql import functions as F

    from ..session import ship_package

    if not tws_runtime_available():
        raise RuntimeError(
            "transformWithStateInPandas needs the protobuf package "
            "(google.protobuf) for its Python state server; install it or "
            "use the applyInPandasWithState engine (use_tws=False)")
    ship_package(events.sparkSession)
    from ..protobuf_compat import ship_protobuf

    ship_protobuf(events.sparkSession)
    _export_worker_pythonpath(events.sparkSession)
    if watermark_delay is not None:
        events = events.withColumn(
            "event_time", F.timestamp_millis(F.col("timestamp"))
        ).withWatermark("event_time", watermark_delay)
    processor = WFRunFoldProcessor(
        spec, executor, allowed_lateness_ms=allowed_lateness_ms,
        native_timers=native_timers, evict_completed=evict_completed,
        tombstone_ttl_ms=tombstone_ttl_ms)
    return events.groupBy("wf_run_id").transformWithStateInPandas(
        statefulProcessor=processor,
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="ProcessingTime" if native_timers else "None",
    )
