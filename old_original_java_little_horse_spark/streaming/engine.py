"""Streaming engine: the same pure fold under Structured Streaming.

SURVEY.md §3.2 / §7 step 4 — the reference's Kafka Streams topology
(`J/scheduler/SchedulerTopology.java:23-154`) re-expressed as ONE
streaming query:

    events → groupBy(wf_run_id) → applyInPandasWithState(fold)
           → tagged output rows → filter-split → sinks

- Per-key state is the WFRun JSON document (the reference's RocksDB
  value, `SchedulerProcessor.java:133-231`); Structured Streaming's
  state store (RocksDB-backed in prod) replaces the store + changelog
  topic pair — the write-amplification the reference laments in
  `SchedulerTopology.java:33-46` disappears.
- Intra-key ordering: events are sorted by `offset` inside each
  micro-batch group (Structured Streaming does not guarantee
  intra-batch order — SURVEY §2.10).
- Outputs are a single tagged stream: `kind` ∈ {snapshot,
  task_schedule, timer}; the per-TaskDef fanout (S4) becomes a filter
  or a Kafka sink with a `topic` column — strictly better than the
  reference's one-processor-per-TaskDef (§2.2 P1).
- Timers: the live path (`start_continuous`) fires its own stored
  timers via group-state ProcessingTimeTimeout — the reference's 1 s
  punctuator (`SchedulerProcessor.java:56-60`, `Constants.java:36`)
  without any satellite process; a SLEEP completes with no further
  input.  Replay paths keep timers as emitted `kind='timer'` rows +
  explicit TIMER_EVENTs (deterministic: no wall-clock reads), served
  by the legacy `TimerPump` when needed.
"""

from __future__ import annotations

import json
import os
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType, LongType, StringType, StructField, StructType,
)

from ..engine.fold import TaskExecutor, process_event

OUTPUT_SCHEMA = StructType([
    StructField("wf_run_id", StringType()),
    StructField("kind", StringType()),       # snapshot | task_schedule | timer | index
    StructField("status", StringType()),     # snapshot only
    StructField("task_def_name", StringType()),   # task_schedule only
    StructField("thread_id", IntegerType()),
    StructField("task_run_position", IntegerType()),
    StructField("maturation_timestamp", LongType()),  # timer only
    StructField("seq", LongType()),          # snapshot only: max folded offset
    StructField("payload", StringType()),    # full JSON of the row's object
])

# Engine bookkeeping lives in the state tuple, NOT inside the WFRun
# JSON document: the document is the public surface (snapshots, index,
# lhctl get) and must contain only reference fields.  `max_offset`
# gives snapshots a monotonic sequence number (latest-wins selection
# in the query layer); `max_event_ts` drives the lateness bound;
# `pending_json` is the run's stored-timer list (the reference's timer
# store, SchedulerProcessor.java:56-60) and `tomb` marks an evicted
# terminal run (full document dropped, dedupe marker retained).
STATE_SCHEMA = StructType([
    StructField("state_json", StringType()),
    StructField("max_offset", LongType()),
    StructField("max_event_ts", LongType()),
    StructField("pending_json", StringType()),
    StructField("tomb", IntegerType()),
])

# A tombstone keeps exactly-once under redelivery (a duplicate
# WF_RUN_STARTED for an evicted run must NOT restart it) at ~40 bytes
# instead of the full multi-KB WFRun document — at 100× run
# cardinality the state store holds markers, not history.
_TOMB_STATE = ""


def _timer_key(t: dict) -> tuple:
    return (t["thread_run_id"], t["task_run_id"], t["maturation_timestamp"])


def emit_ctx_rows(out_rows: list, wf_run_id: str, ctx, pending: list) -> None:
    """Append a fold invocation's task-schedule and timer output rows
    (shared by the applyInPandasWithState and transformWithState
    engines; new timers also join `pending`, the run's stored-timer
    list)."""
    for tsr in ctx.to_schedule:
        out_rows.append({
            "wf_run_id": wf_run_id, "kind": "task_schedule",
            "status": None,
            "task_def_name": tsr["task_def_name"],
            "thread_id": tsr["thread_id"],
            "task_run_position": tsr["task_run_position"],
            "maturation_timestamp": None, "seq": None,
            "payload": json.dumps(tsr, separators=(",", ":")),
        })
    for timer in ctx.timers:
        pending.append(timer)
        out_rows.append({
            "wf_run_id": wf_run_id, "kind": "timer",
            "status": None, "task_def_name": None,
            "thread_id": timer["thread_run_id"],
            "task_run_position": timer["task_run_id"],
            "maturation_timestamp": timer["maturation_timestamp"],
            "seq": None,
            "payload": json.dumps(timer, separators=(",", ":")),
        })


def _ival(x) -> int:
    """None/NaN/garbage → 0, else int.  WF_EVENT_SCHEMA's offset and
    timestamp are nullable LongType; ONE null in a batch makes
    Arrow→pandas render the whole column float64 with NaN, and
    ``nan or 0`` is nan (truthy) — which would poison the sort key,
    make ``max()`` return nan, silently drop every later event at the
    lateness gate, and write a float into the Long state column."""
    try:
        if x is None or x != x:  # NaN != NaN
            return 0
        return int(x)
    except (TypeError, ValueError):
        return 0


def prepare_events(events: list[dict], max_offset: int, max_event_ts: int,
                   allowed_lateness_ms: int | None) -> tuple[list[dict], int, int]:
    """Order + bound a micro-batch group's events (shared by both
    stateful engines): sort by per-key offset (Structured Streaming
    gives no intra-batch order), drop events beyond the lateness
    allowance, and advance the key's (max_offset, max_event_ts) —
    `seq` must STRICTLY increase whenever events fold, so an
    out-of-order event with a stale offset still bumps it.
    Offsets/timestamps are normalized in place (None/NaN → 0) so the
    fold downstream never sees a pandas-nullified float."""
    for e in events:
        e["offset"] = _ival(e.get("offset"))
        e["timestamp"] = _ival(e.get("timestamp"))
    events = sorted(events, key=lambda e: e["offset"])
    if allowed_lateness_ms is not None:
        max_seen = max_event_ts
        kept = []
        for e in events:
            ts = e["timestamp"]
            max_seen = max(max_seen, ts)
            # TIMER_EVENTs are engine-internal control flow, late BY
            # CONSTRUCTION (their timestamp is the maturation time,
            # and a delayed pump injects them after the key's
            # event-time has moved on).  Dropping one would strand
            # its SLEEP forever — the pump's fired-ledger never
            # re-injects.  The lateness policy exists for EXTERNAL
            # data, so control events bypass it.
            if (e.get("event_type") == "TIMER_EVENT"
                    or ts >= max_seen - allowed_lateness_ms):
                kept.append(e)
        events = kept
    max_event_ts = max(
        [max_event_ts] + [e["timestamp"] for e in events])
    prev_max_offset = max_offset
    max_offset = max([max_offset] + [e["offset"] for e in events])
    if events and max_offset <= prev_max_offset:
        max_offset = prev_max_offset + 1
    return events, max_offset, max_event_ts


def snapshot_row(wf_run_id: str, state: dict, max_offset: int) -> dict:
    """The S5 snapshot output row (SchedulerTopology.java:74-87)."""
    return {
        "wf_run_id": wf_run_id, "kind": "snapshot",
        "status": state["status"], "task_def_name": None,
        "thread_id": None, "task_run_position": None,
        "maturation_timestamp": None, "seq": max_offset,
        "payload": json.dumps(state, separators=(",", ":")),
    }


def index_diff_rows(out_rows: list, wf_run_id: str, old_aliases: set,
                    state: dict, max_offset: int) -> None:
    """CREATE/DELETE alias changelog rows for a changed run
    (ResourceIndexProcessor.java:41-131 semantics)."""
    from ..operators.run_index import doc_aliases

    new_aliases = doc_aliases(state)
    for op, pairs in (("DELETE", old_aliases - new_aliases),
                      ("CREATE", new_aliases - old_aliases)):
        for k, v in sorted(pairs):
            out_rows.append({
                "wf_run_id": wf_run_id, "kind": "index",
                "status": None, "task_def_name": None,
                "thread_id": None, "task_run_position": None,
                "maturation_timestamp": None, "seq": max_offset,
                "payload": json.dumps(
                    {"op": op, "key": k, "value": v},
                    separators=(",", ":")),
            })


def fire_matured_timers(spec: dict, executor, wf_run_id: str, state,
                        pending: list, max_offset: int, now_ms: int,
                        out_rows: list):
    """Fold every matured stored timer as a TIMER_EVENT; firing can
    create new timers (sequential SLEEPs), so loop to quiescence.
    Synthetic offsets continue the per-key sequence (+1 each) so
    snapshot `seq` stays monotonic.

    ONE implementation for BOTH stateful engines
    (applyInPandasWithState here, transformWithState in tws.py) — the
    firing order below is a cross-engine parity contract, so the
    twins share the code instead of promising byte-equality."""
    fired = False
    while True:
        matured = [t for t in pending
                   if t["maturation_timestamp"] <= now_ms]
        if not matured:
            break
        # Maturation order FIRST (thread/task ids only break ties):
        # the reference punctuator range-scans [0, now] by
        # maturation time (SchedulerProcessor), and the TimerPump
        # replay path injects events whose offsets are the
        # µs-scaled maturation timestamps — firing here in any
        # other order could diverge from both when one timer's
        # fold halts a thread whose own timer matured earlier.
        for t in sorted(matured,
                        key=lambda t: (t["maturation_timestamp"],
                                       t["thread_run_id"],
                                       t["task_run_id"])):
            pending.remove(t)
            max_offset += 1
            ev = {
                "wf_run_id": wf_run_id, "event_type": "TIMER_EVENT",
                "thread_id": t["thread_run_id"],
                "timestamp": t["maturation_timestamp"],
                "offset": max_offset, "content": json.dumps(t),
            }
            state, ctx = process_event(spec, state, ev, executor=executor)
            emit_ctx_rows(out_rows, wf_run_id, ctx, pending)
            fired = True
    return state, pending, max_offset, fired


def make_update_fn(spec: dict, executor: TaskExecutor | None = None,
                   allowed_lateness_ms: int | None = None,
                   native_timers: bool = False,
                   evict_completed: bool = False,
                   tombstone_ttl_ms: int | None = None):
    """Build the applyInPandasWithState update function for a spec.

    `allowed_lateness_ms`: Spark's watermark does NOT filter input
    rows for arbitrary stateful ops (it only drives state-timeout
    eviction), so event-time lateness is enforced here — events whose
    timestamp trails the key's max seen event-time by more than the
    allowance are dropped, deterministically per key.

    `native_timers` (requires ProcessingTimeTimeout): the engine fires
    its own stored timers — matured pending timers are folded as
    TIMER_EVENTs inside the update function, and a group-state timeout
    is armed for the earliest immature one, so a SLEEP completes with
    NO further input (the reference punctuator's "fires with no
    events" guarantee, SchedulerProcessor.java:56-60, 88-126).  Spark
    schedules empty micro-batches while processing-time timeouts are
    pending, which is what makes this self-contained.  Replay/parity
    paths leave this off: a deterministic replay wants an explicit
    TIMER_EVENT stream, not wall-clock reads.

    `evict_completed`: once a run reaches COMPLETED and its final
    snapshot is emitted, replace the state document with a tombstone.
    Late/duplicate deliveries for the run are dropped (exactly-once
    preserved) but the store no longer grows with run *history* —
    only with run *count*, and `tombstone_ttl_ms` (native mode)
    removes even the marker once the redelivery horizon passes.
    HALTED runs are NOT evicted: WF_RUN_RESUME_REQUEST must find
    their full document (fold.py resume semantics).
    """

    _emit = emit_ctx_rows

    def _fire_matured(wf_run_id: str, state, pending: list, max_offset: int,
                      now_ms: int, out_rows: list):
        return fire_matured_timers(spec, executor, wf_run_id, state,
                                   pending, max_offset, now_ms, out_rows)

    def _store(group_state: GroupState, state, max_offset: int,
               max_event_ts: int, pending: list, out_rows: list,
               wf_run_id: str, old_aliases: set | None = None) -> None:
        """Emit the per-batch snapshot (S5, SchedulerTopology.java:74-87;
        `seq` = max folded offset, a monotonic per-key version the query
        layer orders by — file-scan order is NOT write order), then
        persist state, tombstoning terminal runs when configured.

        `old_aliases`: the run's alias set BEFORE this batch's events —
        diffed against the new document to emit `kind='index'`
        CREATE/DELETE changelog rows (ResourceIndexProcessor.java:41-131
        semantics: the scheduler, which alone sees old+new state,
        publishes index diffs; downstream compaction is latest-op-wins).
        Index work per batch is O(changed runs), never O(index).
        """
        if old_aliases is not None:
            index_diff_rows(out_rows, wf_run_id, old_aliases, state, max_offset)
        out_rows.append(snapshot_row(wf_run_id, state, max_offset))
        if evict_completed and state["status"] == "COMPLETED":
            # Terminal run: stored timers can no longer change anything
            # (the fold's stale guards no-op a timer against a terminal
            # run, same as the reference punctuator firing late), so
            # any still pending are dropped rather than blocking
            # eviction — in replay mode (no wheel tick) an unmatured
            # task-timeout timer would otherwise pin the full document
            # forever.  One guard, one motion: drop timers + tombstone.
            group_state.update((_TOMB_STATE, max_offset, max_event_ts,
                                "[]", 1))
            if native_timers and tombstone_ttl_ms is not None:
                group_state.setTimeoutDuration(tombstone_ttl_ms)
            return
        _persist_and_arm(group_state, state, max_offset, max_event_ts,
                         pending)

    def _persist_and_arm(group_state: GroupState, state, max_offset: int,
                         max_event_ts: int, pending: list) -> None:
        """Persist live (non-tombstone) state and re-arm the timer
        wheel — the ONE place the state tuple shape and the
        earliest-immature-timer arming live (shared by _store and the
        spurious-wake path, which must not diverge)."""
        group_state.update((json.dumps(state, separators=(",", ":")),
                            max_offset, max_event_ts,
                            json.dumps(pending, separators=(",", ":")), 0))
        if native_timers and pending:
            # Arm for the earliest immature timer.  Processing-time
            # timeouts are cleared whenever the function runs for the
            # key, so re-arm on every invocation that leaves timers.
            next_mat = min(t["maturation_timestamp"] for t in pending)
            import time as _time
            delay = max(1, next_mat - int(_time.time() * 1000))
            group_state.setTimeoutDuration(delay)

    def update(key: tuple, pdf_iter: Iterator[pd.DataFrame],
               group_state: GroupState) -> Iterator[pd.DataFrame]:
        import time as _time

        (wf_run_id,) = key
        cols = [f.name for f in OUTPUT_SCHEMA.fields]
        state = None
        max_offset = 0
        max_event_ts = 0
        pending: list[dict] = []
        tomb = 0
        if group_state.exists:
            (state_json, max_offset, max_event_ts,
             pending_json, tomb) = group_state.get
            max_offset = max_offset or 0
            max_event_ts = max_event_ts or 0
            tomb = tomb or 0
            pending = json.loads(pending_json) if pending_json else []
            if not tomb:
                state = json.loads(state_json)
        # Alias set before this invocation's folding — the index diff
        # base (the fold mutates `state` in place, so capture now).
        from ..operators.run_index import doc_aliases

        old_aliases = doc_aliases(state)

        if group_state.hasTimedOut:
            # Timer wheel tick for this key — no input rows.
            if tomb:
                group_state.remove()  # redelivery horizon passed
                yield pd.DataFrame([], columns=cols)
                return
            out_rows: list = []
            now_ms = int(_time.time() * 1000)
            state, pending, max_offset, fired = _fire_matured(
                wf_run_id, state, pending, max_offset, now_ms, out_rows)
            if fired:
                _store(group_state, state, max_offset, max_event_ts,
                       pending, out_rows, wf_run_id, old_aliases)
            elif pending:
                # Spurious/early wake: just re-persist and re-arm
                # (shared helper — the state tuple shape must never
                # fork between this path and _store).
                _persist_and_arm(group_state, state, max_offset,
                                 max_event_ts, pending)
            yield pd.DataFrame(out_rows, columns=cols)
            return

        events: list[dict] = []
        for pdf in pdf_iter:
            events.extend(pdf.to_dict("records"))

        if tomb:
            # Evicted terminal run: every redelivered/late event is
            # dropped — the marker exists precisely to make this safe.
            if native_timers and tombstone_ttl_ms is not None:
                group_state.setTimeoutDuration(tombstone_ttl_ms)
            yield pd.DataFrame([], columns=cols)
            return

        events, max_offset, max_event_ts = prepare_events(
            events, max_offset, max_event_ts, allowed_lateness_ms)

        out_rows = []
        for ev in events:
            if ev.get("event_type") == "TIMER_EVENT":
                # Externally-injected firing (TimerPump replay path):
                # drain the matching stored timer so `pending` tracks
                # only live timers in every mode.
                try:
                    fired_key = _timer_key(json.loads(ev.get("content") or "{}"))
                    pending = [t for t in pending
                               if _timer_key(t) != fired_key]
                except (KeyError, ValueError, TypeError):
                    # TypeError: content that is valid JSON but not an
                    # object ('123', '[1]', 'null') — a poison pill
                    # must be tolerated, not crash the micro-batch
                    # (which would replay and crash forever).
                    pass
            state, ctx = process_event(spec, state, ev, executor=executor)
            _emit(out_rows, wf_run_id, ctx, pending)

        if state is not None and native_timers:
            state, pending, max_offset, _ = _fire_matured(
                wf_run_id, state, pending, max_offset,
                int(_time.time() * 1000), out_rows)

        if state is not None:
            _store(group_state, state, max_offset, max_event_ts,
                   pending, out_rows, wf_run_id, old_aliases)
        yield pd.DataFrame(out_rows, columns=cols)

    return update


def streaming_engine(events: DataFrame, spec: dict,
                     executor: TaskExecutor | None = None,
                     watermark_delay: str | None = None,
                     allowed_lateness_ms: int | None = None,
                     native_timers: bool = False,
                     evict_completed: bool = False,
                     tombstone_ttl_ms: int | None = None,
                     use_tws: bool = False) -> DataFrame:
    """events (streaming DF, WF_EVENT_SCHEMA) → tagged output stream.

    Late-data bound (SURVEY §2.10): `allowed_lateness_ms` drops
    events trailing the key's max event-time — enforced in the
    update function because Spark's watermark does not filter input
    rows for arbitrary stateful ops.  `watermark_delay` additionally
    declares the watermark on the stream (state-timeout eviction +
    downstream aggregations); both complement the fold's own
    stale-result guard for in-window out-of-order arrivals.

    `use_tws` selects the `transformWithStateInPandas` implementation
    (`tws.py`: typed state variables + per-timer native callbacks);
    default stays `applyInPandasWithState`.  Semantics are identical —
    the twin tests run both.
    """
    if use_tws:
        from .tws import streaming_engine_tws

        return streaming_engine_tws(
            events, spec, executor=executor,
            watermark_delay=watermark_delay,
            allowed_lateness_ms=allowed_lateness_ms,
            native_timers=native_timers,
            evict_completed=evict_completed,
            tombstone_ttl_ms=tombstone_ttl_ms)
    from ..session import ship_package

    ship_package(events.sparkSession)
    if watermark_delay is not None:
        events = events.withColumn(
            "event_time", F.timestamp_millis(F.col("timestamp"))
        ).withWatermark("event_time", watermark_delay)
    return events.groupBy("wf_run_id").applyInPandasWithState(
        make_update_fn(spec, executor, allowed_lateness_ms=allowed_lateness_ms,
                       native_timers=native_timers,
                       evict_completed=evict_completed,
                       tombstone_ttl_ms=tombstone_ttl_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=(GroupStateTimeout.ProcessingTimeTimeout if native_timers
                     else GroupStateTimeout.NoTimeout),
    )


def split_outputs(tagged: DataFrame) -> dict[str, DataFrame]:
    """S4/S5 split: one tagged stream → per-sink streams (P1/P2)."""
    return {
        "snapshots": tagged.where(F.col("kind") == "snapshot")
                           .select("wf_run_id", "status", "payload"),
        "task_schedule": tagged.where(F.col("kind") == "task_schedule")
                               .select("wf_run_id", "task_def_name",
                                       "thread_id", "task_run_position", "payload"),
        "timers": tagged.where(F.col("kind") == "timer")
                        .select("wf_run_id", "thread_id", "task_run_position",
                                "maturation_timestamp", "payload"),
        "index": tagged.where(F.col("kind") == "index")
                       .select("wf_run_id", "seq", "payload"),
    }


_ROCKSDB_PROVIDER = ("org.apache.spark.sql.execution.streaming."
                     "state.RocksDBStateStoreProvider")


# A micro-batch at or under this row count is appended + upserted
# driver-side from one toArrow() collection (see the continuous
# sink): live serving emits a handful of rows per trigger, and each
# extra Spark job there is ~0.15-0.4 s of scheduler overhead on the
# command-latency path.  Backfills blow past it and stay distributed.
_SMALL_BATCH_ROWS = int(os.environ.get("LH_SPARK_SMALL_BATCH_ROWS", "5000"))


def _append_output_arrow(tbl, output_dir: str) -> None:
    """Append one collected micro-batch to the changelog directory as
    a single parquet file (driver-side twin of
    ``batch_df.write.mode("append")`` for small batches).  Write-then-
    rename so a concurrent reader's listing never sees a torn file."""
    import uuid as _uuid

    import pyarrow.parquet as _pq

    os.makedirs(output_dir, exist_ok=True)
    name = f"part-drv-{_uuid.uuid4().hex[:16]}.parquet"
    tmp = os.path.join(output_dir, f".{name}.tmp")
    _pq.write_table(tbl, tmp)
    # fsync data BEFORE the rename: without it a power loss can keep
    # the rename but drop the contents, leaving a truncated file under
    # its final name that permanently poisons the changelog stream
    # source (Spark's committer-based append this replaces does not
    # have that torn-final-name mode).  Directory fsync after, so the
    # rename itself is durable too (ADVICE r8).
    fd = os.open(tmp, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)
    os.replace(tmp, os.path.join(output_dir, name))
    dfd = os.open(output_dir, os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)


def _upsert_shared_arrow(tbl, serving_dirs: dict[str, str]) -> None:
    """Driver-side twin of the shared sink's attribution + per-spec
    upsert for a collected small batch: each row joins to its run's
    spec via the batch's own snapshot payloads (the update fn emits a
    snapshot row in every invocation that emits index rows, so every
    serving-relevant run has one in-batch)."""
    import pyarrow as pa

    from ..sinks.serving import upsert_serving_stores_arrow

    # ArrowDtype keeps nullable int64 columns (seq is null on
    # task_schedule/timer rows) from degrading to float64, which
    # would write DOUBLE seq into an int64 store.
    pdf = tbl.to_pandas(types_mapper=pd.ArrowDtype)
    snaps = pdf[pdf["kind"] == "snapshot"]
    run_spec = {r: json.loads(p).get("wf_spec_name")
                for r, p in zip(snaps["wf_run_id"], snaps["payload"])}
    specs = pdf["wf_run_id"].map(run_spec.get)
    for name in sorted({s for s in specs if s is not None}):
        sdir = serving_dirs.get(name)
        if sdir is not None:
            upsert_serving_stores_arrow(
                pa.Table.from_pandas(pdf[specs == name],
                                     preserve_index=False), sdir)


def _tws_confs(use_tws: bool) -> dict[str, str]:
    """`transformWithStateInPandas` requires a state store that
    supports multiple column families (one per typed state variable /
    timer store) — Spark's RocksDB provider, not the default
    HDFS-backed one.  Fitting: RocksDB is exactly what the
    reference's stores run on (SURVEY §2.1 S6).  The provider class
    is read at query START, so callers scope it around `.start()`."""
    if not use_tws:
        return {}
    return {"spark.sql.streaming.stateStore.providerClass":
            _ROCKSDB_PROVIDER}


def start_continuous(spark: SparkSession, events_dir: str, spec: dict,
                     checkpoint_dir: str, output_dir: str,
                     executor: TaskExecutor | None = None,
                     trigger_seconds: float = 0.5,
                     native_timers: bool = True,
                     evict_completed: bool = True,
                     tombstone_ttl_ms: int | None = None,
                     serving_dir: str | None = None,
                     use_tws: bool = False,
                     state_partitions: int | None = None,
                     max_files_per_trigger: int | None = None):
    """Start the engine as a continuously-running query (ProcessingTime
    trigger ~ the reference's 1 s punctuator cadence, Constants.java:36).

    The live path defaults to self-contained timers (a SLEEP completes
    with no external pump and no further input — Spark keeps scheduling
    micro-batches while processing-time timeouts are armed) and to
    tombstone eviction of COMPLETED runs.  Returns the StreamingQuery
    handle.

    `serving_dir`: also maintain the compacted point-lookup stores
    (`sinks/serving.py` — the reference's materialized RocksDB serving
    layer, APIStreamsContext.java:62-83) from each micro-batch; GETs
    then read one bucket partition instead of re-windowing the raw
    changelog.

    `state_partitions`: right-size the engine's state-store fanout
    (fixed at FIRST query start from `spark.sql.shuffle.partitions`;
    an existing checkpoint keeps its own).  Every state partition
    costs one store commit + one Arrow Python round-trip PER
    MICRO-BATCH even when idle — at the session's analytic default
    (32) an idle batch measured ~1.1 s, at 8 it is ~3x cheaper, which
    directly bounds command latency (the read-your-writes barrier
    waits out in-flight batches).  Size to the deployment's run-rate:
    a keyspace of thousands of concurrent runs wants the default
    analytic fanout or more; a serving-latency deployment wants few.
    Scoped to this query's start — the session default is restored.

    `max_files_per_trigger`: the file source's coarse admission cap
    (Kafka's `maxOffsetsPerTrigger` twin at FILE granularity) — with
    one-file-per-command production it bounds how much of a restart
    backlog any single micro-batch folds, keeping batch time (and so
    the read-your-writes barrier) bounded during catch-up.  FIFO file
    order is preserved, so a live command still queues behind
    remaining backlog files; for row-granular pacing that keeps new
    runs at idle-grade latency, wrap the bulk import in
    `streaming.admission.CatchUpAdmission` instead (source-side, so
    it applies identically to the tws engine)."""
    from ..engine.batch import WF_EVENT_SCHEMA

    reader = spark.readStream.schema(WF_EVENT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger",
                               str(max_files_per_trigger))
    events = reader.parquet(events_dir)
    tagged = streaming_engine(events, spec, executor=executor,
                              native_timers=native_timers,
                              evict_completed=evict_completed,
                              tombstone_ttl_ms=tombstone_ttl_ms,
                              use_tws=use_tws)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        # ONE count materializes the batch into the cache and gates
        # everything: with native timers armed, Spark triggers
        # continuously even while idle, and the previous
        # unconditional write + upsert probes cost ~3 empty jobs
        # (~1 s) per idle trigger — which floors command latency,
        # since the read-your-writes barrier waits out in-flight
        # batches.  Batch 0 always writes so the output dir carries a
        # readable schema from deploy time (downstream
        # spark.read.parquet of an empty-but-created dir would fail
        # schema inference).
        batch_df.persist()
        try:
            cnt = batch_df.count()
            if cnt == 0 and batch_id > 0:
                return
            if 0 < cnt <= _SMALL_BATCH_ROWS:
                # Small live batch: collect ONCE from the cache and do
                # changelog append + both serving upserts driver-side —
                # one Spark job total instead of three, the dominant
                # term in command round-trip latency.  At-least-once
                # append semantics are unchanged (a Spark re-append on
                # batch redelivery duplicates rows the same way).
                from ..sinks.serving import upsert_serving_stores_arrow

                tbl = batch_df.toArrow()
                _append_output_arrow(tbl, output_dir)
                if serving_dir is not None:
                    upsert_serving_stores_arrow(tbl, serving_dir)
                return
            batch_df.write.mode("append").parquet(output_dir)
            if serving_dir is not None:
                from ..sinks.serving import upsert_serving_stores

                upsert_serving_stores(batch_df, serving_dir)
        finally:
            # foreachBatch retries re-enter this function; without
            # the finally, a failed upsert would leak one cached
            # copy per attempt into executor storage memory.
            batch_df.unpersist()

    from ..session import scoped_conf

    confs = _tws_confs(use_tws)
    if state_partitions is not None:
        confs = {**confs,
                 "spark.sql.shuffle.partitions": str(state_partitions)}
    fresh = _fresh_checkpoint(checkpoint_dir)
    with scoped_conf(spark, confs):
        q = (
            tagged.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", checkpoint_dir)
            .trigger(processingTime=f"{trigger_seconds} seconds")
            .start()
        )
    q._lh_fresh_start = fresh  # see await_read_your_writes
    q._lh_capped_admission = max_files_per_trigger is not None
    return q


def _fresh_checkpoint(checkpoint_dir: str) -> bool:
    """True iff the checkpoint has NO committed offsets — i.e. this
    query run cannot begin with a WAL-recovery replay, so the
    read-your-writes barrier may trust its first progress entry
    (stamped on the query as `_lh_fresh_start`).  Checked BEFORE
    .start(): afterwards the running query itself writes offsets."""
    try:
        return not os.listdir(os.path.join(checkpoint_dir, "offsets"))
    except FileNotFoundError:
        return True


def start_continuous_shared(spark: SparkSession, events_dir: str,
                            specs: list[dict], checkpoint_dir: str,
                            output_dir: str, serving_dirs: dict[str, str],
                            executor: TaskExecutor | None = None,
                            trigger_seconds: float = 0.5,
                            use_tws: bool = False,
                            state_partitions: int | None = None,
                            max_files_per_trigger: int | None = None):
    """ONE engine for ALL deployed specs (SURVEY §7 ops profile: 100
    specs should not need 100 checkpoints/state stores).

    The reference deploys one scheduler app per WFSpec
    (`Scheduler.java:29-47`); this is the consolidated alternative the
    fold already supports: the update function receives a
    `make_spec_registry` dict and each run resolves its pinned spec
    per event (`fold.resolve_spec`).  One events directory (the shared
    event topic — rows carry `wf_spec_name`), one checkpoint, one
    state store; serving stays PER SPEC.

    Per-spec serving routing: the update fn emits a snapshot row in
    every invocation that emits index rows (`_store`), and the
    snapshot payload carries `wf_spec_name` — so a broadcast join of
    the batch against its own snapshot rows attributes every serving
    row to its spec without widening OUTPUT_SCHEMA.  The driver loop
    is over specs PRESENT IN THE BATCH (bounded by deployed-spec
    count); at 100s of specs you would instead add a spec partition
    column to the store root — same motion, one pass.
    """
    from ..engine.batch import WF_EVENT_SCHEMA
    from ..engine.fold import make_spec_registry

    registry = make_spec_registry(specs)
    reader = spark.readStream.schema(WF_EVENT_SCHEMA)
    if max_files_per_trigger is not None:
        # Coarse catch-up admission cap — see start_continuous; the
        # row-granular pacer is streaming.admission.CatchUpAdmission.
        reader = reader.option("maxFilesPerTrigger",
                               str(max_files_per_trigger))
    events = reader.parquet(events_dir)
    tagged = streaming_engine(events, registry, executor=executor,
                              native_timers=True, evict_completed=True,
                              use_tws=use_tws)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        from ..sinks.serving import upsert_serving_stores

        batch_df.persist()
        attributed = None
        try:
            # Idle-trigger short-circuit — same rationale as the
            # per-spec sink above (batch 0 stamps the output schema).
            cnt = batch_df.count()
            if cnt == 0 and batch_id > 0:
                return
            if 0 < cnt <= _SMALL_BATCH_ROWS:
                # Small live batch: one collection, then append +
                # per-spec attribution + upserts driver-side (the
                # per-spec sink's motion; attribution joins each row
                # to its run's snapshot-payload wf_spec_name).
                tbl = batch_df.toArrow()
                _append_output_arrow(tbl, output_dir)
                _upsert_shared_arrow(tbl, serving_dirs)
                return
            batch_df.write.mode("append").parquet(output_dir)
            run_spec = (
                batch_df.where(F.col("kind") == "snapshot")
                .select("wf_run_id",
                        F.get_json_object("payload", "$.wf_spec_name")
                        .alias("_spec"))
                .distinct())
            attributed = (batch_df
                          .join(F.broadcast(run_spec), "wf_run_id", "left")
                          .persist())
            present = [r["_spec"] for r in
                       attributed.select("_spec").distinct().collect()
                       if r["_spec"] is not None]
            for name in present:
                sdir = serving_dirs.get(name)
                if sdir is not None:
                    upsert_serving_stores(
                        attributed.where(F.col("_spec") == name)
                        .drop("_spec"), sdir)
        finally:
            # A failed upsert re-enters on retry; the finally keeps
            # each attempt from leaking two cached copies of the batch.
            if attributed is not None:
                attributed.unpersist()
            batch_df.unpersist()

    from ..session import scoped_conf

    confs = _tws_confs(use_tws)
    if state_partitions is not None:
        confs = {**confs,
                 "spark.sql.shuffle.partitions": str(state_partitions)}
    fresh = _fresh_checkpoint(checkpoint_dir)
    with scoped_conf(spark, confs):
        q = (
            tagged.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", checkpoint_dir)
            .trigger(processingTime=f"{trigger_seconds} seconds")
            .start()
        )
    q._lh_fresh_start = fresh  # see await_read_your_writes
    q._lh_capped_admission = max_files_per_trigger is not None
    return q


def await_read_your_writes(query, timeout: float = 60.0) -> None:
    """Read-your-writes barrier: block until the engine has folded
    everything produced before this call.

    The reference polls the consumer's stored offset until it passes
    the produce offset, 50 ms at a time
    (`APIStreamsContext.java:168-222`, poll at 200-203).  On a
    micro-batch engine the equivalent is: wait for a completed trigger
    that *started* after this call and *listed the source fresh*.  An
    UNCAPPED continuous query (the default) consumes every file
    visible at a trigger's start — including this call's write —
    whether it read zero rows (someone else's batch already drained
    it) or many (it carried the write itself).

    When the starter capped admission (`max_files_per_trigger`, the
    coarse catch-up knob — stamped as `_lh_capped_admission`), a
    post-write trigger may have taken only older backlog files, so
    "started after the call" proves nothing.  The sufficient capped
    condition is a post-write batch with ZERO input rows: under FIFO
    file admission an empty batch means the source listing was empty,
    i.e. every earlier file — this write included — was already
    consumed.  That makes the barrier wait out the whole backlog,
    which is exactly what a capped FIFO source means; deployments
    that need idle-grade POST latency during catch-up should pace the
    backlog through `streaming.admission.CatchUpAdmission` (spooled
    events become barrier-visible only after release — call its
    `drain()` first when barriering on a spooled key) and leave the
    reader uncapped.

    Two progress entries must NOT satisfy the barrier:

    - a batch that began BEFORE the write and finished after the call
      (its listing predates the file) — excluded by `started > t0`;
    - the FIRST batch of a query run, which may be a WAL-recovery
      replay: on restart Structured Streaming re-executes the last
      planned-but-uncommitted batch with the file list it WROTE TO
      THE OFFSET LOG before the restart, so its progress timestamp is
      post-restart while its contents predate this write.  (Observed
      deterministically: POST against a just-restarted engine saw the
      recovery batch report 0 rows 30 ms after the write and served a
      404 for a run whose event hadn't been folded.)  Excluded by
      requiring `batchId > the first batchId this run reported` —
      each StreamingQuery object's progress buffer belongs to its own
      run, so the buffer's head is at or before the recovery batch,
      and only the recovery batch can carry a stale listing.

      EXCEPT when the starter stamped `_lh_fresh_start` (checkpoint
      had no committed offsets at start): a fresh run cannot begin
      with a recovery replay, so the head batch is trusted like any
      other.  Without this, an engine that schedules batches only on
      input (native_timers=False — the pump/replay deployments) would
      starve the FIRST post-start barrier forever: the write's own
      batch is the head, and no successor ever fires.
    """
    import time as _time
    from datetime import datetime, timezone

    trust_head = getattr(query, "_lh_fresh_start", False)
    capped = getattr(query, "_lh_capped_admission", False)
    t0 = datetime.now(timezone.utc)
    deadline = _time.monotonic() + timeout
    while _time.monotonic() < deadline:
        recent = query.recentProgress
        p = recent[-1] if recent else None
        if p:
            started = datetime.strptime(
                p["timestamp"], "%Y-%m-%dT%H:%M:%S.%fZ"
            ).replace(tzinfo=timezone.utc)
            if (started > t0
                    and (trust_head
                         or p["batchId"] > recent[0]["batchId"])
                    and (not capped or p.get("numInputRows", 0) == 0)):
                return
        _time.sleep(0.05)  # the reference's 50 ms poll
    raise TimeoutError("read-your-writes barrier timed out")


def run_streaming_availablenow(spark: SparkSession, events_dir: str, spec: dict,
                               checkpoint_dir: str, output_dir: str,
                               executor: TaskExecutor | None = None,
                               max_files_per_trigger: int | None = None,
                               evict_completed: bool = False,
                               shuffle_partitions: int | None = None,
                               use_tws: bool = False) -> DataFrame:
    """Run the engine over a parquet directory of events with an
    Available-Now trigger, appending tagged outputs to `output_dir`
    via foreachBatch (fault-tolerant: the checkpoint is recoverable,
    unlike a memory sink); returns the accumulated output DataFrame.

    This is the replay/backfill harness and the integration-test
    driver: with `max_files_per_trigger=1` each file becomes its own
    micro-batch, exercising cross-batch state persistence exactly as
    a live Kafka feed would.  In production the foreachBatch body is
    the idempotent Kafka/Delta dual-sink (exactly-once via dedupe on
    (wf_run_id, thread_id, task_run_position, attempt_number) —
    BASELINE.md part B).

    `shuffle_partitions` right-sizes the state store for the replay's
    keyspace: state partition count is fixed at query start from
    `spark.sql.shuffle.partitions`, and each partition costs a state
    commit + an Arrow Python round-trip per micro-batch — a 150-key
    replay on the session's 32 analytic partitions pays 32x that for
    nothing.  Scoped to this query; the session default is restored.
    """
    from ..engine.batch import WF_EVENT_SCHEMA
    from ..session import scoped_conf

    confs = ({"spark.sql.shuffle.partitions": str(shuffle_partitions)}
             if shuffle_partitions is not None else {})
    confs.update(_tws_confs(use_tws))
    with scoped_conf(spark, confs):
        reader = spark.readStream.schema(WF_EVENT_SCHEMA)
        if max_files_per_trigger is not None:
            reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
        events = reader.parquet(events_dir)
        tagged = streaming_engine(events, spec, executor=executor,
                                  evict_completed=evict_completed,
                                  use_tws=use_tws)

        def sink(batch_df: DataFrame, batch_id: int) -> None:
            batch_df.write.mode("append").parquet(output_dir)

        q = (
            tagged.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            # A truncated replay must be an ERROR, not a silently
            # short output a parity gate would misread as data drift.
            q.stop()
            raise TimeoutError(
                "availableNow replay did not finish within 300s; "
                "output would be truncated")
    return spark.read.parquet(output_dir)
