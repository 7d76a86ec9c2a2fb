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
- Timers (`kind='timer'`) are re-injected as TIMER_EVENTs by the
  driver loop (`run_streaming_availablenow`) between passes; the
  punctuator equivalent for continuous mode is a
  `Trigger.ProcessingTime("1 second")` re-injection query, matching
  the reference's 1 s resolution (`Constants.java:36`).
"""

from __future__ import annotations

import json
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
    StructField("kind", StringType()),       # snapshot | task_schedule | timer
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
# in the query layer); `max_event_ts` drives the lateness bound.
STATE_SCHEMA = StructType([
    StructField("state_json", StringType()),
    StructField("max_offset", LongType()),
    StructField("max_event_ts", LongType()),
])


def make_update_fn(spec: dict, executor: TaskExecutor | None = None,
                   allowed_lateness_ms: int | None = None):
    """Build the applyInPandasWithState update function for a spec.

    `allowed_lateness_ms`: Spark's watermark does NOT filter input
    rows for arbitrary stateful ops (it only drives state-timeout
    eviction), so event-time lateness is enforced here — events whose
    timestamp trails the key's max seen event-time by more than the
    allowance are dropped, deterministically per key.
    """

    def update(key: tuple, pdf_iter: Iterator[pd.DataFrame],
               group_state: GroupState) -> Iterator[pd.DataFrame]:
        (wf_run_id,) = key
        state = None
        max_offset = 0
        max_event_ts = 0
        if group_state.exists:
            (state_json, max_offset, max_event_ts) = group_state.get
            state = json.loads(state_json)
            max_offset = max_offset or 0
            max_event_ts = max_event_ts or 0

        events: list[dict] = []
        for pdf in pdf_iter:
            events.extend(pdf.to_dict("records"))
        # Structured Streaming gives no intra-batch order — sort by the
        # per-key offset (Kafka partition order in the reference).
        events.sort(key=lambda e: e.get("offset") or 0)

        if allowed_lateness_ms is not None:
            max_seen = max_event_ts
            kept = []
            for e in events:
                ts = e.get("timestamp") or 0
                max_seen = max(max_seen, ts)
                if ts >= max_seen - allowed_lateness_ms:
                    kept.append(e)
            events = kept
        max_event_ts = max(
            [max_event_ts] + [e.get("timestamp") or 0 for e in events])
        max_offset = max([max_offset] + [e.get("offset") or 0 for e in events])

        out_rows = []
        for ev in events:
            state, ctx = process_event(spec, state, ev, executor=executor)
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
                out_rows.append({
                    "wf_run_id": wf_run_id, "kind": "timer",
                    "status": None, "task_def_name": None,
                    "thread_id": timer["thread_run_id"],
                    "task_run_position": timer["task_run_id"],
                    "maturation_timestamp": timer["maturation_timestamp"],
                    "seq": None,
                    "payload": json.dumps(timer, separators=(",", ":")),
                })

        if state is not None:
            group_state.update((json.dumps(state, separators=(",", ":")),
                                max_offset, max_event_ts))
            # One snapshot per batch with events for this key — the S5
            # contract (SchedulerTopology.java:74-87).  `seq` is the max
            # folded offset: a monotonic per-key version the query layer
            # orders by (file-scan order is NOT write order).
            out_rows.append({
                "wf_run_id": wf_run_id, "kind": "snapshot",
                "status": state["status"], "task_def_name": None,
                "thread_id": None, "task_run_position": None,
                "maturation_timestamp": None, "seq": max_offset,
                "payload": json.dumps(state, separators=(",", ":")),
            })
        cols = [f.name for f in OUTPUT_SCHEMA.fields]
        yield pd.DataFrame(out_rows, columns=cols)

    return update


def streaming_engine(events: DataFrame, spec: dict,
                     executor: TaskExecutor | None = None,
                     watermark_delay: str | None = None,
                     allowed_lateness_ms: int | None = None) -> DataFrame:
    """events (streaming DF, WF_EVENT_SCHEMA) → tagged output stream.

    Late-data bound (SURVEY §2.10): `allowed_lateness_ms` drops
    events trailing the key's max event-time — enforced in the
    update function because Spark's watermark does not filter input
    rows for arbitrary stateful ops.  `watermark_delay` additionally
    declares the watermark on the stream (state-timeout eviction +
    downstream aggregations); both complement the fold's own
    stale-result guard for in-window out-of-order arrivals.
    """
    from ..session import ship_package

    ship_package(events.sparkSession)
    if watermark_delay is not None:
        events = events.withColumn(
            "event_time", F.timestamp_millis(F.col("timestamp"))
        ).withWatermark("event_time", watermark_delay)
    return events.groupBy("wf_run_id").applyInPandasWithState(
        make_update_fn(spec, executor, allowed_lateness_ms=allowed_lateness_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
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
    }


def start_continuous(spark: SparkSession, events_dir: str, spec: dict,
                     checkpoint_dir: str, output_dir: str,
                     executor: TaskExecutor | None = None,
                     trigger_seconds: float = 0.5):
    """Start the engine as a continuously-running query (ProcessingTime
    trigger ~ the reference's 1 s punctuator cadence, Constants.java:36).
    Returns the StreamingQuery handle."""
    from ..engine.batch import WF_EVENT_SCHEMA

    events = spark.readStream.schema(WF_EVENT_SCHEMA).parquet(events_dir)
    tagged = streaming_engine(events, spec, executor=executor)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(output_dir)

    return (
        tagged.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )


def await_read_your_writes(query, timeout: float = 60.0) -> None:
    """Read-your-writes barrier: block until the engine has folded
    everything produced before this call.

    The reference polls the consumer's stored offset until it passes
    the produce offset, 50 ms at a time
    (`APIStreamsContext.java:168-222`, poll at 200-203).  On a
    micro-batch engine the equivalent is: wait for a trigger that ran
    *after* the call and read zero input rows — all earlier input is
    then committed to the state store and sinks.
    """
    import time as _time

    start_batch = (query.lastProgress or {}).get("batchId", -1)
    deadline = _time.monotonic() + timeout
    while _time.monotonic() < deadline:
        p = query.lastProgress
        if p and p["batchId"] > start_batch and p["numInputRows"] == 0:
            return
        _time.sleep(0.05)  # the reference's 50 ms poll
    raise TimeoutError("read-your-writes barrier timed out")


def run_streaming_availablenow(spark: SparkSession, events_dir: str, spec: dict,
                               checkpoint_dir: str, output_dir: str,
                               executor: TaskExecutor | None = None,
                               max_files_per_trigger: int | None = None) -> DataFrame:
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
    """
    from ..engine.batch import WF_EVENT_SCHEMA

    reader = spark.readStream.schema(WF_EVENT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    events = reader.parquet(events_dir)
    tagged = streaming_engine(events, spec, executor=executor)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(output_dir)

    q = (
        tagged.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.read.parquet(output_dir)
