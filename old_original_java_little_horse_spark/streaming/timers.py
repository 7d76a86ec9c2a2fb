"""Timer pump: the reference's wall-clock punctuator (ST2).

The scheduler stores timers and a 1 s punctuator range-scans
`[0, now]`, re-injecting TIMER_EVENTs (`SchedulerProcessor.java:
56-60, 88-126`; `Constants.java:36`).  Here the engine *emits* timer
rows (`kind='timer'`); the pump scans them each tick, re-injects the
matured ones as TIMER_EVENT rows on the event stream, and tracks
what it already fired (idempotent across pump restarts via a fired
ledger on disk).

At scale this is a tiny satellite streaming job (timer rows → delay
→ event topic); the fold tolerates duplicate or stale timer events
(late-timer guard), so at-least-once re-injection is safe.
"""

from __future__ import annotations

import json
import time
import uuid
from pathlib import Path

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


class TimerPump:
    def __init__(self, spark: SparkSession, output_dir: str, events_dir: str,
                 ledger_dir: str):
        self.spark = spark
        self.output_dir = output_dir
        self.events_dir = events_dir
        self.ledger = Path(ledger_dir)
        self.ledger.mkdir(parents=True, exist_ok=True)
        self._fired: set[str] = {
            p.stem for p in self.ledger.glob("*.fired")
        }

    def _timer_key(self, t: dict) -> str:
        return f"{t['wf_run_id']}-{t['thread_run_id']}-{t['task_run_id']}-{t['maturation_timestamp']}"

    def tick(self, now_ms: int | None = None) -> int:
        """One punctuation: fire every stored timer with
        maturation <= now.  Returns the number fired."""
        now_ms = now_ms if now_ms is not None else int(time.time() * 1000)
        try:
            out = self.spark.read.parquet(self.output_dir)
        except Exception:  # no output yet
            return 0
        timers = [
            json.loads(r["payload"])
            for r in out.where(
                (F.col("kind") == "timer")
                & (F.col("maturation_timestamp") <= now_ms)
            ).collect()
        ]
        to_fire = [t for t in timers if self._timer_key(t) not in self._fired]
        if not to_fire:
            return 0
        from ..engine.batch import WF_EVENT_SCHEMA

        rows = [(
            t["wf_run_id"], None, None, "TIMER_EVENT",
            t["thread_run_id"], t["maturation_timestamp"],
            # Offset on the SAME µs scale as the CLI/HTTP command
            # producer (time_ns()//1000): ms-scale offsets here would
            # sort every timer BEFORE the µs-scale command that created
            # it on replay, folding the timer against empty state (and
            # the ledger would never re-fire it).  maturation_µs is
            # always > the creating command's produce-time offset.
            t["maturation_timestamp"] * 1000,
            json.dumps(t),
        ) for t in to_fire]
        self.spark.createDataFrame(rows, schema=WF_EVENT_SCHEMA) \
            .coalesce(1).write.mode("append").parquet(
                str(Path(self.events_dir) / f"timers-{uuid.uuid4().hex[:12]}"))
        for t in to_fire:
            key = self._timer_key(t)
            self._fired.add(key)
            (self.ledger / f"{key}.fired").touch()
        return len(to_fire)

    def run(self, stop_after_s: float, interval_s: float = 1.0) -> None:
        """Punctuate every `interval_s` (the reference's 1 s cadence)."""
        deadline = time.monotonic() + stop_after_s
        while time.monotonic() < deadline:
            self.tick()
            time.sleep(interval_s)
