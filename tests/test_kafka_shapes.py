"""Kafka source/sink shape tests: parse/format halves are pure
Catalyst expressions, testable on static DataFrames (no broker)."""

from __future__ import annotations

import json

from old_original_java_little_horse_spark.sources.kafka import (
    format_task_schedule, parse_wf_events,
)
from old_original_java_little_horse_spark.streaming.engine import OUTPUT_SCHEMA


def test_parse_wf_events_roundtrip(spark):
    payload = {
        "wf_run_id": "r1", "wf_spec_id": "s1", "wf_spec_name": "wf",
        "event_type": "WF_RUN_STARTED", "thread_id": 0,
        "timestamp": 1234, "offset": None,
        "content": json.dumps({"variables": {"x": 1}}),
    }
    raw = spark.createDataFrame(
        [(b"r1", json.dumps(payload).encode(), 77, None)],
        "key binary, value binary, offset long, timestamp timestamp",
    )
    row = parse_wf_events(raw).collect()[0]
    assert row["wf_run_id"] == "r1"
    assert row["event_type"] == "WF_RUN_STARTED"
    assert row["offset"] == 77  # kafka offset fills the JSON null
    assert json.loads(row["content"])["variables"] == {"x": 1}


def test_format_task_schedule_topic_column(spark):
    tagged = spark.createDataFrame(
        [("r1", "task_schedule", None, "send-email", 0, 0, None, None, '{"a":1}'),
         ("r1", "snapshot", "RUNNING", None, None, None, None, 3, "{}")],
        OUTPUT_SCHEMA,
    )
    rows = format_task_schedule(tagged).collect()
    assert len(rows) == 1  # snapshot filtered out
    assert rows[0]["topic"] == "send-email"
    assert bytes(rows[0]["key"]) == b"r1"
    assert json.loads(bytes(rows[0]["value"]))["a"] == 1
