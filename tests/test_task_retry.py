"""Exactly-once under task retry — the cluster failure mode local
testing normally can't see.

On a 1000-executor cluster, tasks FAIL and are re-run (preemption,
OOM-kill, node loss).  Spark's guarantee is that a re-executed task
reproduces its partition from lineage — but only if the operator
inside is deterministic and side-effect-free.  The engine fold runs
arbitrary Python in `mapInPandas`, so that property is ours to prove,
not Spark's.

This test runs the batch fold in a SUBPROCESS whose SparkContext is
`local[4, 2]` (two task attempts allowed — the default local master
fails the job on first error), with a fault-injecting pass-through
stage that raises on the FIRST attempt of one partition.  The job
must succeed via retry and produce snapshots hash-identical to the
uninjected run: no lost events, no double-folded events, no
duplicated runs.

(A subprocess because a JVM allows one SparkContext and the session
fixture's `local[32]` master cannot be changed mid-process.)
"""

from __future__ import annotations

import subprocess
import sys
import textwrap

SCRIPT = textwrap.dedent("""
    import sys
    sys.path.insert(0, sys.argv[2])  # repo root, passed by the test

    from pyspark.sql import SparkSession
    from pyspark import TaskContext

    spark = (SparkSession.builder
             .master("local[4, 2]")            # 2 attempts per task
             .appName("retry-proof")
             .config("spark.sql.shuffle.partitions", "4")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from old_original_java_little_horse_spark.engine.batch import run_events_batch
    from old_original_java_little_horse_spark.sdk.builder import Workflow, var

    wf = Workflow("retry-wf")
    t = wf.thread("entrypoint")
    t.add_variable("n", "INT", default=0)
    n1 = t.execute("t1", x=var("n"))
    t.mutate(n1, "n", "ADD", literal=1)
    spec = wf.build()

    import json

    def ev(rid, event_type, offset, ts, content):
        return {"wf_run_id": rid, "wf_spec_id": "s", "wf_spec_name": "s",
                "event_type": event_type, "thread_id": 0,
                "timestamp": ts, "offset": offset,
                "content": json.dumps(content)}

    rows = []
    for i in range(40):
        rid = f"r{i}"
        rows.append(ev(rid, "WF_RUN_STARTED", 0, 1000,
                       {"variables": {"n": i}}))
        rows.append(ev(rid, "TASK_EVENT", 1, 1001,
                       {"thread_id": 0, "task_run_position": 0,
                        "started_event": {"worker_id": "w"}}))
        rows.append(ev(rid, "TASK_EVENT", 2, 1002,
                       {"thread_id": 0, "task_run_position": 0,
                        "ended_event": {"result": {"stdout": "1",
                                                   "success": True,
                                                   "returncode": 0}}}))
    events = spark.createDataFrame(rows)

    import os
    MARKER = sys.argv[1]  # proves the injected failure actually fired

    def flaky_passthrough(batches):
        ctx = TaskContext.get()
        if ctx.partitionId() == 0 and ctx.attemptNumber() == 0:
            open(MARKER, "w").close()
            raise RuntimeError("injected first-attempt failure")
        for b in batches:
            yield b

    def fold(with_fault: bool):
        src = events.repartition(4, "wf_run_id")
        if with_fault:
            src = src.mapInPandas(flaky_passthrough, schema=src.schema)
        out = run_events_batch(src, spec, num_partitions=4)
        return sorted((r["wf_run_id"], r["status"], r["n_tasks"],
                       r["state_json"]) for r in out.collect())

    clean = fold(with_fault=False)
    injected = fold(with_fault=True)
    assert len(clean) == 40, f"expected 40 runs, got {len(clean)}"
    statuses = {s for _, s, _, _ in clean}
    assert statuses == {"COMPLETED"}, statuses
    assert clean == injected, "retry changed the folded result"
    assert os.path.exists(MARKER), "fault never fired - proof is vacuous"
    print("RETRY-EXACTLY-ONCE-OK")
    spark.stop()
""")


def test_fold_is_exactly_once_under_task_retry(tmp_path):
    from pathlib import Path

    repo_root = str(Path(__file__).resolve().parents[1])
    script = tmp_path / "retry_proof.py"
    script.write_text(SCRIPT)
    marker = tmp_path / "fault_fired"
    r = subprocess.run([sys.executable, str(script), str(marker), repo_root],
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "RETRY-EXACTLY-ONCE-OK" in r.stdout, r.stdout[-2000:]
    assert marker.exists(), "injected failure never executed"
