"""Index-layer unit tests: alias extraction rules and latest-snapshot
selection (ADVICE round-1 fixes pinned)."""

from __future__ import annotations

import json
import shutil
import tempfile
from pathlib import Path

import pyspark.sql.functions as F

from old_original_java_little_horse_spark.operators.run_index import alias_rows


def _snap_df(spark, runs):
    return spark.createDataFrame(
        [(r["id"], r.get("status", "COMPLETED"),
          json.dumps({"id": r["id"], "thread_runs": r["threads"]}))
         for r in runs],
        "wf_run_id string, status string, state_json string",
    )


def test_alias_rows_index_by_declared_type_not_value_shape(spark):
    """A STRING variable whose content renders numeric/boolean must be
    indexed (reference `instanceof String`, WFRun.java:328-330); an INT
    variable must not be, even when its rendering looks stringy."""
    snaps = _snap_df(spark, [{
        "id": "r1",
        "threads": [{
            "id": 0,
            "variables": {"order_no": "42", "flag_str": "true",
                          "count": 7, "label": "plain"},
            "var_types": {"order_no": "STRING", "flag_str": "STRING",
                          "count": "INT", "label": "STRING"},
        }],
    }])
    got = {(r["key"], r["value"])
           for r in alias_rows(snaps).where(F.col("key") != "name").collect()}
    assert got == {("order_no", "42"), ("flag_str", "true"), ("label", "plain")}


def test_alias_rows_name_alias_and_multi_thread(spark):
    snaps = _snap_df(spark, [{
        "id": "r9",
        "threads": [
            {"id": 0, "variables": {"a": "x"}, "var_types": {"a": "STRING"}},
            {"id": 1, "variables": {"b": "y"}, "var_types": {"b": "STRING"}},
        ],
    }])
    got = {(r["key"], r["value"]) for r in alias_rows(snaps).collect()}
    assert got == {("name", "r9"), ("a", "x"), ("b", "y")}


def test_latest_snapshot_selected_by_seq_not_scan_order(spark):
    """cli._snapshots must pick the snapshot with the highest `seq`
    (max folded offset), not whichever parquet file the scan reads
    first — Spark bin-packs input files largest-first, so scan order
    actively disagrees with write order here: the OLD (seq=1) snapshot
    is written as a much larger file than the newer one."""
    from old_original_java_little_horse_spark.cli import _snapshots

    workdir = Path(tempfile.mkdtemp(prefix="seq-order-"))
    try:
        cols = ("wf_run_id string, kind string, status string, "
                "task_def_name string, thread_id int, task_run_position int, "
                "maturation_timestamp long, seq long, payload string")
        old = spark.createDataFrame(
            [("r1", "snapshot", "RUNNING", None, None, None, None, 1,
              json.dumps({"status": "RUNNING", "pad": "x" * 20000}))],
            cols)
        new = spark.createDataFrame(
            [("r1", "snapshot", "COMPLETED", None, None, None, None, 2,
              json.dumps({"status": "COMPLETED"}))],
            cols)
        old.coalesce(1).write.mode("append").parquet(str(workdir / "out"))
        new.coalesce(1).write.mode("append").parquet(str(workdir / "out"))
        rows = _snapshots(spark, str(workdir / "out")).collect()
        assert len(rows) == 1
        assert rows[0]["status"] == "COMPLETED"
        assert json.loads(rows[0]["state_json"])["status"] == "COMPLETED"
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
