"""Compacted serving stores (`sinks/serving.py`): latest-wins upsert,
bucket-partition pruning on point reads, tombstones that cannot be
resurrected by replayed CREATEs, and partial (changed-bucket-only)
rewrites."""

from __future__ import annotations

import json
import shutil
import tempfile
from pathlib import Path

import pyspark.sql.functions as F
import pytest

from old_original_java_little_horse_spark.sinks.serving import (
    read_all_snapshots, read_snapshot, search_aliases, snapshots_dir,
    upsert_serving_stores,
)
from old_original_java_little_horse_spark.streaming.engine import OUTPUT_SCHEMA


def _batch(spark, rows):
    def row(kind, run_id, seq, payload, status=None):
        return (run_id, kind, status, None, None, None, None, seq, payload)

    return spark.createDataFrame(
        [row(*r) for r in rows], schema=OUTPUT_SCHEMA)


def _snap(run_id, seq, status="RUNNING"):
    return ("snapshot", run_id, seq,
            json.dumps({"status": status, "seq": seq}), status)


def _idx(run_id, seq, op, key, value):
    return ("index", run_id, seq,
            json.dumps({"op": op, "key": key, "value": value}))


@pytest.fixture()
def store(spark):
    d = Path(tempfile.mkdtemp(prefix="serving-")) / "store"
    yield spark, str(d)
    shutil.rmtree(d.parent, ignore_errors=True)


def test_latest_wins_across_batches(store):
    spark, d = store
    upsert_serving_stores(_batch(spark, [_snap("r1", 1), _snap("r2", 1)]), d)
    upsert_serving_stores(
        _batch(spark, [_snap("r1", 5, "COMPLETED")]), d)
    got = {r["wf_run_id"]: r["status"]
           for r in read_all_snapshots(spark, d).collect()}
    assert got == {"r1": "COMPLETED", "r2": "RUNNING"}
    one = read_snapshot(spark, d, "r1").collect()
    assert len(one) == 1 and json.loads(one[0]["state_json"])["seq"] == 5


def test_point_read_is_partition_pruned(store):
    """The 100 TB contract: a GET touches ONE bucket directory — the
    bucket predicate must reach the scan as a partition filter, not a
    post-scan filter."""
    spark, d = store
    upsert_serving_stores(
        _batch(spark, [_snap(f"r{i}", 1) for i in range(40)]), d)
    plan = (read_snapshot(spark, d, "r7")
            ._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution
                .ExplainMode.fromString("formatted")))
    assert "PartitionFilters" in plan
    # the bucket literal appears inside the partition filter clause
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln][0]
    assert "bucket" in pf and "dynamicpruning" not in pf


def test_tombstoned_alias_not_resurrected_by_replay(store):
    spark, d = store
    upsert_serving_stores(
        _batch(spark, [_idx("r1", 1, "CREATE", "who", "ada")]), d)
    assert [r["wf_run_id"] for r in
            search_aliases(spark, d, "who", "ada").collect()] == ["r1"]
    upsert_serving_stores(
        _batch(spark, [_idx("r1", 2, "DELETE", "who", "ada")]), d)
    assert search_aliases(spark, d, "who", "ada").collect() == []
    # At-least-once replay of the OLD create (stale seq) — the DELETE
    # tombstone is retained in the store and still wins.
    upsert_serving_stores(
        _batch(spark, [_idx("r1", 1, "CREATE", "who", "ada")]), d)
    assert search_aliases(spark, d, "who", "ada").collect() == []


def test_upsert_rewrites_only_touched_buckets(store):
    """Dynamic partition overwrite: an upsert for one run must leave
    every other bucket's files untouched (O(changed buckets) work)."""
    spark, d = store
    upsert_serving_stores(
        _batch(spark, [_snap(f"r{i}", 1) for i in range(40)]), d)
    sd = Path(snapshots_dir(d))
    before = {p: p.stat().st_mtime_ns for p in sd.glob("bucket=*/*.parquet")}
    r7_bucket = (read_snapshot(spark, d, "r7")
                 .sparkSession.read.parquet(str(sd))
                 .where(F.col("wf_run_id") == "r7")
                 .select("bucket").collect()[0]["bucket"])
    upsert_serving_stores(_batch(spark, [_snap("r7", 9, "COMPLETED")]), d)
    after = {p: p.stat().st_mtime_ns for p in sd.glob("bucket=*/*.parquet")}
    untouched = {p for p in before
                 if not p.parent.name.endswith(f"={r7_bucket}")}
    for p in untouched:
        assert after.get(p) == before[p], f"{p} was rewritten"
    assert json.loads(read_snapshot(spark, d, "r7")
                      .collect()[0]["state_json"])["seq"] == 9


def test_nbuckets_pinned_at_creation(store, monkeypatch):
    """Bucket fanout is a creation-time property: later writers and
    readers must keep the original hash→bucket mapping even if the
    process-wide default changes (otherwise pruned point reads look in
    the wrong partition and miss live keys)."""
    from old_original_java_little_horse_spark.sinks import serving

    spark, d = store
    upsert_serving_stores(
        _batch(spark, [_snap(f"r{i}", 1) for i in range(20)]), d, n_buckets=4)
    sd = Path(snapshots_dir(d))
    assert (sd / ".nbuckets").read_text() == "4"
    assert {p.name for p in sd.glob("bucket=*")} <= {
        f"bucket={i}" for i in range(4)}
    # Default changes (new deploy, env override) — store keeps N=4.
    monkeypatch.setattr(serving, "N_BUCKETS", 64)
    upsert_serving_stores(_batch(spark, [_snap("r3", 9, "COMPLETED")]), d)
    assert {p.name for p in sd.glob("bucket=*")} <= {
        f"bucket={i}" for i in range(4)}
    for rid, want in [("r3", "COMPLETED"), ("r11", "RUNNING")]:
        rows = read_snapshot(spark, d, rid).collect()
        assert len(rows) == 1 and rows[0]["status"] == want


def test_corrupt_store_read_raises_not_lossy(store):
    """A real read failure on an existing store must propagate (so the
    micro-batch retries) — NOT silently degrade to a batch-only
    overwrite that drops previously-stored keys in touched buckets."""
    spark, d = store
    upsert_serving_stores(
        _batch(spark, [_snap(f"r{i}", 1) for i in range(20)]), d)
    for p in Path(snapshots_dir(d)).glob("bucket=*/*.parquet"):
        p.write_bytes(b"not a parquet footer")
    with pytest.raises(Exception):
        upsert_serving_stores(_batch(spark, [_snap("r1", 2)]), d)


def test_randomized_upserts_equal_global_compaction(store):
    """Equivalence property: any partition of a changelog into upsert
    batches must produce the same store as one global latest-wins
    compaction of the concatenated changelog (seeded random ops)."""
    import random

    spark, d = store
    rng = random.Random(42)
    runs = [f"r{i}" for i in range(12)]
    seq = 0
    log: list[tuple] = []
    for _ in range(3):  # 3 upsert batches
        batch = []
        for _ in range(rng.randint(3, 10)):
            seq += 1
            r = rng.choice(runs)
            status = rng.choice(["RUNNING", "COMPLETED", "HALTED"])
            batch.append(_snap(r, seq, status))
        log.extend(batch)
        upsert_serving_stores(_batch(spark, batch), d)

    # Brute-force: latest seq per run over the whole log.
    expect = {}
    for kind, run_id, s, payload, status in log:
        if run_id not in expect or s > expect[run_id][0]:
            expect[run_id] = (s, status)
    got = {r["wf_run_id"]: (json.loads(r["state_json"])["seq"], r["status"])
           for r in read_all_snapshots(spark, d).collect()}
    assert got == {k: v for k, v in expect.items()}


def test_premarker_store_stamped_with_legacy_fanout(store, monkeypatch):
    """A populated store written before the .nbuckets marker existed
    was hashed with the old hard-coded N=16.  On the first
    post-upgrade write it must be stamped with THAT legacy constant —
    not the env-configured current default, which would silently
    re-bucket the store and orphan every existing key's partition."""
    from old_original_java_little_horse_spark.sinks import serving

    spark, d = store
    upsert_serving_stores(
        _batch(spark, [_snap(f"r{i}", 1) for i in range(20)]), d)
    sd = Path(snapshots_dir(d))
    assert (sd / ".nbuckets").read_text() == "16"
    # Simulate the pre-marker store: marker absent, data present.
    (sd / ".nbuckets").unlink()
    ad = Path(serving.aliases_dir(d))
    if (ad / ".nbuckets").exists():
        (ad / ".nbuckets").unlink()
    # Operator upgrades with a bigger configured fanout.
    monkeypatch.setattr(serving, "N_BUCKETS", 64)
    upsert_serving_stores(_batch(spark, [_snap("r3", 9, "COMPLETED")]), d)
    assert (sd / ".nbuckets").read_text() == "16"
    assert {p.name for p in sd.glob("bucket=*")} <= {
        f"bucket={i}" for i in range(16)}
    for rid, want in [("r3", "COMPLETED"), ("r11", "RUNNING")]:
        rows = read_snapshot(spark, d, rid).collect()
        assert len(rows) == 1 and rows[0]["status"] == want


def test_corrupt_nbuckets_marker_raises(store):
    """An unparseable marker on an existing store is an integrity
    error: guessing (or re-stamping) the fanout could re-bucket a live
    store, so the write must refuse instead."""
    spark, d = store
    upsert_serving_stores(_batch(spark, [_snap("r1", 1)]), d)
    sd = Path(snapshots_dir(d))
    (sd / ".nbuckets").write_text("not-a-number")
    with pytest.raises(Exception, match="corrupt"):
        upsert_serving_stores(_batch(spark, [_snap("r1", 2)]), d)


def test_upsert_retry_is_idempotent(store):
    """foreachBatch delivers AT-LEAST-ONCE: a micro-batch whose commit
    raced a crash is re-delivered with the same rows.  Re-applying a
    batch (any number of times, in any interleaving with later
    batches) must leave the store byte-for-byte as if applied once —
    the property that turns retry into exactly-once at the store."""
    spark, d = store
    b1 = [_snap("r1", 1), _snap("r2", 1), _snap("r3", 1)]
    b2 = [_snap("r1", 2, "COMPLETED"), _snap("r4", 2)]
    upsert_serving_stores(_batch(spark, b1), d)
    upsert_serving_stores(_batch(spark, b1), d)      # immediate redelivery
    upsert_serving_stores(_batch(spark, b2), d)
    upsert_serving_stores(_batch(spark, b1), d)      # late redelivery of b1
    upsert_serving_stores(_batch(spark, b2), d)      # and of b2
    got = {r["wf_run_id"]: (json.loads(r["state_json"])["seq"], r["status"])
           for r in read_all_snapshots(spark, d).collect()}
    assert got == {"r1": (2, "COMPLETED"), "r2": (1, "RUNNING"),
                   "r3": (1, "RUNNING"), "r4": (2, "RUNNING")}
