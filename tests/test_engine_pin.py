"""Unit tests for `pin_engine` — the checkpoint/engine compatibility
pin shared by the manager's deploy paths and `cli.py cmd_process`
(ADVICE r10: the process verb used to resume pre-flip pandas-state
checkpoints with the tws default, which Spark rejects)."""
from __future__ import annotations

import json
from pathlib import Path

from old_original_java_little_horse_spark.api.engines import (
    detect_checkpoint_engine,
    pin_engine,
)

_HDFS_OFFSETS = (
    'v1\n{"batchWatermarkMs":0,"conf":{'
    '"spark.sql.streaming.stateStore.providerClass":'
    '"org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"}}'
    "\n{}\n")
_ROCKSDB_OFFSETS = _HDFS_OFFSETS.replace("HDFSBacked", "RocksDB")


def _mk_offsets(ckpt: Path, txt: str = _HDFS_OFFSETS):
    (ckpt / "offsets").mkdir(parents=True)
    (ckpt / "offsets" / "0").write_text(txt)


def test_fresh_checkpoint_takes_default_and_stamps_marker(tmp_path):
    ckpt = tmp_path / "ckpt"
    assert pin_engine(ckpt, default_tws=True) is True
    assert json.loads((ckpt / "engine.json").read_text())["engine"] == "tws"
    # The marker now outranks any different default.
    assert pin_engine(ckpt, default_tws=False) is True


def test_markerless_committed_checkpoint_pins_pandas_state(tmp_path):
    ckpt = tmp_path / "ckpt"
    _mk_offsets(ckpt)
    assert pin_engine(ckpt, default_tws=True) is False
    assert json.loads((ckpt / "engine.json").read_text())["engine"] == "pandas-state"


def test_markerless_tws_checkpoint_detected_from_offsets(tmp_path):
    """An r10-era `cli process` tws checkpoint has committed offsets
    and NO marker — the providerClass Spark recorded in them must pin
    it back to tws even when the caller asks for pandas-state."""
    ckpt = tmp_path / "ckpt"
    _mk_offsets(ckpt, _ROCKSDB_OFFSETS)
    assert detect_checkpoint_engine(ckpt) is True
    assert pin_engine(ckpt, default_tws=False) is True
    assert json.loads((ckpt / "engine.json").read_text())["engine"] == "tws"


def test_detection_tristate(tmp_path):
    assert detect_checkpoint_engine(tmp_path / "none") is None  # fresh
    hdfs = tmp_path / "hdfs"
    _mk_offsets(hdfs)
    assert detect_checkpoint_engine(hdfs) is False
    legacy = tmp_path / "legacy"
    _mk_offsets(legacy, "{}")  # offsets without a provider record
    assert detect_checkpoint_engine(legacy) is False


def test_detection_reads_newest_offsets_numerically(tmp_path):
    """ADVICE r11: offsets filenames are batch ids; lexicographic
    order scans '9' before '10'.  Detection must read the genuinely
    newest committed batch first — pinned here by making only batch 12
    carry a provider record and planting a conflicting record in an
    older batch."""
    ckpt = tmp_path / "ckpt"
    (ckpt / "offsets").mkdir(parents=True)
    # batches 2 and 9 say HDFS; only the newest (12) says RocksDB — a
    # provider flip can't happen in real life, which is exactly why
    # the newest-first read order is the observable contract here.
    (ckpt / "offsets" / "2").write_text(_HDFS_OFFSETS)
    (ckpt / "offsets" / "9").write_text(_HDFS_OFFSETS)
    (ckpt / "offsets" / "12").write_text(_ROCKSDB_OFFSETS)
    assert detect_checkpoint_engine(ckpt) is True
    # provider-less newest batch falls through to the next-newest
    (ckpt / "offsets" / "13").write_text("v1\n{}\n{}\n")
    assert detect_checkpoint_engine(ckpt) is True
    # non-numeric names don't crash detection
    (ckpt / "offsets" / "metadata-ish").write_text("v1\n{}\n{}\n")
    assert detect_checkpoint_engine(ckpt) is True
    # ADVICE r12: a stray non-numeric file CARRYING a provider record
    # must not shadow the newest numeric batch — non-numeric names
    # sort before every batch id, so batch 12's RocksDB record wins.
    (ckpt / "offsets" / "zz-stray").write_text(_HDFS_OFFSETS)
    assert detect_checkpoint_engine(ckpt) is True


def test_custom_marker_location(tmp_path):
    root = tmp_path / "root"
    ckpt = root / "ckpt"
    assert pin_engine(ckpt, default_tws=True, marker=root / "engine.json") is True
    assert json.loads((root / "engine.json").read_text())["engine"] == "tws"
    assert not (ckpt / "engine.json").exists()


def test_unwritable_marker_is_benign_and_self_heals(tmp_path, monkeypatch):
    """A lost marker is recoverable: the offsets record re-derives the
    engine next boot, so a failed marker write must not fail the
    deploy — and the later detection must return the TRUE engine."""
    ckpt = tmp_path / "ckpt"
    _mk_offsets(ckpt, _ROCKSDB_OFFSETS)

    def boom(self, *a, **k):
        raise OSError("read-only fs")

    monkeypatch.setattr(Path, "write_text", boom)
    assert pin_engine(ckpt, default_tws=False) is True  # detected tws
    monkeypatch.undo()
    assert not (ckpt / "engine.json").exists()
    # next boot: no marker, offsets present -> detection heals the pin
    assert pin_engine(ckpt, default_tws=False) is True
    assert json.loads((ckpt / "engine.json").read_text())["engine"] == "tws"


def test_marker_write_is_atomic(tmp_path):
    ckpt = tmp_path / "ckpt"
    pin_engine(ckpt, default_tws=True)
    # no orphan temp file left beside the marker
    assert [p.name for p in ckpt.iterdir() if "tmp" in p.name] == []


def test_corrupt_marker_falls_back_to_detection(tmp_path):
    ckpt = tmp_path / "ckpt"
    _mk_offsets(ckpt)
    (ckpt / "engine.json").write_text("{not json")
    assert pin_engine(ckpt, default_tws=True) is False


def test_cmd_process_resumes_checkpoints_on_their_engine(spark, tmp_path, monkeypatch):
    """The process verb must pass the PINNED engine, not its default."""
    from old_original_java_little_horse_spark import cli

    ckpt = tmp_path / "ckpt"
    _mk_offsets(ckpt)  # pre-flip pandas-state checkpoint, no marker
    events = tmp_path / "events"
    events.mkdir()
    spec_file = tmp_path / "spec.json"
    spec_file.write_text(json.dumps({"name": "s", "thread_specs": {}}))

    seen = {}

    def fake_run(spark, events_glob, spec, **kw):
        seen.update(kw)

        class _DF:
            def where(self, *_a):
                return self

            def count(self):
                return 0

        return _DF()

    monkeypatch.setattr(cli, "_spark", lambda: None)
    monkeypatch.setattr(
        "old_original_java_little_horse_spark.streaming.engine.run_streaming_availablenow",
        fake_run)
    import pyspark.sql.functions  # noqa: F401  (imported inside cmd_process)

    args = type("A", (), {
        "spec": str(spec_file), "events_dir": str(events),
        "snapshots_dir": str(tmp_path / "snaps"),
        "checkpoint_dir": str(ckpt), "executor": None,
        "engine": "tws", "tws": False,
    })()
    assert cli.cmd_process(args) == 0
    assert seen["use_tws"] is False  # pinned, despite the tws default
