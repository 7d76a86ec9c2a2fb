"""Unit tests for `pin_engine` — the checkpoint/engine compatibility
pin shared by the manager's deploy paths and `cli.py cmd_process`
(ADVICE r10: the process verb used to resume pre-flip pandas-state
checkpoints with the tws default, which Spark rejects)."""
from __future__ import annotations

import json
from pathlib import Path

import pytest

from old_original_java_little_horse_spark.api.engines import pin_engine


def _mk_offsets(ckpt: Path):
    (ckpt / "offsets").mkdir(parents=True)
    (ckpt / "offsets" / "0").write_text("{}")


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


def test_custom_marker_location(tmp_path):
    root = tmp_path / "root"
    ckpt = root / "ckpt"
    assert pin_engine(ckpt, default_tws=True, marker=root / "engine.json") is True
    assert json.loads((root / "engine.json").read_text())["engine"] == "tws"
    assert not (ckpt / "engine.json").exists()


def test_unwritable_marker_fails_fresh_tws_deploy(tmp_path, monkeypatch):
    ckpt = tmp_path / "ckpt"

    def boom(self, *a, **k):
        raise OSError("read-only fs")

    monkeypatch.setattr(Path, "write_text", boom)
    # tws MUST be durably pinned: the marker-less fallback reads
    # offsets-without-marker as pandas-state, so a lost marker would
    # resume this checkpoint with the wrong engine next boot.
    with pytest.raises(RuntimeError, match="engine marker"):
        pin_engine(ckpt, default_tws=True)
    # pandas-state is what the fallback detects anyway: benign.
    assert pin_engine(ckpt, default_tws=False) is False


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
