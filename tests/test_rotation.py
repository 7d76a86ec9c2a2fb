"""Mechanical driver-rotation ordering (VERDICT r10 Next-round #1).

The registry orders queries least-driver-proven first, derived from the
committed CORRECTNESS_r*.json artifacts rather than a hand list — a new
query has no artifact row and therefore automatically leads the next
driver window.
"""
from __future__ import annotations

import json

from old_original_java_little_horse_spark import registry
from old_original_java_little_horse_spark.registry import (
    _driver_evidence_rounds,
    all_queries,
)


def test_evidence_parser_reads_committed_artifacts():
    ev = _driver_evidence_rounds()
    # Artifacts are committed at the repo root; rounds 1-10 exist.
    assert ev, "no CORRECTNESS artifacts found at repo root"
    assert all(isinstance(r, int) and r >= 1 for r in ev.values())
    # A green r10 row parsed as at-least round 10 (later rounds may
    # legitimately refresh it).
    assert ev.get("d_edit_shift_pairs", 0) >= 10


def test_evidence_parser_rejects_non_green_rows(tmp_path, monkeypatch):
    art = {
        "good": {"rows_match": True, "schema_match": True, "hash_match": True, "err": None},
        "rows_only": {"rows_match": True, "err": None},  # no hash oracle: counts
        "hash_fail": {"rows_match": True, "schema_match": True, "hash_match": False, "err": None},
        "errored": {"rows_match": True, "schema_match": True, "hash_match": True, "err": "boom"},
        "garbage": "not-a-dict",
    }
    (tmp_path / "CORRECTNESS_r03.json").write_text(json.dumps(art))
    pkg_dir = tmp_path / "pkg"
    pkg_dir.mkdir()
    monkeypatch.setattr(registry, "__file__", str(pkg_dir / "registry.py"))
    ev = _driver_evidence_rounds()
    assert ev == {"good": 3, "rows_only": 3}


def test_ordering_puts_thin_evidence_first():
    specs = all_queries()
    names = list(specs)
    ev = _driver_evidence_rounds()
    ranks = [ev.get(n, 0) for n in names]
    # Never-checked (rank 0) and oldest evidence lead; ranks ascend.
    assert ranks == sorted(ranks)
    # Every registered query appears exactly once.
    assert len(names) == len(set(names))
    assert set(names) == set(registry._REGISTRY)


def test_new_query_would_lead_window(monkeypatch):
    # Simulate: every existing query has fresh evidence except one new
    # registration — the new one must surface to position 0.
    real = dict(registry._REGISTRY)
    names = list(real)
    fake_evidence = {n: 9 for n in names[:-1]}  # last name: never checked
    monkeypatch.setattr(registry, "_driver_evidence_rounds", lambda: fake_evidence)
    ordered = list(all_queries())
    assert ordered[0] == names[-1]


def test_new_artifact_invalidates_evidence_cache(tmp_path, monkeypatch):
    """ADVICE r11: a long-lived process that writes a new
    CORRECTNESS_r*.json and asks for the ordering again must see the
    new artifact — the memo is keyed on the artifact set's
    (path, mtime) fingerprint, not the process lifetime."""
    pkg_dir = tmp_path / "pkg"
    pkg_dir.mkdir()
    monkeypatch.setattr(registry, "__file__", str(pkg_dir / "registry.py"))
    row = {"rows_match": True, "schema_match": True,
           "hash_match": True, "err": None}
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({"a": row}))
    assert _driver_evidence_rounds() == {"a": 1}
    # same process, new artifact: the stale memo must not be served
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps({"b": row}))
    assert _driver_evidence_rounds() == {"a": 1, "b": 2}
    # rewriting an existing artifact in place also invalidates (mtime)
    import os
    path = tmp_path / "CORRECTNESS_r02.json"
    path.write_text(json.dumps({"b": row, "c": row}))
    os.utime(path, ns=(1, 2))  # force a distinct mtime fingerprint
    assert _driver_evidence_rounds() == {"a": 1, "b": 2, "c": 2}
    # unchanged artifact set: served from the memo (same object back)
    assert _driver_evidence_rounds() is _driver_evidence_rounds()


def test_missing_artifacts_fall_back_to_insertion_order(tmp_path, monkeypatch):
    pkg_dir = tmp_path / "pkg"
    pkg_dir.mkdir()
    monkeypatch.setattr(registry, "__file__", str(pkg_dir / "registry.py"))
    assert _driver_evidence_rounds() == {}
    ordered = list(all_queries())
    assert ordered == list(registry._REGISTRY)


def test_ghost_evidence_names_are_inert(monkeypatch):
    """VERDICT r12 item 6: retired names live on in old artifacts
    (`s2_changelog_upsert` r6 -> superseded by `s4_scd2_dimension`;
    `d_edit_distance_pairs` r8 -> `d_edit_segment_pairs`).  The
    ranking keys evidence lookups on LIVE registry names only, so a
    ghost row can never shift the rotation — pinned by injecting a
    ghost with the freshest evidence of all and observing an
    unchanged order."""
    real = dict(registry._REGISTRY)
    names = list(real)
    base = {n: 5 for n in names}
    monkeypatch.setattr(registry, "_driver_evidence_rounds", lambda: base)
    without_ghost = list(all_queries())
    with_ghost = dict(base, s2_changelog_upsert=99, d_edit_distance_pairs=1)
    monkeypatch.setattr(registry, "_driver_evidence_rounds",
                        lambda: with_ghost)
    assert list(all_queries()) == without_ghost
