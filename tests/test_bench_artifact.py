"""The bench artifact must stay driver-consumable.

Round 7's BENCH artifact was unparseable: bench.py printed ONE giant
JSON line and the driver captures only a ~2000-char stdout tail, so
the headline `value` was sliced off the front (VERDICT r7, "What's
wrong" #1).  The fix is a compact self-contained summary as the FINAL
stdout line; these tests pin its contract without running Spark.

Round 14 (VERDICT r13 item 2): the summary line additionally carries
the per-query seconds dict at 2 decimals — the r13 compact line
dropped it and the driver's PERF artifact lost every per-query and
scaling number (`per_query: {}`, `geomean: null`).  The budget
assertion moves from <500 to <1990 (the measured worst case with all
62 headline queries is ~1.9 KB, still inside the capture tail).
"""

import json

import bench


def _base(**kw):
    out = {
        "metric": "headline_queries_total_sec",
        "value": 50.23,
        "unit": "sec",
        "sf": 0.1,
        "engine_fold_events_per_sec": 27004,
    }
    out.update(kw)
    return out


def test_summary_line_is_compact_and_self_contained():
    line = bench.summary_line(_base())
    assert len(line) < 500
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_queries_total_sec"
    assert parsed["value"] == 50.23
    assert parsed["unit"] == "sec"
    assert parsed["sf"] == 0.1
    assert parsed["engine_fold_events_per_sec"] == 27004
    assert "\n" not in line


def test_summary_line_carries_replay_value():
    out = _base(replay_prev={"commit": "abc123def", "value": 52.49,
                             "queries": {"q1": 1.0}})
    parsed = json.loads(bench.summary_line(out))
    assert parsed["replay_prev_value"] == 52.49
    # The REPLAY per-query detail must not leak into the summary (the
    # HEAD per-query dict rides in under the top-level "queries" key —
    # see test_summary_line_carries_per_query_seconds).
    assert "queries" not in parsed


def test_summary_line_carries_per_query_seconds():
    """VERDICT r13 item 2: the driver computes PERF per_query and
    scaling.per_query from the parsed final line, so the HEAD
    per-query seconds must ride in it, 2-decimal."""
    out = _base(queries={"q1": 1.2345, "q2": 0.678})
    parsed = json.loads(bench.summary_line(out))
    assert parsed["queries"] == {"q1": 1.23, "q2": 0.68}
    # The headline total stays FIRST so a front-slice cannot lose it.
    line = bench.summary_line(out)
    assert line.index('"value"') < line.index('"queries"')


def test_summary_line_with_all_headline_queries_fits_capture_window():
    names = bench.HEADLINE
    out = _base(queries={n: 12.345 for n in names},
                replay_prev={"commit": "abc123def", "value": 68.9,
                             "head_value_common": 76.5, "ratio": 1.11,
                             "n_common": len(names)},
                task_roundtrip_ms={"p50_ms": 1304.9, "p95_ms": 1543.2,
                                   "runs": 20, "trigger_ms": 200})
    line = bench.summary_line(out)
    assert len(line) < 1990
    assert json.loads(line)["queries"]["q1_pricing_summary"] == 12.35


def test_summary_line_carries_interleaved_ratio():
    # VERDICT r9 item 2: the drift-proof verdict keys must survive in
    # the compact summary — ratio over common queries plus both totals.
    out = _base(replay_prev={"commit": "abc123def", "value": 52.49,
                             "head_value_common": 45.11, "ratio": 0.859,
                             "n_common": 62, "interleaved": True,
                             "queries": {"q1": 1.0}})
    line = bench.summary_line(out)
    assert len(line) < 500
    parsed = json.loads(line)
    assert parsed["head_vs_replay_ratio"] == 0.859
    assert parsed["head_value_common"] == 45.11
    assert parsed["n_common"] == 62


def test_per_query_ratio_line_full_headline_shape():
    # Worst realistic shape: every headline query present on both
    # sides.  Since r14 the SUMMARY carries the per-query seconds and
    # owns the tail budget; the ratio line is printed unconditionally
    # (it may be sliced by the capture window — its data is exactly
    # reconstructible from the committed BENCH_LASTRUN_c{N}.json).
    names = bench.HEADLINE
    head_q = {n: 1.234 for n in names}
    replay_q = {n: 1.111 for n in names}
    out = _base(queries=head_q,
                replay_prev={"commit": "abc123def", "value": 68.9,
                             "head_value_common": 76.5, "ratio": 1.11,
                             "n_common": len(names), "queries": replay_q},
                task_roundtrip_ms={"p50_ms": 1304.9, "p95_ms": 1543.2,
                                   "runs": 20, "trigger_ms": 200})
    line = bench.per_query_ratio_line(out)
    assert line is not None
    parsed = json.loads(line)
    assert set(parsed["per_query_ratio"]) == set(names)
    assert all(v == 1.11 for v in parsed["per_query_ratio"].values())
    # The summary alone must still fit the capture tail.
    assert len(bench.summary_line(out)) < 1990


def test_per_query_ratio_line_skips_missing_and_zero_replay():
    out = _base(queries={"q1": 1.0, "q2": 2.0, "q3": 3.0},
                replay_prev={"queries": {"q1": 2.0, "q3": 0.0}})
    parsed = json.loads(bench.per_query_ratio_line(out))
    assert parsed["per_query_ratio"] == {"q1": 0.5}


def test_per_query_ratio_line_none_without_replay():
    assert bench.per_query_ratio_line(_base()) is None
    assert bench.per_query_ratio_line(
        _base(replay_prev={"error": "boom"})) is None


def test_summary_line_replay_error_is_truncated():
    out = _base(replay_prev={"error": "x" * 1000})
    line = bench.summary_line(out)
    assert len(line) < 500
    parsed = json.loads(line)
    assert parsed["replay_prev_error"] == "x" * 120
    assert "replay_prev_value" not in parsed


def test_summary_line_without_replay():
    parsed = json.loads(bench.summary_line(_base()))
    assert "replay_prev_value" not in parsed
    assert "replay_prev_error" not in parsed


def test_summary_line_carries_task_roundtrip():
    out = _base(task_roundtrip_ms={"p50_ms": 1780.3, "p95_ms": 2108.0,
                                   "runs": 15, "trigger_ms": 200})
    line = bench.summary_line(out)
    assert len(line) < 500
    parsed = json.loads(line)
    assert parsed["task_roundtrip_p50_ms"] == 1780.3
    assert parsed["task_roundtrip_p95_ms"] == 2108.0


def test_summary_line_roundtrip_error_is_truncated():
    out = _base(task_roundtrip_ms={"error": "y" * 400},
                replay_prev={"error": "x" * 1000})
    line = bench.summary_line(out)
    assert len(line) < 500
    parsed = json.loads(line)
    assert parsed["task_roundtrip_error"] == "y" * 80


def test_summary_line_all_features_stay_under_capture_window():
    out = _base(task_roundtrip_ms={"p50_ms": 99999.9, "p95_ms": 99999.9,
                                   "runs": 20, "trigger_ms": 200},
                replay_prev={"commit": "a" * 40, "value": 12345.678})
    assert len(bench.summary_line(out)) < 500
