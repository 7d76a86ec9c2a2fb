"""Adversarial-corpus parity for the events-table analytics family —
the timestamp/ordering twin of `test_dedup_edge_corpora`.

The generated testdata has well-spread timestamps; the cross-engine
divergence risks for the analytics operators live in exactly the rows
it never contains: EXACT timestamp ties (within and across users),
session-gap fenceposts (diff == gap vs gap+1 µs), window-boundary
instants (xx:00:00.000000 vs xx:59:59.999999), NULL user/type/value,
single-event users, and half-way rounding cents.  Every query below
must still hash-match its DuckDB oracle on this corpus.
"""
from __future__ import annotations

import shutil
import tempfile
from datetime import datetime, timedelta
from pathlib import Path

import pytest

from old_original_java_little_horse_spark.operators.analytics import SESSION_GAP_US
from old_original_java_little_horse_spark.registry import all_queries
from old_original_java_little_horse_spark.sources.parquet import TABLES

from .conftest import SF_SMOKE
from .oracle_compare import compare

BASE = datetime(2024, 1, 1, 0, 0, 0)
GAP = timedelta(microseconds=SESSION_GAP_US)
US = timedelta(microseconds=1)

EDGE_EVENTS = [
    # (event_id, ts, user_id, event_type, value, props)
    # u1 — session-gap fencepost: e1 exactly GAP after e0 (same session,
    # the gate is strictly >), e2 at GAP+1us after e1 (new session).
    (0, BASE, 1, "view", 1.0, '{"k": 0}'),
    (1, BASE + GAP, 1, "click", 2.0, '{"k": 1}'),
    (2, BASE + GAP + GAP + US, 1, "purchase", 3.0, '{"k": 2}'),
    # u2 — THREE events at the same instant (funnel stage progression
    # with ts >= at equal timestamps; lag/row_number tie-breaks).
    (3, BASE + timedelta(minutes=5), 2, "view", 0.005, '{"k": 3}'),
    (4, BASE + timedelta(minutes=5), 2, "click", -0.005, '{"k": 4}'),
    (5, BASE + timedelta(minutes=5), 2, "purchase", 10.0, '{"k": 5}'),
    # u3 — single-event user.
    (6, BASE + timedelta(minutes=7), 3, "error", 185.22, '{"k": 6}'),
    # u4 — NULL type and NULL value.
    (7, BASE + timedelta(minutes=9), 4, None, None, '{"k": 7}'),
    (8, BASE + timedelta(minutes=10), 4, "click", None, '{"k": 8}'),
    # NULL user — two events (NULL partition keys on both engines).
    (9, BASE + timedelta(minutes=11), None, "click", 5.0, '{"k": 9}'),
    (10, BASE + timedelta(minutes=12), None, "error", 6.0, '{"k": 10}'),
    # u5 — shares u2's exact instant (cross-user tie) + error-after-click
    # at the SAME microsecond (as-of boundary).
    (11, BASE + timedelta(minutes=5), 5, "click", 7.5, '{"k": 11}'),
    (12, BASE + timedelta(minutes=5), 5, "error", 8.5, '{"k": 12}'),
    # u6 — hour-window boundary: last µs of hour 0, first µs of hour 1.
    (13, BASE + timedelta(hours=1) - US, 6, "click", 1.25, '{"k": 13}'),
    (14, BASE + timedelta(hours=1), 6, "click", 2.25, '{"k": 14}'),
    # u7 — value extremes: zero, negative, huge.
    (15, BASE + timedelta(minutes=20), 7, "purchase", 0.0, '{"k": 15}'),
    (16, BASE + timedelta(minutes=21), 7, "purchase", -42.5, '{"k": 16}'),
    (17, BASE + timedelta(minutes=22), 7, "purchase", 1e9, '{"k": 17}'),
    # u8 — day-boundary pair (cohort/RFM date bucketing).
    (18, datetime(2024, 1, 1, 23, 59, 59, 999999), 8, "signup", 3.0, '{"k": 18}'),
    (19, datetime(2024, 1, 2, 0, 0, 0), 8, "purchase", 4.0, '{"k": 19}'),
    # u9 — HOSTILE props (r12): every JSONPath read must be a
    # contained NULL, never an ANSI cast error (Spark) or a JSON
    # parse error (DuckDB), and the two engines' unlike defaults
    # (DuckDB rounds '1.5' to 2 and casts true to 1) must be
    # neutralized by x_jsonpath's integral-string gate.
    (20, BASE + timedelta(minutes=30), 9, "view", 1.0, '{"k": "abc"}'),
    (21, BASE + timedelta(minutes=31), 9, "view", 1.0, "not-json"),
    (22, BASE + timedelta(minutes=32), 9, "view", 1.0, '{"k": 1.5}'),
    (23, BASE + timedelta(minutes=33), 9, "view", 1.0, '{"k": true}'),
    (24, BASE + timedelta(minutes=34), 9, "view", 1.0, '{"k": null}'),
    (25, BASE + timedelta(minutes=35), 9, "view", 1.0, None),
    (26, BASE + timedelta(minutes=36), 9, "view", 1.0, '{"k": " 7 "}'),
    (27, BASE + timedelta(minutes=37), 9, "view", 1.0,
     '{"k": 99999999999999999999}'),  # overflows BIGINT: NULL, not error
    # tab/newline/CR-padded quoted ints (ADVICE r12): Spark's try_cast
    # string→BIGINT trims all whitespace/control chars, DuckDB's bare
    # trim() strips spaces only — x_jsonpath's oracle must trim the
    # full ' \t\n\r\v\f' set or these yield 7/8 on Spark, NULL there.
    (31, BASE + timedelta(minutes=38), 9, "view", 1.0, '{"k": "7\\t"}'),
    (32, BASE + timedelta(minutes=39), 9, "view", 1.0, '{"k": "\\n 8 \\r"}'),
    # u10 — NULL TIMESTAMPS (r12 ledger #6): time-ordered operators'
    # contract is `ts IS NOT NULL` on BOTH engines (timed_events());
    # without it the engines' opposite default null placement in
    # window sorts diverges ~7 queries, and a session/as-of match at
    # a NULL instant is meaningless.  One NULL-ts event for a user
    # with real events, one for a NULL user, one whose user has ONLY
    # NULL-ts events.  Non-time queries (sketches, projections,
    # jsonpath) must still see these rows.
    (28, None, 1, "click", 3.5, '{"k": 28}'),
    (29, None, None, "view", 1.0, '{"k": 29}'),
    (30, None, 10, "purchase", 9.0, '{"k": 30}'),
]

QUERIES = [
    "w4_sessionize", "j5_asof_join", "w5_length_quantiles", "a6_funnel",
    "j4_fifo_correlation",  # r13: joined the timed-events contract —
    # the NULL-ts corpus rows (28-30, clicks/purchases among them)
    # would shift its FIFO ranks oppositely on the two engines
    "j6_range_count", "a7_event_rate_windows", "j7_interval_overlap",
    "w6_cohort_retention", "w7_rolling_revenue", "a8_anomaly_hours",
    "w8_gap_fill", "j8_temporal_join", "a9_markov_transitions",
    "w9_sliding_windows", "a10_top_paths", "a11_rfm_segments",
    "a5_all_ids",
    "sk_hll_registers", "sk_kmv_distinct", "sk_cms_registers",
    "sk_cms_point_queries", "sk_bottomk_quantiles", "sk_kmv_set_ops",
    "x_jsonpath", "p2_nonnull_projection",
    "w1_position_numbering", "w2_latest_entry", "w3_timer_scan",
    "s_alias_diff_except",
]


@pytest.fixture(scope="module")
def edge_sf_dir(spark):
    """sf0.001 with events.parquet replaced by the edge corpus."""
    import pandas as pd

    workdir = Path(tempfile.mkdtemp(prefix="edge-events-"))
    try:
        for t in TABLES:
            src = Path(SF_SMOKE) / f"{t}.parquet"
            if t != "events" and src.exists():
                shutil.copy(src, workdir / f"{t}.parquet")
        df = pd.DataFrame(
            EDGE_EVENTS,
            columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
        )
        df["event_id"] = df["event_id"].astype("int64")
        df["ts"] = df["ts"].astype("datetime64[us]")
        df["user_id"] = df["user_id"].astype("Int64")
        df["value"] = df["value"].astype("float64")
        df.to_parquet(workdir / "events.parquet")
        yield str(workdir)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


@pytest.mark.parametrize("name", QUERIES)
def test_events_edge_parity(spark, edge_sf_dir, name):
    specs = all_queries()
    res = compare(spark, edge_sf_dir, name, specs[name])
    assert res["ok"], res


def test_bottomk_on_all_null_values(spark, edge_sf_dir):
    """k=0 fencepost: with every `value` NULL the sample is empty and
    all three rank selectors evaluate to index 0 — Spark's
    try_element_at rejects 0 outright (INVALID_INDEX_OF_ZERO), so the
    selector clamps to 1 and must return the oracle's NULL quantiles,
    not raise (r11 self-review)."""
    import pandas as pd

    specs = all_queries()
    workdir = Path(tempfile.mkdtemp(prefix="edge-nullvals-"))
    try:
        for t in TABLES:
            src = Path(edge_sf_dir) / f"{t}.parquet"
            if t != "events" and src.exists():
                shutil.copy(src, workdir / f"{t}.parquet")
        ev = pd.read_parquet(Path(edge_sf_dir) / "events.parquet")
        ev["value"] = None
        ev["value"] = ev["value"].astype("float64")
        ev.to_parquet(workdir / "events.parquet")
        res = compare(spark, str(workdir), "sk_bottomk_quantiles",
                      specs["sk_bottomk_quantiles"])
        assert res["ok"], res
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def test_corpus_exercises_the_fenceposts(spark, edge_sf_dir):
    """Sanity that the corpus hits what it claims: u1's first two
    events share a session (diff == gap is NOT a break) and the third
    opens a new one; u2's three events truly tie on ts."""
    specs = all_queries()
    rows = specs["w4_sessionize"].fn(spark, edge_sf_dir).collect()
    u1 = sorted((r["session_idx"], r["n_events"]) for r in rows
                if r["user_id"] == 1)
    assert u1 == [(1, 2), (2, 1)], u1
    import pyspark.sql.functions as F

    from old_original_java_little_horse_spark.sources.parquet import load_table

    ties = (load_table(spark, edge_sf_dir, "events")
            .groupBy("ts").count().where(F.col("count") >= 4).count())
    assert ties == 1  # the minute-5 instant carries 4 events
