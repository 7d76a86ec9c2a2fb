"""Streaming twins under a STRADDLED edge corpus (VERDICT r12 item 5).

The batch families carry adversarial corpora; the streaming twins were
only hash-checked against their batch oracles on clean, well-spread
replays.  This corpus is built so the twins' OWN slicing puts the
hostile rows across micro-batch boundaries that straddle the
watermark:

- a dense cluster inside `stream_dedup_watermark`'s redelivery window
  (the 24 h before the midpoint cut), so real duplicates cross the
  checkpoint boundary, plus rows exactly AT the cut and at cut−24 h;
- exact timestamp TIES at several instants — `ntile(3)` slicing cuts
  by row order, so tie groups can split across consecutive
  availableNow runs (the second arrival lands at, not behind, the
  watermark);
- tumbling/sliding window-boundary instants (xx:59:59.999999 /
  xx:00:00.000000) scattered through the range so some sit at slice
  cuts and close only when a LATER slice advances the watermark;
- error/click pairs hugging the interval join's ±2 h bound (exactly
  at it, 1 µs past it, click-before-error) clustered around the
  median so pairs straddle its two-slice cut and must match out of
  cross-batch join state;
- NULL timestamps on every twin-relevant event type (ledger #6: the
  contract filters them BEFORE watermarking on both engines — r12
  measured that Spark does NOT structurally drop them: a NULL-window
  group is simply never closed, and dropDuplicatesWithinWatermark
  passes NULL-ts rows through to the sink, so the dedup twin is the
  one that turns a filter moved after the watermark into a hash
  mismatch);
- NULL user ids with real timestamps (join/session keys — engines
  must agree NULL never matches);
- an exact-session-gap pair (session_window's >= break rule vs the
  batch twin's documented >).

Each twin must still hash-match its DuckDB oracle — the batch
counterpart — on this corpus, exactly as on the generated testdata.
"""
from __future__ import annotations

import shutil
import tempfile
from datetime import datetime, timedelta
from pathlib import Path

import pytest

from old_original_java_little_horse_spark.registry import all_queries
from old_original_java_little_horse_spark.sources.parquet import TABLES

from .conftest import SF_SMOKE
from .oracle_compare import compare

BASE = datetime(2024, 1, 1, 0, 0, 0)
US = timedelta(microseconds=1)
H = timedelta(hours=1)
D = timedelta(days=1)

# The dedup cut is the midpoint of [min ts, max ts]; pin the range to
# exactly 30 days so the cut lands at day 15 and the redelivery window
# is [day 14, day 15).
T0 = BASE
T_END = BASE + 30 * D
CUT = BASE + 15 * D


def _rows():
    rows = []
    eid = iter(range(1, 10_000))

    def add(ts, user, etype, value=1.0):
        rows.append((next(eid), ts, user, etype, value,
                     '{"k": 1}'))

    # Range pins (give min/max deterministic endpoints).
    add(T0, 1, "click")
    add(T_END, 1, "view")

    # Spread background traffic: every ~36 h, alternating types/users,
    # so ntile cuts always land inside populated regions and plenty of
    # 1 h windows close mid-replay.
    for i in range(20):
        t = T0 + i * timedelta(hours=36)
        add(t + timedelta(minutes=7), 2 + (i % 4), ("click", "view")[i % 2],
            value=0.125 * i)
    # Exact-tie clusters (4+ rows per instant, mixed users/types) at
    # three points: mid first half, INSIDE the redelivery window, and
    # mid second half.
    for tie_at in (BASE + 7 * D + timedelta(hours=12),
                   CUT - timedelta(hours=1),
                   BASE + 22 * D + timedelta(hours=6)):
        for u, etype in ((1, "click"), (2, "click"), (2, "error"),
                         (3, "purchase"), (None, "view")):
            add(tie_at, u, etype, value=2.5)

    # Hour-window boundary fenceposts, one pair per half.
    add(BASE + 8 * D + timedelta(hours=10) - US, 4, "click")
    add(BASE + 8 * D + timedelta(hours=10), 4, "click")
    add(BASE + 20 * D + timedelta(hours=10) - US, 4, "view")
    add(BASE + 20 * D + timedelta(hours=10), 4, "view")

    # Redelivery-window cluster: [CUT-24h, CUT) re-ships in slice 2 of
    # the dedup twin.  Fenceposts at exactly CUT-24h (redelivered),
    # CUT-1us (redelivered) and CUT itself (slice 2 only).
    add(CUT - 24 * H, 5, "error")
    add(CUT - 23 * H, 5, "click")
    add(CUT - 2 * H, 6, "error")
    add(CUT - US, 6, "click")
    add(CUT, 6, "purchase")

    # Interval-join pairs around the median cut (±2 h bound):
    # exactly at +2h (inclusive both engines), 1us past (excluded),
    # click BEFORE error within bound, and a straddling pair (error
    # before the median region, click after).
    t = CUT - 6 * H
    add(t, 7, "error")
    add(t + 2 * H, 7, "click")            # exactly at bound: match
    t = CUT - 5 * H
    add(t, 8, "error")
    add(t + 2 * H + US, 8, "click")       # 1 µs past: no match
    t = CUT + 3 * H
    add(t, 9, "click")                    # click precedes error
    add(t + H, 9, "error")                # within -2h side: match
    add(CUT - H + timedelta(minutes=30), 10, "error")
    add(CUT + timedelta(minutes=45), 10, "click")  # straddles the cut

    # NULL user with real ts: a would-be join pair and session that
    # must not correlate on either engine.
    add(CUT + 2 * D, None, "error")
    add(CUT + 2 * D + timedelta(minutes=30), None, "click")

    # Exact session-gap pair (30 min): session_window breaks at >=gap.
    add(BASE + 25 * D, 11, "click")
    add(BASE + 25 * D + timedelta(minutes=30), 11, "click")

    # NULL timestamps — every twin-relevant type, one on a user with
    # real events and one on a user with ONLY a NULL-ts event.
    for u, etype in ((1, "click"), (6, "error"), (9, "purchase"),
                     (12, "view"), (None, "click")):
        rows.append((next(eid), None, u, etype, 9.0, '{"k": 2}'))
    return rows


QUERIES = [
    "stream_dedup_watermark",
    "stream_event_rates",
    "stream_sliding_rates",
    "stream_interval_join",
    "stream_sessionize",
]


@pytest.fixture(scope="module")
def straddle_sf_dir(spark):
    """sf0.001 with events.parquet replaced by the straddling corpus."""
    import pandas as pd

    workdir = Path(tempfile.mkdtemp(prefix="stream-straddle-"))
    try:
        for t in TABLES:
            src = Path(SF_SMOKE) / f"{t}.parquet"
            if t != "events" and src.exists():
                shutil.copy(src, workdir / f"{t}.parquet")
        df = pd.DataFrame(
            _rows(),
            columns=["event_id", "ts", "user_id", "event_type", "value",
                     "props"],
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
def test_watermark_twin_matches_batch_oracle_on_straddled_corpus(
        spark, straddle_sf_dir, name):
    specs = all_queries()
    res = compare(spark, straddle_sf_dir, name, specs[name])
    assert res["ok"], res


def test_corpus_straddles_what_it_claims(spark, straddle_sf_dir):
    """Sanity: the dedup twin's redelivery window really contains
    corpus rows, and the tie instants really tie."""
    import pyspark.sql.functions as F

    from old_original_java_little_horse_spark.sources.parquet import (
        load_table)

    ev = load_table(spark, straddle_sf_dir, "events")
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    cut = lo + (hi - lo) / 2
    assert cut == CUT
    in_window = ev.where(
        (F.col("ts") >= F.lit(CUT - 24 * H)) & (F.col("ts") < F.lit(CUT))
    ).count()
    assert in_window >= 5  # real redelivery traffic, fenceposts included
    ties = (ev.where(F.col("ts").isNotNull()).groupBy("ts").count()
            .where(F.col("count") >= 5).count())
    assert ties == 3
    assert ev.where(F.col("ts").isNull()).count() == 5
