"""Mechanical enumeration of the timed-events contract (VERDICT r12
item 4 — complete ledger #6 by partitioning EVERY ts-reading query
into "contract" or "semantics-safe", and pin it so a future query
can't half-adopt the contract).

The contract (`sources/parquet.py:timed_events`, COVERAGE ledger #6):
operators whose semantics ride on `ts` order/placement consume the
`ts IS NOT NULL` loader and state the identical predicate in their
DuckDB oracle, because the engines' default NULL sort placements are
opposite (Spark NULLS FIRST, DuckDB NULLS LAST) and a session/as-of/
rank match at a NULL instant is meaningless.  Queries that read `ts`
only through NULL-identical expression semantics need no contract:

- predicate-safe: a comparison against a literal/columns drops NULLs
  on both engines (`w3_timer_scan`'s `ts <= lit`).
- aggregate-safe: MIN/MAX/COUNT skip NULLs identically on both
  engines (`_wf_events_from_users`'s `min(ts)` — and its oracle
  never reads ts at all).

Both pins below are structural (AST / SQL text), so they fail the
moment a new query reads the raw events table and touches `ts`, or
ships an events oracle that sorts on ts without the predicate —
found `j4_fifo_correlation` doing exactly that when first written
(r13): its FIFO ranks rode `ORDER BY ts` on the raw table, so the
NULL-ts corpus rows took rank 1 on Spark and rank last on DuckDB.
"""
from __future__ import annotations

import ast
import pathlib
import re

import pytest

import old_original_java_little_horse_spark as pkg

PKG_DIR = pathlib.Path(pkg.__file__).resolve().parent

# Functions allowed to read the RAW events table.  Everyone else in
# the package must go through timed_events().
RAW_READERS_TS_FREE = {
    # never touch ts — an untimestamped event still counts here
    "x_jsonpath", "sk_hll_registers", "sk_kmv_distinct",
    "sk_cms_registers", "sk_cms_point_queries", "sk_bottomk_quantiles",
    "sk_kmv_set_ops", "p1_fanout_filter", "p2_nonnull_projection",
    "j2_broadcast_enrich", "j3_lookup_join", "a5_all_ids",
    "s_alias_diff_except", "j9_salted_skew_join", "stream_hll_registers",
    # the loaders themselves
    "timed_events", "load_tables", "register_temp_views",
}
RAW_READERS_SEMANTICS_SAFE = {
    # predicate-safe: ts <= lit rejects NULLs by comparison semantics
    "w3_timer_scan",
    # aggregate-safe: min(ts) skips NULLs identically on both engines
    "_wf_events_from_users",
}
RAW_ALLOWED = RAW_READERS_TS_FREE | RAW_READERS_SEMANTICS_SAFE


def _raw_event_call_sites():
    """(file, lineno, enclosing-function) for every
    `load_table(..., "events")` in the package."""
    sites = []
    for py in sorted(PKG_DIR.rglob("*.py")):
        text = py.read_text()
        if '"events"' not in text:
            continue
        tree = ast.parse(text)
        spans = [(n.lineno, n.end_lineno, n.name)
                 for n in ast.walk(tree)
                 if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))]
        for i, line in enumerate(text.splitlines(), 1):
            if "load_table" in line and '"events"' in line:
                enc = [name for (a, b, name) in spans if a <= i <= b]
                sites.append((py.relative_to(PKG_DIR), i,
                              enc[-1] if enc else "<module>"))
    return sites


def test_every_raw_events_reader_is_enumerated():
    offenders = [s for s in _raw_event_call_sites()
                 if s[2] not in RAW_ALLOWED]
    assert not offenders, (
        "load_table(..., 'events') outside the ledger's enumerated "
        f"classes — adopt timed_events() or extend the ledger: {offenders}")


def test_ts_free_readers_really_are_ts_free():
    """The ts-free class must stay ts-free: if one of these starts
    reading ts it needs the contract (or a semantics-safe argument),
    not silence."""
    import inspect

    from old_original_java_little_horse_spark.registry import all_queries

    specs = all_queries()
    ts_pat = re.compile(r'''["']ts["']''')
    for name in sorted(RAW_READERS_TS_FREE & set(specs)):
        src = inspect.getsource(specs[name].fn)
        assert not ts_pat.search(src), (
            f"{name} is in the ts-free ledger class but its source "
            "references the ts column")


def test_events_oracles_partition_cleanly():
    """Every DuckDB oracle selecting FROM/JOIN events either states
    the contract predicate, never mentions ts, or is one of the two
    enumerated semantics-safe queries."""
    from old_original_java_little_horse_spark.registry import all_queries

    reads_events = re.compile(r"\b(?:FROM|JOIN)\s+events\b", re.I)
    mentions_ts = re.compile(r"\bts\b")
    bad = []
    for name, spec in sorted(all_queries().items()):
        sql = spec.oracle or ""
        if not reads_events.search(sql):
            continue
        if "ts IS NOT NULL" in sql:
            continue  # contract
        if not mentions_ts.search(sql):
            continue  # ts-free
        if name in RAW_READERS_SEMANTICS_SAFE:
            continue
        bad.append(name)
    assert not bad, (
        "events-reading oracles touch ts without the contract "
        f"predicate and without a semantics-safe enumeration: {bad}")


@pytest.mark.parametrize("name", ["j4_fifo_correlation"])
def test_j4_contract_adoption_is_wired(name):
    """The r13 conversion itself: Spark side consumes timed_events,
    oracle states the predicate on both CTEs."""
    import inspect

    from old_original_java_little_horse_spark.registry import all_queries

    spec = all_queries()[name]
    assert "timed_events" in inspect.getsource(spec.fn)
    assert spec.oracle.count("ts IS NOT NULL") == 2
