"""Property test: paging the snapshot store is exactly the full read.

For ANY store contents (including run ids containing the cursor's
separator characters ':' and '|') and ANY page size, walking
`read_snapshot_rows_page` to exhaustion must yield the full store —
no duplicates, no gaps, stable order — because the HTTP list route
and `lhctl list --limit` are built on it (VERDICT r8 item 3).

Stores are built through `upsert_serving_stores_arrow` (the pure
pyarrow entry), so hypothesis can afford real stores per example —
no Spark session involved.
"""

from __future__ import annotations

import json
import shutil
import tempfile

import pyarrow as pa
from hypothesis import given, settings, strategies as st

from old_original_java_little_horse_spark.sinks.serving import (
    read_snapshot_rows_page, upsert_serving_stores_arrow)

# Ids deliberately include the cursor separators and other awkward
# text; they are data, never path components (buckets are the paths).
_id = st.text(
    alphabet=st.sampled_from("ab:|\x1f-0🦄"), min_size=1, max_size=8)


def _store_with(run_ids: list[str]) -> str:
    base = tempfile.mkdtemp(prefix="page-prop-")
    store = base + "/store"
    n = len(run_ids)
    tbl = pa.table({
        "wf_run_id": pa.array(run_ids, pa.string()),
        "kind": pa.array(["snapshot"] * n, pa.string()),
        "status": pa.array(["COMPLETED"] * n, pa.string()),
        "task_def_name": pa.array([None] * n, pa.string()),
        "thread_id": pa.array([None] * n, pa.int32()),
        "task_run_position": pa.array([None] * n, pa.int32()),
        "maturation_timestamp": pa.array([None] * n, pa.int64()),
        "seq": pa.array(list(range(n)), pa.int64()),
        "payload": pa.array([json.dumps({"status": "COMPLETED"})] * n,
                            pa.string()),
    })
    upsert_serving_stores_arrow(tbl, store, n_buckets=4)
    return base


@settings(max_examples=30, deadline=None)
@given(ids=st.lists(_id, min_size=1, max_size=40, unique=True),
       page=st.integers(min_value=1, max_value=11))
def test_pagination_equals_full_read(ids, page):
    base = _store_with(ids)
    try:
        store = base + "/store"
        whole, end_cur = read_snapshot_rows_page(store, 10_000)
        assert end_cur is None
        assert sorted(r["wf_run_id"] for r in whole) == sorted(ids)

        seen, cursor, rounds = [], None, 0
        while True:
            rows, cursor = read_snapshot_rows_page(store, page, cursor)
            assert len(rows) <= page
            seen.extend(r["wf_run_id"] for r in rows)
            rounds += 1
            assert rounds <= len(ids) + 2  # terminates
            if cursor is None:
                break
        assert seen == [r["wf_run_id"] for r in whole]  # order-stable
        assert len(seen) == len(set(seen))
    finally:
        shutil.rmtree(base, ignore_errors=True)
