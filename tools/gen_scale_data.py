#!/usr/bin/env python
"""Deterministic synthetic-data generator for scale probing.

The driver ships read-only fixtures at sf{0.001,0.01,0.1}
(`/root/testdata`, TESTDATA.md).  Scale-invariance of the PLANS is
gate-tested (tests/test_scale_invariance.py); what those gates cannot
show is the empirical wall-time/shuffle/spill behavior one decade up.
This tool writes an sf1.0 (or any --sf) dataset with the SAME schemas
and the same distribution family as the driver fixtures — measured
from sf0.1 (row counts scale linearly; vocab/categories/ranges match
the observed data) — so `tools/scale_probe.py` can record real
sf0.1→sf1 scaling factors per query (VERDICT r7 item 4).

    python tools/gen_scale_data.py --sf 1.0 --out .scale/sf1

Output is ~170 MB at sf1 and lives under the git-ignored `.scale/`
directory; it is NOT driver data and carries no oracle hashes — the
probe compares a query against ITSELF across scales, never against
DuckDB.  Everything is seeded (numpy PCG64, seed=42 ^ per-table tag)
so re-generation is byte-stable.

Schemas mirror /root/testdata/sf0.1/*.parquet exactly (int32/int64
widths, timestamp[us], list<float> embeddings) so `sources/parquet.py`
and every registry query read it unchanged.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# Observed at sf0.1 (see TESTDATA.md): counts are linear in sf.
ROWS_PER_SF = {
    "customer": 150_000,
    "supplier": 10_000,
    "part": 200_000,
    "orders": 1_500_000,
    "lineitem": 6_000_000,
    "events": 1_000_000,
    "documents": 50_000,
    "embeddings": 20_000,
}
USERS_PER_SF = 15_000          # events.user_id cardinality
R_NAMES = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["O", "P", "F"]
EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]
PART_ADJ = ["large", "small", "hot", "cold", "blue", "red", "old", "new"]
PART_NOUN = ["ring", "bolt", "plate", "screw", "gear", "pipe", "rod", "cap"]
PART_TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL"]
LANGS = [("en", 0.41), ("zh", 0.15), ("es", 0.15), ("fr", 0.15), ("de", 0.14)]
DOC_VOCAB = [  # the 31 observed tokens, sf0.1 documents.text
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window"]
EPOCH_1995 = np.datetime64("1995-01-01")
EPOCH_2024 = np.datetime64("2024-01-01")


def _rng(tag: str) -> np.random.Generator:
    return np.random.default_rng(42 ^ int.from_bytes(tag.encode(), "big"))


def _write(out: str, name: str, table: pa.Table) -> None:
    path = os.path.join(out, f"{name}.parquet")
    pq.write_table(table, path, row_group_size=256 * 1024)
    print(f"  {name}: {table.num_rows} rows, "
          f"{os.path.getsize(path) / 2**20:.1f} MB", flush=True)


def gen(sf: float, out: str) -> None:
    os.makedirs(out, exist_ok=True)
    n = {t: max(1, int(c * sf)) for t, c in ROWS_PER_SF.items()}
    n_users = max(10, int(USERS_PER_SF * sf))

    _write(out, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": R_NAMES}))

    rng = _rng("nation")
    _write(out, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION{i:02d}" for i in range(25)],
        "n_regionkey": pa.array(rng.integers(0, 5, 25), pa.int32())}))

    rng = _rng("customer")
    nc = n["customer"]
    _write(out, "customer", pa.table({
        "c_custkey": pa.array(np.arange(nc), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(nc)],
        "c_nationkey": pa.array(rng.integers(0, 25, nc), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-999.99, 9999.99, nc), 2),
        "c_mktsegment": pa.array(np.array(SEGMENTS)[rng.integers(0, 5, nc)]),
    }))

    rng = _rng("supplier")
    ns = n["supplier"]
    _write(out, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(ns), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(ns)],
        "s_nationkey": pa.array(rng.integers(0, 25, ns), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-999.99, 9999.99, ns), 2)}))

    rng = _rng("part")
    npart = n["part"]
    adj = np.array(PART_ADJ)[rng.integers(0, len(PART_ADJ), npart)]
    noun = np.array(PART_NOUN)[rng.integers(0, len(PART_NOUN), npart)]
    _write(out, "part", pa.table({
        "p_partkey": pa.array(np.arange(npart), pa.int64()),
        "p_name": pa.array(np.char.add(np.char.add(adj, " "), noun)),
        "p_brand": pa.array(["Brand#%d" % b
                             for b in rng.integers(1, 26, npart)]),
        "p_type": pa.array(np.array(PART_TYPES)[rng.integers(0, 5, npart)]),
        "p_size": pa.array(rng.integers(1, 51, npart), pa.int32()),
        "p_retailprice": np.round(rng.uniform(900.0, 2100.0, npart), 2)}))

    rng = _rng("orders")
    no = n["orders"]
    odate_days = rng.integers(0, 2404, no)  # 1995-01-01..2001-08-01
    _write(out, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(no), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, nc, no), pa.int64()),
        "o_orderstatus": pa.array(np.array(STATUSES)[rng.integers(0, 3, no)]),
        "o_totalprice": np.round(rng.uniform(900.0, 450000.0, no), 2),
        "o_orderdate": pa.array(
            EPOCH_1995 + odate_days.astype("timedelta64[D]"),
            pa.timestamp("us")),
        "o_orderpriority": pa.array(
            np.array(PRIORITIES)[rng.integers(0, 5, no)])}))

    rng = _rng("lineitem")
    nl = n["lineitem"]
    # ~4 lineitems per order with per-order jitter: draw each line's
    # order uniformly, then number the lines within the order.
    okey = np.sort(rng.integers(0, no, nl)).astype(np.int64)
    first = np.r_[True, okey[1:] != okey[:-1]]
    lineno = (np.arange(nl) -
              np.maximum.accumulate(np.where(first, np.arange(nl), 0)) + 1)
    ship_days = odate_days[okey] + rng.integers(1, 96, nl)
    _write(out, "lineitem", pa.table({
        "l_orderkey": pa.array(okey, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, npart, nl), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, ns, nl), pa.int64()),
        "l_linenumber": pa.array(lineno, pa.int32()),
        "l_quantity": rng.integers(1, 51, nl).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900.0, 105000.0, nl), 2),
        "l_discount": np.round(rng.integers(0, 11, nl) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, nl) / 100.0, 2),
        "l_returnflag": pa.array(
            np.array(["N", "A", "R"])[rng.integers(0, 3, nl)]),
        "l_linestatus": pa.array(np.array(["O", "F"])[rng.integers(0, 2, nl)]),
        "l_shipdate": pa.array(
            EPOCH_1995 + ship_days.astype("timedelta64[D]"),
            pa.timestamp("us"))}))

    rng = _rng("events")
    ne = n["events"]
    ts_us = np.sort(rng.integers(0, 30 * 86_400_000_000, ne))  # 30-day window
    _write(out, "events", pa.table({
        "event_id": pa.array(np.arange(ne), pa.int64()),
        "ts": pa.array(EPOCH_2024 + ts_us.astype("timedelta64[us]"),
                       pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, n_users, ne), pa.int64()),
        "event_type": pa.array(
            np.array(EVENT_TYPES)[rng.integers(0, 5, ne)]),
        "value": np.round(rng.exponential(50.0, ne), 2),
        "props": pa.array([json.dumps({"k": int(k)})
                           for k in rng.integers(0, 100, ne)])}))

    rng = _rng("documents")
    nd = n["documents"]
    vocab = np.array(DOC_VOCAB)
    lengths = rng.integers(10, 101, nd)
    probs = np.array([w for _, w in LANGS]); probs = probs / probs.sum()
    langs = np.array([c for c, _ in LANGS])[
        rng.choice(len(LANGS), nd, p=probs)]
    texts = [" ".join(vocab[rng.integers(0, len(vocab), ln)])
             for ln in lengths]
    # ~0.3% exact-duplicate pairs, mirroring the sf0.1 dup fraction
    # (8 dup pairs / 5000 docs) so dedup clusters keep their size
    # distribution instead of degenerating at scale.
    for j in rng.choice(nd, max(1, int(nd * 0.0032)) // 2 * 2,
                        replace=False).reshape(-1, 2):
        texts[j[1]] = texts[j[0]]
    _write(out, "documents", pa.table({
        "doc_id": pa.array(np.arange(nd), pa.int64()),
        "text": texts,
        "lang": pa.array(langs),
        "source": pa.array(["src%d" % s for s in rng.integers(0, 20, nd)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64())}))

    rng = _rng("embeddings")
    nv = n["embeddings"]
    centers = rng.standard_normal((10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    label = rng.integers(0, 10, nv)
    vec = 0.6 * centers[label] + rng.standard_normal((nv, 64))
    vec /= np.linalg.norm(vec, axis=1, keepdims=True)
    _write(out, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(nv), pa.int64()),
        "embedding": pa.array(list(vec.astype(np.float32)),
                              pa.list_(pa.float32())),
        "label": pa.array(label, pa.int32())}))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = args.out or os.path.join(repo, ".scale", f"sf{args.sf:g}")
    print(f"generating sf={args.sf:g} at {out}", flush=True)
    gen(args.sf, out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
