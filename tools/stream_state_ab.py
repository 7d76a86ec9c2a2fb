#!/usr/bin/env python
"""Interleaved A/B of state-store knobs on `stream_doc_dedup`
(VERDICT r13 item 4): the availableNow replay's ~1.2 s/micro-batch
fixed cost is the heaviest untouched headline item, and guide §5/§9
name three candidate knobs that do not change the query's semantics:

  - state-store provider (HDFS-backed default vs RocksDB),
  - RocksDB changelog checkpointing (commit the delta, not the full
    snapshot),
  - state-store partition count (each partition is a state load +
    commit per micro-batch; the keyspace here is a uniform md5 hash).

All variants run INTERLEAVED within each pass (the ab_movers protocol:
host stalls hit every variant alike and cancel in the medians), each
execution is the full registry query end-to-end (staging write +
3-micro-batch availableNow stream + compaction collect) on a fresh
workdir, so the measured seconds are exactly what the bench times.

    python tools/stream_state_ab.py [-n 7] [--sf DIR] [--out AB.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

ROCKSDB = ("org.apache.spark.sql.execution.streaming.state."
           "RocksDBStateStoreProvider")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=7)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from old_original_java_little_horse_spark.session import (
        get_spark, scoped_conf)
    from old_original_java_little_horse_spark.streaming import queries as SQ

    spark = get_spark("stream-state-ab")

    def run(conf: dict, parts: int | None) -> float:
        old_parts = SQ._STREAM_PARTS
        if parts is not None:
            SQ._STREAM_PARTS = parts
        try:
            with scoped_conf(spark, conf):
                t0 = time.perf_counter()
                SQ.stream_doc_dedup(spark, args.sf).count()
                return time.perf_counter() - t0
        finally:
            SQ._STREAM_PARTS = old_parts

    variants: dict[str, tuple[dict, int | None]] = {
        "baseline": ({}, None),
        "rocksdb": (
            {"spark.sql.streaming.stateStore.providerClass": ROCKSDB}, None),
        "rocksdb_changelog": (
            {"spark.sql.streaming.stateStore.providerClass": ROCKSDB,
             "spark.sql.streaming.stateStore.rocksdb."
             "changelogCheckpointing.enabled": "true"}, None),
        "parts1": ({}, 1),
        "parts2": ({}, 2),
    }

    # Warm every variant once (codegen + provider class load).
    for name, (conf, parts) in variants.items():
        run(conf, parts)

    samples: dict[str, list[float]] = {n: [] for n in variants}
    for p in range(args.n):
        order = list(variants)
        if p % 2:
            order.reverse()  # alternate order: no variant always runs hot
        for name in order:
            conf, parts = variants[name]
            samples[name].append(round(run(conf, parts), 3))
            print(f"pass {p} {name}: {samples[name][-1]}", file=sys.stderr)

    med = {n: sorted(s)[len(s) // 2] for n, s in samples.items()}
    out = {"query": "stream_doc_dedup", "sf": args.sf, "passes": args.n,
           "medians": med,
           "ratio_vs_baseline": {
               n: round(m / med["baseline"], 3) for n, m in med.items()},
           "samples": samples}
    line = json.dumps(out)
    print(line)
    if args.out:
        Path(args.out).write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
