#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Timing counts full execution (collect) but not session startup.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from old_original_java_little_horse_spark.registry import all_queries
from old_original_java_little_horse_spark.session import get_spark

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "j4_fifo_correlation",
    "a1_index_posting",
    "w1_position_numbering",
    "d_exact_dedup",
    "d_minhash_lsh_pairs",
    "d_ngram_jaccard_pairs",
    "sim_topk_bruteforce",
    "sim_label_blocked_neardup",
    "t_quality_score",
    "t_token_count",
    "mm_metadata_extract",
    "engine_pipeline_fold",
    "engine_run_index",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    specs = all_queries()
    names = [n for n in HEADLINE if n in specs]

    # Warm the JVM/codegen path once on the smallest SF so per-query
    # timings measure the query, not first-run initialization.
    specs["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001").collect()

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        df = specs[name].fn(spark, sf_dir)
        n = df.count() if name not in ("q1_pricing_summary",) else len(df.collect())
        timings[name] = round(time.perf_counter() - t0, 3)
    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
