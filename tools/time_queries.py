#!/usr/bin/env python
"""Time named registry queries standalone: build fn(), execute to the
noop sink (guide §1.4), report per-query median of N interleaved
passes.  Methodology matches bench.py (same session config, same
timed action) without the 62-query sweep.

    python tools/time_queries.py [-n 3] [--sf DIR] name [name ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("-n", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from old_original_java_little_horse_spark.registry import all_queries
    from old_original_java_little_horse_spark.session import get_spark

    spark = get_spark()
    specs = all_queries()
    samples: dict[str, list[float]] = {n: [] for n in args.names}
    for _ in range(args.n):
        for name in args.names:
            spark.sparkContext.setJobDescription(f"time: {name}")
            t0 = time.monotonic()
            df = specs[name].fn(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            samples[name].append(round(time.monotonic() - t0, 3))
            spark.sparkContext.setJobDescription(None)
    med = {n: sorted(s)[len(s) // 2] for n, s in samples.items()}
    print(json.dumps({"median": med, "samples": samples}))


if __name__ == "__main__":
    main()
