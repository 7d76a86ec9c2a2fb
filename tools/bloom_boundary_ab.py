#!/usr/bin/env python
"""Measure the Bloom pre-join boundary for the TPC-H heavies
(VERDICT r13 item 6, guide §3.2).

The r13 claim was "a Bloom stage buys nothing while the selective side
still broadcasts" — true at every measured SF, but unmeasured beyond
the broadcast regime.  This A/B forces that regime locally
(`spark.sql.autoBroadcastJoinThreshold=-1`, so every dimension join
plans as a shuffle join — exactly what happens at the SF where the
filtered dimension outgrows the threshold) and measures whether
Spark's runtime Bloom-filter injection (SPARK-32268,
`spark.sql.optimizer.runtime.bloomFilter.enabled`, default ON in 4.x)
fires and pays:

  variants per query, interleaved per pass (ab_movers protocol):
    broadcast   — the production config (64m threshold), the control;
    smj_bloom   — broadcasts off, runtime bloom ON (the at-scale plan);
    smj_nobloom — broadcasts off, runtime bloom OFF.

Also records whether `might_contain` appears in each variant's
optimized plan, so "did the filter even fire" is separated from "did
it help".

    python tools/bloom_boundary_ab.py -n 7 q4_priority_semi q18_large_orders ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("-n", type=int, default=7)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from old_original_java_little_horse_spark.registry import all_queries
    from old_original_java_little_horse_spark.session import (
        get_spark, scoped_conf)

    spark = get_spark("bloom-boundary-ab")
    specs = all_queries()

    variants = {
        "broadcast": {},
        "smj_bloom": {
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
            # At defaults the filter NEVER fires here: the application
            # side's scan must exceed applicationSideScanSizeThreshold
            # (10 GB) — sf0.1 scans are ~200 MB, so the optimizer
            # itself guards the regime.  Zeroing the floor (and
            # raising the creation-side cap) forces the injection so
            # the local A/B can measure the filter's cost/benefit
            # shape; the firing condition at scale is the documented
            # boundary.
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold": "0",
            "spark.sql.optimizer.runtime.bloomFilter."
            "creationSideThreshold": "64MB",
        },
        "smj_nobloom": {
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.optimizer.runtime.bloomFilter.enabled": "false",
        },
    }

    def build(name, conf):
        with scoped_conf(spark, conf):
            return specs[name].fn(spark, args.sf)

    # Plan evidence: does the runtime bloom fire once broadcasts stop?
    fired: dict[str, dict[str, bool]] = {}
    for name in args.names:
        fired[name] = {}
        for vn, conf in variants.items():
            with scoped_conf(spark, conf):
                df = specs[name].fn(spark, args.sf)
                plan = df._jdf.queryExecution().optimizedPlan().toString()
            fired[name][vn] = "might_contain" in plan
        print(f"bloom fired {name}: {fired[name]}", file=sys.stderr)

    # Warm each (query, variant) cell once.
    for name in args.names:
        for vn, conf in variants.items():
            with scoped_conf(spark, conf):
                specs[name].fn(spark, args.sf).count()

    samples: dict[str, dict[str, list[float]]] = {
        n: {v: [] for v in variants} for n in args.names}
    for p in range(args.n):
        for name in args.names:
            order = list(variants)
            if p % 2:
                order.reverse()
            for vn in order:
                with scoped_conf(spark, variants[vn]):
                    t0 = time.perf_counter()
                    specs[name].fn(spark, args.sf).count()
                    samples[name][vn].append(
                        round(time.perf_counter() - t0, 3))

    med = {n: {v: sorted(s)[len(s) // 2] for v, s in vs.items()}
           for n, vs in samples.items()}
    out = {"sf": args.sf, "passes": args.n, "bloom_fired": fired,
           "medians": med,
           "smj_bloom_vs_nobloom": {
               n: round(m["smj_bloom"] / m["smj_nobloom"], 3)
               for n, m in med.items()},
           "samples": samples}
    print(json.dumps(out))
    if args.out:
        Path(args.out).write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
