#!/usr/bin/env python
"""Dump `.explain("formatted")` for named registry queries to files.

    python tools/capture_plans.py --out plans/r13 --suffix _after sim_pq_adc_topk ...

Used by the optimization rounds to commit the before/after physical
plans the judge checks claims against (guide §1 / §7.2).
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--out", default="plans/r13")
    ap.add_argument("--suffix", default="_after")
    ap.add_argument("--sf", default=SF)
    args = ap.parse_args()

    from old_original_java_little_horse_spark.registry import all_queries
    from old_original_java_little_horse_spark.session import get_spark

    spark = get_spark()
    specs = all_queries()
    os.makedirs(args.out, exist_ok=True)
    for name in args.names:
        df = specs[name].fn(spark, args.sf)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(args.out, f"{name}{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
