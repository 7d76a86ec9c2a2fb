#!/usr/bin/env python
"""Full-registry parity sweep at an arbitrary scale factor.

The driver's per-round gate hash-checks ~50 queries at sf0.01; this
is the reproducible version of the COVERAGE.md scale-independence
claim: every registered query with an oracle, Spark vs DuckDB, at
sf0.1 (10× the gate) or any other SF dir.

    python tools/parity_sweep.py                 # sf0.1, all queries
    python tools/parity_sweep.py --sf /root/testdata/sf0.01
    python tools/parity_sweep.py --only d_ --only sim_   # name prefixes

Exit code 0 iff every checked query matches rows+schema+values.
~8 min at sf0.1 on local[32].
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--only", action="append", default=[],
                    help="check only queries whose name starts with this "
                         "(repeatable)")
    ap.add_argument("--json", action="store_true",
                    help="emit one JSON object per query")
    args = ap.parse_args()

    from old_original_java_little_horse_spark.registry import all_queries
    from old_original_java_little_horse_spark.session import get_spark
    from tests.oracle_compare import compare

    spark = get_spark()
    specs = all_queries()
    if args.only:
        specs = {n: s for n, s in specs.items()
                 if any(n.startswith(p) for p in args.only)}

    failed, skipped = [], []
    t_all = time.time()
    for name, spec in specs.items():
        if spec.oracle is None:
            skipped.append(name)
            continue
        t0 = time.time()
        try:
            r = compare(spark, args.sf, name, spec)
        except Exception as e:  # noqa: BLE001 — a crash IS a failure
            r = {"name": name, "ok": False, "error": str(e)[:500]}
        ok = r.get("ok", False)
        if not ok:
            failed.append(name)
        if args.json:
            print(json.dumps({**r, "sec": round(time.time() - t0, 2)}))
        else:
            print(f"{'OK  ' if ok else 'FAIL'} {name} "
                  f"[{time.time() - t0:.1f}s]"
                  + ("" if ok else f"  {r}"), flush=True)

    print(f"\n{len(specs) - len(skipped) - len(failed)}/"
          f"{len(specs) - len(skipped)} matched at {args.sf} "
          f"({len(skipped)} rows-only queries skipped) "
          f"in {time.time() - t_all:.0f}s")
    if failed:
        print("FAILED: " + ", ".join(failed))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
