#!/usr/bin/env python
"""Drive `__spark_entry__.py` exactly the way the round driver does:
a VANILLA SparkSession (none of `session.py`'s configs — this is what
catches session-dependent bugs: nanosAsLong, Arrow settings, shipped
package files), `entry()` smoke, then every `queries()` item
hash-compared against its `oracle_sql()` on DuckDB.

    python tools/vanilla_drive.py                  # sf0.01, all queries
    python tools/vanilla_drive.py --sf /root/testdata/sf0.001

The comparison itself is `tests/oracle_compare.compare` — the ONE
normalization/diff implementation the parity sweep and the pytest
parity tests also use, so the two committed harnesses can never
disagree on what "matches" means.  This script's only delta is the
session it builds and the `__spark_entry__` surface it goes through.
Complements `tools/parity_sweep.py` (repo session, any SF): the sweep
proves scale-independence, this proves harness-independence.
Exit code 0 iff every query matches rows+schema+values.  ~2-3 min at
sf0.01 on local[8].
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from types import SimpleNamespace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", action="append", default=[],
                    help="only queries whose name starts with this")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .appName("vanilla-drive").getOrCreate())

    import __spark_entry__ as E
    from tests.oracle_compare import compare

    df = E.entry(spark)
    print(f"entry(): {df.count()} rows, "
          f"schema={[f.name for f in df.schema]}")

    qs = E.queries()
    if args.only:
        qs = {k: v for k, v in qs.items()
              if any(k.startswith(p) for p in args.only)}
    oracles = E.oracle_sql()
    fail: list[tuple[str, str]] = []
    t0 = time.time()
    for name, fn in qs.items():
        sql = oracles.get(name)
        if sql is None:
            try:
                n = fn(spark, args.sf).count()
                print(f"ok(rows-only) {name}: {n} rows")
            except Exception as e:  # noqa: BLE001 — report, keep driving
                fail.append((name, f"spark error: {e}"))
            continue
        try:
            r = compare(spark, args.sf, name,
                        SimpleNamespace(fn=fn, oracle=sql))
        except Exception as e:  # noqa: BLE001
            fail.append((name, f"error: {e}"))
            continue
        if r["ok"]:
            print(f"ok {name}: {r['spark_rows']} rows")
        else:
            fail.append((name, {k: v for k, v in r.items()
                                if k not in ("name", "spark_cols",
                                             "oracle_cols") or not r["cols_match"]}))
    print(f"\n{len(qs)} queries, fail={len(fail)} in {time.time() - t0:.0f}s")
    for name, why in fail:
        print(f"  FAIL {name}: {why}")
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main())
