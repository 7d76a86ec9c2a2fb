#!/usr/bin/env python
"""Drive `__spark_entry__.py` exactly the way the round driver does:
a VANILLA SparkSession (none of `session.py`'s configs — this is what
catches session-dependent bugs: nanosAsLong, Arrow settings, shipped
package files), `entry()` smoke, then every `queries()` item
hash-compared against its `oracle_sql()` on DuckDB.

    python tools/vanilla_drive.py                  # sf0.01, all queries
    python tools/vanilla_drive.py --sf /root/testdata/sf0.001

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
from decimal import Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def norm(v):
    """The driver's value normalization: numerics through float repr
    (ints as N.0) so cross-engine int/float/Decimal typing cannot flip
    a compare; huge ints (> 2^53, e.g. 56-bit hash keys) stay exact."""
    if isinstance(v, bool):
        return repr(int(v))
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, int):
        return repr(float(v)) if abs(v) <= 2**53 else repr(v)
    if v is None:
        return "\x00NULL"
    return v if isinstance(v, str) else repr(v)


def rows_key(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm(r[i]) for i in order) for r in rows)


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
    import duckdb

    import __spark_entry__ as E

    df = E.entry(spark)
    n = df.count()
    print(f"entry(): {n} rows, schema={[f.name for f in df.schema]}")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")

    qs = E.queries()
    if args.only:
        qs = {k: v for k, v in qs.items()
              if any(k.startswith(p) for p in args.only)}
    oracles = E.oracle_sql()
    fail: list[tuple[str, str]] = []
    t0 = time.time()
    for name, fn in qs.items():
        try:
            sdf = fn(spark, args.sf)
            scols, srows = sdf.columns, [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001 — report, keep driving
            fail.append((name, f"spark error: {e}"))
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"ok(rows-only) {name}: {len(srows)} rows")
            continue
        try:
            cur = con.execute(sql)
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:  # noqa: BLE001
            fail.append((name, f"oracle error: {e}"))
            continue
        if sorted(scols) != sorted(ocols):
            fail.append((name, f"schema {sorted(scols)} != {sorted(ocols)}"))
        elif len(srows) != len(orows):
            fail.append((name, f"rows {len(srows)} != {len(orows)}"))
        elif rows_key(scols, srows) != rows_key(ocols, orows):
            fail.append((name, "values differ"))
        else:
            print(f"ok {name}: {len(srows)} rows")
    print(f"\n{len(qs)} queries, fail={len(fail)} in {time.time() - t0:.0f}s")
    for name, why in fail:
        print(f"  FAIL {name}: {why}")
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main())
