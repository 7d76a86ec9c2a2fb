#!/usr/bin/env python
"""Measured shuffle economy per headline query — evidence, not guesses.

For each bench HEADLINE query, runs it at $SPARK_GRAFT_SF_DIR (default
sf0.1) and attributes the completed Spark stages to it via the status
REST API, summing input / shuffle-write / shuffle-read / spill bytes.
The interesting number at 100 TB is the SHUFFLE AMPLIFICATION
(shuffle-write bytes per input byte): a query that shuffles a small
multiple of what it reads scales with the network it is given; one
that shuffles >> input hits the wire first.

    python tools/shuffle_audit.py                    # all headline queries
    python tools/shuffle_audit.py --only q1 --only d_  # prefixes
    python tools/shuffle_audit.py --json             # machine-readable

Caveats: stage attribution is by wall-clock interleaving (queries run
serially, so stages between two marks belong to the query between
them); bytes are for THIS sf — the ratios, not the absolute numbers,
are the scale signal.  Spill columns should be 0 at every test SF;
non-zero spill at sf0.1 on 128 GiB means a partitioning bug, not a
memory shortage.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

UI_PORT = 4061


def _get(url: str):
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.load(r)


def open_status_api(spark):
    """(base_url, app_id) of the live session's status REST API.

    The UI may bind UI_PORT+n when the port is taken
    (port.maxRetries) — always read the port actually bound."""
    base = f"{spark.sparkContext.uiWebUrl}/api/v1"
    return base, _get(f"{base}/applications")[0]["id"]


def measure(spark, base: str, app_id: str, specs, names, sf_dir: str,
            verbose: bool = True) -> list[dict]:
    """Run each named registry query at sf_dir through a noop sink and
    attribute its completed stages (input/shuffle/spill bytes) via the
    status API.  Queries run serially, so stages between two marks
    belong to the query between them."""

    def completed_stages() -> dict[tuple, dict]:
        out = {}
        for s in _get(f"{base}/applications/{app_id}/stages?status=COMPLETE"):
            out[(s["stageId"], s["attemptId"])] = s
        return out

    rows = []
    for name in names:
        before = set(completed_stages())
        t0 = time.perf_counter()
        df = specs[name].fn(spark, sf_dir)
        # noop sink: materializes EVERY column through the full plan.
        # A count() here would let Catalyst prune windows/sorts/columns
        # and the audit would measure a thinner plan than the query.
        df.write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        # Denominator: on-disk bytes of the parquet the final plan
        # scans.  (The REST stages' inputBytes under-reports for
        # vectorized parquet; inputRecords is reliable and reported.)
        try:
            src_bytes = sum(os.path.getsize(p.removeprefix("file:"))
                            for p in df.inputFiles())
        except Exception:
            src_bytes = 0
        time.sleep(0.3)  # status store is async; let stages land
        stages = completed_stages()
        mine = [s for k, s in stages.items() if k not in before]
        agg = {m: sum(s.get(m, 0) for s in mine) for m in (
            "inputRecords", "outputBytes", "shuffleWriteBytes",
            "shuffleReadBytes", "memoryBytesSpilled", "diskBytesSpilled")}
        agg["sourceBytes"] = src_bytes
        amp = agg["shuffleWriteBytes"] / src_bytes if src_bytes else 0.0
        rows.append({"query": name, "sec": round(wall, 2),
                     "n_stages": len(mine), **agg,
                     "shuffle_amplification": round(amp, 3)})
        if verbose:
            print(f"{name:28s} src={src_bytes/2**20:7.1f}MB "
                  f"shufW={agg['shuffleWriteBytes']/2**20:8.1f}MB "
                  f"amp={amp:6.3f} "
                  f"spill={(agg['memoryBytesSpilled']+agg['diskBytesSpilled'])/2**20:6.1f}MB "
                  f"stages={len(mine):3d} {wall:5.1f}s", flush=True)
    return rows


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--only", action="append", default=[])
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    from bench import HEADLINE
    from old_original_java_little_horse_spark.registry import all_queries
    from old_original_java_little_horse_spark.session import get_spark

    spark = get_spark("shuffle-audit", extra_conf={
        "spark.ui.enabled": "true",
        "spark.ui.port": str(UI_PORT),
        # Keep every stage in the status store for the whole audit.
        "spark.ui.retainedStages": "100000",
    })
    base, app_id = open_status_api(spark)

    specs = all_queries()
    names = [n for n in HEADLINE if n in specs]
    if args.only:
        names = [n for n in names if any(n.startswith(p) for p in args.only)]

    rows = measure(spark, base, app_id, specs, names, args.sf,
                   verbose=not args.json)

    if args.json:
        print(json.dumps({"sf_dir": args.sf, "rows": rows}))
    else:
        tot_in = sum(r["sourceBytes"] for r in rows)
        tot_sw = sum(r["shuffleWriteBytes"] for r in rows)
        spill = sum(r["memoryBytesSpilled"] + r["diskBytesSpilled"]
                    for r in rows)
        print(f"\n{len(rows)} queries: source {tot_in/2**20:.0f}MB, "
              f"shuffle-write {tot_sw/2**20:.0f}MB "
              f"(overall amp {tot_sw/max(tot_in,1):.3f}), "
              f"total spill {spill/2**20:.0f}MB")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
