"""Python-worker daemon with the heavy libraries preloaded.

Every Arrow-batched operator in this package (`pandas_udf`,
`mapInPandas`, `applyInPandas`) executes `import numpy / pandas /
pyarrow` inside the worker process.  Workers are forked from
`pyspark.daemon`, and Spark's worker factory KILLS idle workers after
a hardcoded one minute (`PythonWorkerFactory.IDLE_WORKER_TIMEOUT_NS`)
— so any Python stage that runs more than a minute after the previous
one pays a fresh fork per core *plus a cold numpy+pandas+pyarrow
import in every forked worker*.  Measured on this repo's bench: the
first `sim_pq_adc_topk` run after a 100 s idle gap reads 7.1 s vs
2.8 s warm — the delta is almost entirely per-worker imports, paid
again for every query whose samples are spaced minutes apart (the
driver bench interleaves 62 queries, so EVERY pandas-UDF query pays
it on EVERY sample).

The fix is the standard preload idiom (guide §4.5 one level up):
import the heavy libraries ONCE in the daemon parent, before any
fork, so children inherit the already-initialized modules through
copy-on-write.  A forked worker's `import numpy` then hits
`sys.modules` and costs nothing.  On a real cluster the effect is the
same per executor: first-task latency of every Python stage drops by
the import cost, and re-forks after idle reaping stay cheap forever.

Wired up by `session.get_spark` via `spark.python.daemon.module`
(this module must be importable by the worker Python — the session
exports the package root on PYTHONPATH before the JVM launches, the
same mechanism `protobuf_compat.ensure_protobuf` uses).  Disable with
SPARK_GRAFT_NO_DAEMON_PRELOAD=1.

The preload is best-effort: a missing library must degrade to the
stock behavior (workers import it themselves), never break worker
startup.  `pyspark.daemon` itself resolves the worker module from
``sys.argv[1]`` at import time; running this module via ``python -m``
preserves argv, so that contract is untouched.
"""

for _mod in ("numpy", "pandas", "pyarrow", "pyarrow.compute"):
    try:
        __import__(_mod)
    except Exception:  # noqa: BLE001 — preload is best-effort
        pass

from pyspark.daemon import manager  # noqa: E402

if __name__ == "__main__":
    manager()
