"""Task implementations for the harness cases — the reference's
`lh_test_harness/tests/shared_tasks.py` bundle, shaped for our
executor contract: `execute(task_def_name, variable_substitutions)
-> {"stdout", "success", "returncode"}`.

Bind it wherever an executor is needed:

    python -m old_original_java_little_horse_spark.cli serve \
        --executor old_original_java_little_horse_spark.harness.executor:execute
"""

from __future__ import annotations

import json
from typing import Any

HELLO = "Hello, there!"

# fail-once bookkeeping for the retry case: the FIRST attempt per
# marker fails, every later one succeeds.  Keyed by the run-unique
# marker variable the runner injects, so N concurrent requests cannot
# poison each other.  In-process state: the embedded server and the
# `cli work` worker both dispatch every attempt of a marker through
# one process, which is all the retry case needs.
_FAIL_ONCE_SEEN: set[str] = set()


def _ok(value: Any) -> dict:
    out = value if isinstance(value, str) else json.dumps(value)
    return {"stdout": out, "success": True, "returncode": 0}


def _fail(msg: str) -> dict:
    return {"stdout": None, "stderr": msg, "success": False, "returncode": 1}


def execute(task_def_name: str, subs: dict) -> dict:
    """Dispatch a scheduled task to its implementation."""
    if task_def_name == "echo":
        # shared_tasks.echo_task: stdout = the input, verbatim
        return _ok(subs.get("x", ""))
    if task_def_name == "hello_there":
        # shared_tasks.hello_there(name) -> greeting string
        return _ok(f"General {subs.get('name', '')}!")
    if task_def_name == "add_one":
        return _ok(json.dumps(int(subs.get("x", 0)) + 1))
    if task_def_name == "double":
        return _ok(json.dumps(int(subs.get("x", 0)) * 2))
    if task_def_name == "make_json":
        return _ok({"x": int(subs.get("seed", 0)) + 40, "label": "made"})
    if task_def_name == "slow_task":
        # shared_tasks.slow_task: sleeps 5s — always out-waited by the
        # 1s timeout the case declares.  Inline contract: None = "the
        # worker picked this up and never answered", so the engine's
        # own timeout timer (not the executor) terminates the attempt.
        return None
    if task_def_name == "fail_once":
        marker = str(subs.get("marker", ""))
        if marker not in _FAIL_ONCE_SEEN:
            _FAIL_ONCE_SEEN.add(marker)
            return _fail(f"induced first-attempt failure for {marker}")
        return _ok("recovered")
    return _fail(f"no harness task implementation for {task_def_name!r}")
