"""Task implementations for the example workflows — the reference's
per-example Python task functions, bundled behind the repo's executor
contract:

    python -m old_original_java_little_horse_spark.cli serve \
        --base-dir state/ --executor examples.tasks:execute
"""

from __future__ import annotations

import json
import random


def _ok(value) -> dict:
    out = value if isinstance(value, str) else json.dumps(value)
    return {"stdout": out, "success": True, "returncode": 0}


def execute(task_def_name: str, subs: dict) -> dict:
    if task_def_name == "hello_there":
        return _ok(f"Hello there, {subs.get('name', '')}!")
    if task_def_name == "dummy":
        return _ok("Hello, there!")
    if task_def_name == "happy":
        return _ok("Yay!")
    if task_def_name == "false_dummy":
        return _ok("false dummy")
    if task_def_name == "multiply":
        return _ok(json.dumps(int(subs.get("some_number", 0)) * 3))
    if task_def_name == "parent_task":
        return _ok(f'Called parent_task() with input "{subs.get("input_str")}"!')
    if task_def_name == "child_task":
        return _ok(f'Called child_task() with input "{subs.get("input_str")}"')
    if task_def_name == "dummy_42":
        return _ok(json.dumps(42))
    if task_def_name == "unreliable_task":
        # basic_exceptions.py's random assert: fails ~70% of the time
        if random.random() <= 0.7:
            return {"stdout": None, "stderr": "AssertionError",
                    "success": False, "returncode": 1}
        return _ok(json.dumps(5))
    return {"stdout": None, "stderr": f"unknown task {task_def_name!r}",
            "success": False, "returncode": 127}
