"""Integration-test harness (`lhctl test` parity).

The reference ships a prototype end-to-end harness behind
`lhctl test` (`lh_cli/verbs/handle_test.py` driving
`lh_test_harness/`): deploy the test-case workflows against a LIVE
API, launch N requests per case, poll each run to a terminal status,
and run the case's check function against the served WFRun document.

This package is its Spark-side twin: `cases.py` re-expresses the
reference's `lh_test_harness/tests/*.py` case files on our SDK
builder, `executor.py` is the task implementation bundle (the
reference's `shared_tasks.py` + per-case tasks), and `runner.py`
drives everything over plain HTTP — the SAME routes a user hits —
against either an external `--api` server or an embedded one the CLI
verb boots for a self-contained smoke.
"""
