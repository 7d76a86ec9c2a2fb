"""Repo-wide plan-shape regression gate.

`tests/test_plans.py` pins ~60 queries with hand-written assertions;
this gate covers every other stable query in breadth: the committed
baseline (`tools/fingerprints.json`) records each query's
load-bearing plan shape (exchange count, join strategies, scans,
windows, Python stages) and any drift — a broadcast join falling back
to sort-merge, a new shuffle, a JVM expression replaced by a Python
UDF — fails here with a diff.

Legitimate plan changes: regenerate with
`python tools/plan_fingerprints.py` and commit the diff so the
change is visible in review.
"""

from __future__ import annotations

import json

import pytest

from tools.plan_fingerprints import BASELINE, fingerprint, included_queries

from .conftest import SF_SMOKE

with open(BASELINE) as _f:
    _WANT = json.load(_f)


def test_baseline_covers_registry():
    names = set(included_queries())
    assert set(_WANT) == names, (
        f"baseline out of date: +{sorted(names - set(_WANT))} "
        f"-{sorted(set(_WANT) - names)} — regen tools/fingerprints.json")


@pytest.mark.parametrize("name", sorted(_WANT))
def test_plan_shape_unchanged(spark, name):
    spec = included_queries().get(name)
    if spec is None:
        pytest.skip("query removed; covered by test_baseline_covers_registry")
    got = fingerprint(spec.fn(spark, SF_SMOKE))
    assert got == _WANT[name], (
        f"{name} plan shape drifted: baseline={_WANT[name]} now={got} — "
        "if intentional, regen tools/fingerprints.json")
