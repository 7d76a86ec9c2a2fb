"""Duplicate-cluster resolution: connected-components unit graphs plus
oracle parity at smoke scale.  The transitive case (A≈B exact, B≈C
near ⇒ one cluster) is what pair queries alone cannot express."""

from __future__ import annotations

import pytest

from old_original_java_little_horse_spark.functions.clustering import (
    connected_components,
)
from old_original_java_little_horse_spark.registry import all_queries

from .conftest import SF_SMOKE
from .oracle_compare import compare


def test_cc_chain_and_islands(spark):
    edges = spark.createDataFrame(
        [("b", "a"), ("c", "b"), ("e", "d"), ("x", "w"), ("w", "v")],
        "src string, dst string")
    got = {r["node"]: r["label"] for r in connected_components(edges).collect()}
    assert got == {"a": "a", "b": "a", "c": "a",
                   "d": "d", "e": "d",
                   "v": "v", "w": "v", "x": "v"}


def test_cc_long_chain_converges(spark):
    """A 13-node path needs multiple propagation rounds (diameter 12);
    hash-min must still converge and label everything with the min."""
    n = 12
    edges = spark.createDataFrame(
        [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(n)],
        "src string, dst string")
    got = {r["node"]: r["label"] for r in connected_components(edges).collect()}
    assert len(got) == n + 1
    assert set(got.values()) == {"n00"}


@pytest.mark.parametrize("name", ["d_dup_clusters", "d_dedup_canonical"])
def test_clustering_oracle_parity_smoke(spark, name):
    specs = all_queries()
    res = compare(spark, SF_SMOKE, name, specs[name])
    assert res["ok"], res


def test_edge_memo_is_bounded_lru(spark):
    """The persisted dup-edge memo must evict (and unpersist) its
    oldest entry once more than _EDGE_MEMO_CAP distinct (app, sf_dir)
    keys are touched — a long-lived session must not leak cached
    blocks."""
    from old_original_java_little_horse_spark.functions import clustering as C

    saved = dict(C._EDGE_MEMO)
    C._EDGE_MEMO.clear()
    try:
        first = C._dup_edges(spark, SF_SMOKE)
        assert first.storageLevel.useMemory
        # same key → hit, no growth
        assert C._dup_edges(spark, SF_SMOKE) is first
        assert len(C._EDGE_MEMO) == 1
        # fill to cap with synthetic keys, then overflow
        for i in range(C._EDGE_MEMO_CAP):
            C._EDGE_MEMO[("fake-app", f"/fake/sf{i}")] = (
                spark.createDataFrame([("a", "b")], "src string, dst string")
                .persist())
        evicted = next(iter(C._EDGE_MEMO.values()))
        C._dup_edges(spark, SF_SMOKE + "/")  # distinct key → forces eviction
        assert len(C._EDGE_MEMO) <= C._EDGE_MEMO_CAP
        assert not evicted.storageLevel.useMemory  # unpersisted
    finally:
        for df in C._EDGE_MEMO.values():
            try:
                df.unpersist()
            except Exception:
                pass
        C._EDGE_MEMO.clear()
        C._EDGE_MEMO.update(saved)
