"""Large-star/small-star connected components: unit graphs, parity
with hash-min, the O(log n)-vs-O(diameter) round count that justifies
the second implementation, and oracle parity for the registry query."""

from __future__ import annotations

import random

from old_original_java_little_horse_spark.functions.clustering import (
    connected_components,
    connected_components_star,
)
from old_original_java_little_horse_spark.registry import all_queries

from .conftest import SF_SMOKE
from .oracle_compare import compare


def _labels(df):
    return {r["node"]: r["label"] for r in df.collect()}


def _expected(edges):
    """Driver-side union-find oracle: label = min node of component."""
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_star_chain_and_islands(spark):
    edges = [("b", "a"), ("c", "b"), ("e", "d"), ("x", "w"), ("w", "v")]
    df = spark.createDataFrame(edges, "src string, dst string")
    assert _labels(connected_components_star(df)) == _expected(edges)


def test_star_long_path_logarithmic_rounds(spark):
    """A 61-node path (diameter 60) — hash-min would need 60 rounds
    (beyond its 25-round backstop); the star contraction must finish
    in O(log n) rounds and still label everything with the min."""
    n = 60
    edges = [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(n)]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = _labels(connected_components_star(df))
    assert len(got) == n + 1
    assert set(got.values()) == {"n00"}
    assert connected_components_star.last_rounds <= 8


def test_star_matches_hashmin_on_random_graphs(spark):
    """Three seeded random graphs: both algorithms, one answer."""
    for seed in (7, 23, 91):
        rng = random.Random(seed)
        nodes = list(range(40))
        edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(45)]
        edges = [(a, b) for a, b in edges]
        df = spark.createDataFrame(edges, "src long, dst long")
        star = _labels(connected_components_star(df))
        hm = _labels(connected_components(df))
        assert star == hm == _expected(edges)


def test_star_self_loops_and_empty(spark):
    df = spark.createDataFrame([(5, 5), (5, 9)], "src long, dst long")
    assert _labels(connected_components_star(df)) == {5: 5, 9: 5}
    empty = spark.createDataFrame([], "src long, dst long")
    assert connected_components_star(empty).count() == 0


def test_cc_star_oracle_parity_smoke(spark):
    specs = all_queries()
    res = compare(spark, SF_SMOKE, "g_cc_star_clusters",
                  specs["g_cc_star_clusters"])
    assert res["ok"], res
