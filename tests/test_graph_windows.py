"""Round-5 additions: triangle counting (degree-ordered wedge join),
sliding windows, Markov transitions, pivot — unit invariants beside
the registry oracles."""

from __future__ import annotations

import itertools
import random

import pyspark.sql.functions as F

from old_original_java_little_horse_spark.functions.clustering import (
    triangle_stats,
)
from old_original_java_little_horse_spark.operators.analytics import (
    a9_markov_transitions,
    w9_sliding_windows,
)
from old_original_java_little_horse_spark.operators.relational import (
    agg_pivot_matrix,
)
from old_original_java_little_horse_spark.sources.parquet import load_table

from .conftest import SF_SMOKE


def _stats(spark, edges):
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "src long, dst long")
    return triangle_stats(df).collect()[0]


def _brute(edges):
    """Driver-side oracle: triangles / wedges by enumeration."""
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    adj: dict = {}
    for u, v in und:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    tri = sum(1 for a, b, c in itertools.combinations(sorted(adj), 3)
              if b in adj[a] and c in adj[a] and c in adj[b])
    wedges = sum(len(n) * (len(n) - 1) // 2 for n in adj.values())
    return len(adj), len(und), wedges, tri


def test_triangle_unit_graphs(spark):
    # one triangle: 3 wedges, coefficient exactly 1.0
    r = _stats(spark, [(1, 2), (2, 3), (3, 1)])
    assert (r.n_nodes, r.n_edges, r.n_wedges, r.n_triangles) == (3, 3, 3, 1)
    assert r.global_cc_e6 == 1_000_000
    # star K1,3: all wedges, no closure
    r = _stats(spark, [(0, 1), (0, 2), (0, 3)])
    assert (r.n_wedges, r.n_triangles, r.global_cc_e6) == (3, 0, 0)
    # K4: 4 triangles over 12 wedges -> coefficient 1.0 again
    r = _stats(spark, [(a, b) for a, b in itertools.combinations(range(4), 2)])
    assert (r.n_edges, r.n_wedges, r.n_triangles) == (6, 12, 4)
    assert r.global_cc_e6 == 1_000_000
    # path: zero triangles; direction/dup/self-loop noise is ignored
    r = _stats(spark, [(1, 2), (3, 2), (3, 4), (2, 1), (5, 5)])
    assert (r.n_edges, r.n_triangles) == (3, 0)


def test_triangle_random_graphs_match_bruteforce(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = 12 + 4 * trial
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(3 * n)]
        got = _stats(spark, edges)
        nodes, ne, wedges, tri = _brute(edges)
        assert (got.n_nodes, got.n_edges, got.n_wedges, got.n_triangles) == \
            (nodes, ne, wedges, tri), f"trial {trial}"


def test_sliding_windows_fanout_is_span_over_slide(spark):
    """Every event lands in exactly span/slide = 4 sliding windows, so
    the window table's event total is 4x the raw count and every
    window start is 15-min aligned."""
    raw = load_table(spark, SF_SMOKE, "events").count()
    w = w9_sliding_windows(spark, SF_SMOKE)
    agg = w.agg(F.sum("n_events").alias("s"),
                F.max(F.col("window_start_us") % (900 * 1_000_000))
                 .alias("mis")).collect()[0]
    assert agg.s == 4 * raw
    assert agg.mis == 0


def test_markov_rows_are_stochastic(spark):
    """Per-src transition counts sum to (events - users-with-one-run
    boundary) and floor-divided probabilities sum to 1e6 minus the
    division loss (< number of dst buckets)."""
    e = load_table(spark, SF_SMOKE, "events")
    n_events = e.count()
    n_users = e.select("user_id").distinct().count()
    t = a9_markov_transitions(spark, SF_SMOKE)
    rows = t.collect()
    assert sum(r.n_trans for r in rows) == n_events - n_users
    per_src: dict = {}
    for r in rows:
        per_src.setdefault(r.src, []).append(r.p_e6)
    for src, ps in per_src.items():
        assert 1_000_000 - len(ps) < sum(ps) <= 1_000_000, src


def test_pivot_matrix_totals(spark):
    """The wide matrix re-sums to the raw table: rows partition
    lineitem, cents partition the cent-quantized revenue."""
    li = load_table(spark, SF_SMOKE, "lineitem")
    raw = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long"))
         .alias("cents")).collect()[0]
    p = agg_pivot_matrix(spark, SF_SMOKE)
    tot = p.agg(F.sum(F.col("f_rows") + F.col("o_rows")).alias("n"),
                F.sum(F.col("f_cents") + F.col("o_cents")).alias("cents")
                ).collect()[0]
    assert (tot.n, tot.cents) == (raw.n, raw.cents)


def test_kmv_set_ops_small_population_emits_no_row(spark, tmp_path):
    """Fewer than KMV_K distinct users => there is no k-th hash and
    the sketch is undefined: Spark emits zero rows, exactly like the
    oracle's `rn = K` CTE (this is the guard sk_kmv_distinct has
    always had, pinned here for the set-algebra twin)."""
    import pandas as pd
    from old_original_java_little_horse_spark.functions.sketches import (
        sk_kmv_set_ops,
    )

    df = pd.DataFrame({
        "event_id": range(6),
        "ts": pd.to_datetime(["2024-01-01"] * 6),
        "user_id": [1, 1, 2, 2, 3, 3],
        "event_type": ["click", "purchase"] * 3,
        "value": [1.0] * 6,
        "props": ["{}"] * 6,
    })
    df.to_parquet(tmp_path / "events.parquet")
    assert sk_kmv_set_ops(spark, str(tmp_path)).count() == 0
