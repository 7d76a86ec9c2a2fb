"""Central parity-query registry.

Every implemented operator from SURVEY.md §2 (plus the LLM-pipeline
extension ops) registers here as a named query:

- a **Spark function** ``(spark, sf_dir) -> DataFrame`` — the real
  implementation, expressed Spark-first (DataFrame/SQL, Catalyst
  optimized);
- an optional **oracle SQL** string — ANSI SQL DuckDB runs over the
  same parquet tables to independently produce the expected result.
  The driver hash-compares the two at sf=0.01.

Column names are aligned on both sides (the driver sorts columns by
name before hashing).  Float outputs are decimal-cast before
aggregation and rounded on both sides so cross-engine IEEE drift
cannot flip the hash.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: SparkQuery
    oracle: str | None  # DuckDB SQL; None => driver does rows-only check
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator registering a parity query."""

    def deco(fn: SparkQuery) -> SparkQuery:
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


# Queries with the thinnest driver-check history, surfaced to the
# front of the registry: the driver verifies queries in registry order
# under a time budget (~50 rows), so whatever it cannot reach is
# whatever sits at the tail.  Round-6 rotation (VERDICT r5 items 1+3):
# the six round-5 hash-red queries (fixed this round — integer
# fixed-point output surface) lead so CORRECTNESS_r06 records the fix;
# then the 24 queries that have NEVER had a driver row (late-round-5
# registrations past the budget); then the 25 queries stale since r3.
# The freshly-r5-green set follows — it has the freshest evidence and
# can wait a round.
_CHECK_FIRST = [
    # round-5 hash-red, fixed in round 6: DECIMAL/HUGEINT output
    # columns converted to *_cents/*_e6 BIGINT on both engines
    "a11_rfm_segments", "g_triangle_count", "a9_markov_transitions",
    "w8_gap_fill", "j8_temporal_join", "stream_scd2_enrich",
    # never driver-checked (registered mid/late round 5)
    "q2_min_cost_supplier", "q4_priority_semi", "q14_promo_revenue",
    "q18_large_orders", "q19_disjunctive_revenue",
    "q22_idle_customers_anti",
    "sk_hll_registers", "sk_kmv_distinct", "sk_cms_registers",
    "sk_cms_point_queries", "stream_hll_registers", "stream_event_rates",
    "idx_tfidf_topk", "d_winnow_fingerprint_pairs", "g_pagerank_purchases",
    "d_url_dedup", "t_decontaminate_bloom", "t_stratified_sample",
    "t_source_overlap", "a7_event_rate_windows", "j7_interval_overlap",
    "dq_check_suite", "d_dup_cluster_stats", "w6_cohort_retention",
    # stale since round 3 (no r4/r5 driver row)
    "s2_changelog_upsert", "agg_rollup_sets", "engine_run_index",
    "d_exact_dedup", "d_minhash_signatures", "d_minhash_lsh_pairs",
    "d_simhash", "x_mutation_string", "x_mutation_array",
    "x_mutation_remove_key", "x_jsonpath", "x_type_coercion",
    "x_template_substitution", "sim_topk_bruteforce", "sim_lsh_bucketed_ann",
    "sim_label_blocked_neardup", "sim_ivf_ann", "sim_label_centroids",
    "engine_pipeline_fold", "engine_task_runs_flat", "engine_result_counts",
    "engine_streaming_fold", "engine_index_incremental", "stream_doc_dedup",
    "stream_minhash_incremental",
    # last-checked round 4 (all green)
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier_volume",
    "q6_forecast_revenue", "q13_order_distribution", "q16_supplier_variety",
    "q17_small_quantity_revenue", "q20_heavy_part_suppliers",
    "q21_sole_fault_suppliers", "w7_rolling_revenue", "t_span_dedup",
    "stream_interval_join", "sk_bottomk_quantiles", "s4_scd2_dimension",
    "q7_volume_shipping", "q8_market_share", "q9_product_profit",
    "q10_returned_items", "q11_important_parts", "q12_shipping_delay",
    "q15_top_supplier",
]


def all_queries() -> dict[str, QuerySpec]:
    """Import every module that registers queries, then return them
    with the least-driver-proven queries first (`_CHECK_FIRST`)."""
    # Imports are deferred so `import registry` stays cheap.
    from .operators import analytics, indexing, layout, relational, run_index, skew, tpch  # noqa: F401
    from .functions import clustering, corpus, curation, dedup, expressions, multimodal, retrieval, similarity, sketches, text  # noqa: F401
    from .engine import queries as engine_queries  # noqa: F401
    from .streaming import queries as streaming_queries  # noqa: F401

    out = {n: _REGISTRY[n] for n in _CHECK_FIRST if n in _REGISTRY}
    out.update((n, s) for n, s in _REGISTRY.items() if n not in out)
    return out
