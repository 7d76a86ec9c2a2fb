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
# whatever sits at the tail.  Round-7 rotation (VERDICT r6 item 1):
# the 55 queries whose latest driver evidence is round 3 or round 4 —
# 5 r3-stale engine/stream queries, then the 50 r4-stale block,
# ordered oldest-evidence-first.  A ~50-row driver budget covers the
# head-50; whatever tail (≤5) it cannot reach stays r4-stale and
# must LEAD the round-8 rotation before the steady-state ~3-round
# re-check cadence begins.
_CHECK_FIRST = [
    # latest driver evidence: round 3
    "engine_result_counts", "engine_streaming_fold",
    "engine_index_incremental", "stream_doc_dedup",
    "stream_minhash_incremental",
    # latest driver evidence: round 4
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier_volume",
    "w4_sessionize", "j5_asof_join", "w5_length_quantiles", "a6_funnel",
    "j6_range_count", "p3_alias_projection", "a1_index_posting",
    "idx_search_lookup", "p1_fanout_filter", "p2_nonnull_projection",
    "j2_broadcast_enrich", "j3_lookup_join", "j4_fifo_correlation",
    "a2_status_rollup", "a5_all_ids", "w1_position_numbering",
    "w2_latest_entry", "w3_timer_scan", "s_alias_diff_except",
    "sort_limit_topn", "s3_serving_store_upsert", "d_ngram_jaccard_pairs",
    "d_simhash_pairs", "d_dup_clusters", "d_dedup_canonical",
    "t_lang_id", "t_quality_score", "t_token_count", "t_fingerprint",
    "t_corpus_stats", "t_pii_redact", "t_doc_chunks", "t_hash_split",
    "t_top_ngrams", "t_distinctive_terms", "t_segment_dedup", "t_lm_score",
    "t_decontaminate", "t_balanced_mix", "t_repetition_score",
    "t_global_shuffle", "t_pack_sequences", "t_curated_corpus",
    "x_comparison_ops", "x_mutation_arith", "sim_dup_clusters",
    "stream_sessionize",
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
