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
# under a time budget, so whatever it cannot reach is whatever sits at
# the tail.  Rotated each round: round 4 fronts the 21 queries with no
# round-3 CORRECTNESS row (the round-3 rotation's displacees) plus the
# two analytics queries fixed for the TIMESTAMP_NTZ testdata change;
# the freshly-green round-3 set follows them.
_CHECK_FIRST = [
    # new in round 4 — never driver-checked
    "t_segment_dedup", "t_lm_score", "s3_serving_store_upsert",
    "stream_sessionize", "t_curated_corpus", "sim_dup_clusters",
    "j6_range_count",
    "w4_sessionize", "j5_asof_join",
    "x_comparison_ops", "x_mutation_arith",
    "d_ngram_jaccard_pairs", "d_simhash_pairs",
    "d_dup_clusters", "d_dedup_canonical",
    "t_lang_id", "t_quality_score", "t_token_count", "t_fingerprint",
    "t_corpus_stats", "t_pii_redact", "t_doc_chunks", "t_hash_split",
    "t_top_ngrams", "t_distinctive_terms", "t_decontaminate",
    "t_balanced_mix", "t_repetition_score", "t_global_shuffle",
    "t_pack_sequences",
]


def all_queries() -> dict[str, QuerySpec]:
    """Import every module that registers queries, then return them
    with the least-driver-proven queries first (`_CHECK_FIRST`)."""
    # Imports are deferred so `import registry` stays cheap.
    from .operators import analytics, indexing, relational, run_index  # noqa: F401
    from .functions import clustering, corpus, curation, dedup, expressions, multimodal, similarity, text  # noqa: F401
    from .engine import queries as engine_queries  # noqa: F401
    from .streaming import queries as streaming_queries  # noqa: F401

    out = {n: _REGISTRY[n] for n in _CHECK_FIRST if n in _REGISTRY}
    out.update((n, s) for n, s in _REGISTRY.items() if n not in out)
    return out
