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


def all_queries() -> dict[str, QuerySpec]:
    """Import every module that registers queries, then return them."""
    # Imports are deferred so `import registry` stays cheap.
    from .operators import analytics, indexing, relational, run_index  # noqa: F401
    from .functions import clustering, corpus, curation, dedup, expressions, multimodal, similarity, text  # noqa: F401
    from .engine import queries as engine_queries  # noqa: F401
    from .streaming import queries as streaming_queries  # noqa: F401

    return dict(_REGISTRY)
