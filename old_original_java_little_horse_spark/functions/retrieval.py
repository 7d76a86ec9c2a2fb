"""Ranked retrieval over the document corpus.

The index side of the house already exists (`a1_index_posting` builds
posting lists, `idx_search_lookup` resolves exact-match lookups —
the reference's tag-index GETs).  This module adds RANKED retrieval —
the query→top-k-documents operator every corpus pipeline needs for
inspection tooling and hard-negative mining — with scoring kept in
exact integers so the DuckDB oracle hash-matches:

    score(d) = Σ_t  tf(d, t) · idf_e6(t),
    idf_e6(t) = 1_000_000 · N  div  df(t)

(integer division on both engines; the classic tf·idf family with
the log flattened to a rational — ranking-equivalent for the
monotone single-query case and bit-stable cross-engine, where a
float log would hash-drift).

Scale shape: the term filter applies immediately after tokenization,
so only postings of the |Q| query terms survive (at 100 TB this is
the posting-list fetch of an inverted index; here the "fetch" is a
scan-side filter).  tf and df are map-side-combined aggregations; df
(|Q| rows) and N (1 row) BROADCAST back onto the tf stream; the
global top-k is a TakeOrdered, never a full sort.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..registry import query
from ..sources.parquet import load_table

QUERY_TERMS = ("spark", "window", "hash")
TOP_K = 10


@query(
    "idx_tfidf_topk",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), hits AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok WHERE term IN ('spark', 'window', 'hash')
  GROUP BY doc_id, term
), df AS (
  SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM hits
  GROUP BY term
), n AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents
)
SELECT doc_id,
       CAST(SUM(tf * (1000000 * n_docs // df)) AS BIGINT) AS score_e6,
       CAST(COUNT(*) AS BIGINT) AS n_terms_matched
FROM hits JOIN df USING (term) CROSS JOIN n
GROUP BY doc_id
ORDER BY score_e6 DESC, doc_id
LIMIT {TOP_K}
""",
)
def idx_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} documents for a fixed 3-term query under exact-integer
    tf·idf (module docstring).  Deterministic: ties broken by doc_id
    on both engines, so the LIMIT picks the same set."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id",
                   F.explode(F.split("text", " ")).alias("term"))
    hits = (tok.where(F.col("term").isin(*QUERY_TERMS))
            .groupBy("doc_id", "term")
            .agg(F.count(F.lit(1)).alias("tf")))
    df = (hits.groupBy("term")
          .agg(F.countDistinct("doc_id").alias("df")))
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    return (hits.join(F.broadcast(df), "term")
            .crossJoin(F.broadcast(n))
            .groupBy("doc_id")
            .agg(F.sum(F.expr("tf * (1000000 * n_docs div df)"))
                 .alias("score_e6"),
                 F.count(F.lit(1)).alias("n_terms_matched"))
            .orderBy(F.col("score_e6").desc(), "doc_id")
            .limit(TOP_K))
