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


def _query_term_hits(d: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Shared posting fetch: (hits, df) for the fixed QUERY_TERMS —
    per-(doc, term) tf after the scan-side term filter, and per-term
    document frequency.  Both ranked-retrieval queries score on top of
    this same pipeline, so tokenization/term changes happen once."""
    tok = d.select("doc_id",
                   F.explode(F.split("text", " ")).alias("term"))
    hits = (tok.where(F.col("term").isin(*QUERY_TERMS))
            .groupBy("doc_id", "term")
            .agg(F.count(F.lit(1)).alias("tf")))
    df = (hits.groupBy("term")
          .agg(F.countDistinct("doc_id").alias("df")))
    return hits, df


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
    hits, df = _query_term_hits(d)
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    return (hits.join(F.broadcast(df), "term")
            .crossJoin(F.broadcast(n))
            .groupBy("doc_id")
            .agg(F.sum(F.expr("tf * (1000000 * n_docs div df)"))
                 .alias("score_e6"),
                 F.count(F.lit(1)).alias("n_terms_matched"))
            .orderBy(F.col("score_e6").desc(), "doc_id")
            .limit(TOP_K))


@query(
    "idx_bm25_topk",
    oracle=f"""
WITH dl AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
  FROM documents
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(dl) AS BIGINT) AS t_tokens
  FROM dl
), tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), hits AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok WHERE term IN ('spark', 'window', 'hash')
  GROUP BY doc_id, term
), df AS (
  SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM hits
  GROUP BY term
)
SELECT doc_id,
       CAST(SUM(CAST((CAST(1000 * n_docs // df AS HUGEINT)
                      * 22 * t_tokens * tf)
                     // (10 * t_tokens * tf + 3 * t_tokens + 9 * dl * n_docs)
                AS BIGINT))
            AS BIGINT) AS bm25_e3,
       CAST(COUNT(*) AS BIGINT) AS n_terms_matched
FROM hits JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN tot
GROUP BY doc_id
ORDER BY bm25_e3 DESC, doc_id
LIMIT {TOP_K}
""",
)
def idx_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} documents under BM25 (k1=1.2, b=0.75) with the log-idf
    flattened to the same rational idf as `idx_tfidf_topk`, so every
    term stays in exact integer arithmetic and the oracle hash-matches.

    BM25's two defining behaviors over tf·idf are kept intact and
    exact: TF SATURATION (the k1 damping — a term's 50th occurrence
    adds almost nothing) and LENGTH NORMALIZATION (the b·dl/avgdl
    penalty for long documents).  With k1 = 6/5, b = 3/4 and
    avgdl = T/N (T total tokens, N docs), the per-term score

        idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

    multiplied through by 10·T becomes the all-integer form

        (idf_e3 · 22·T·tf)  div  (10·T·tf + 3·T + 9·dl·N).

    Scale shape (same as tf·idf): the |Q|-term filter lands on the
    tokenized scan, so only query-term postings survive; df (|Q| rows)
    and the N/T totals (1 row) broadcast; doc length joins against the
    tiny filtered hit set (broadcast here; a doc_id-partitioned hash
    join of the posting fetch against a doc-stats table at 100 TB);
    the global top-k is a TakeOrdered, never a full sort.

    Overflow: the numerator idf_e3·22·T·tf exceeds 64 bits already at
    ~1e6 docs × 1e9 tokens, so it is computed in DECIMAL(38,0) on
    Spark / HUGEINT on DuckDB and only the per-term quotient —
    bounded by idf_e3·22/10 — drops back to BIGINT.  The two widths
    are NOT symmetric past 38 digits: DuckDB's HUGEINT stays exact to
    ~1.7e38 while Spark caps DECIMAL precision at 38 and, under the
    default non-ANSI mode, yields NULL on overflow — a SUM would then
    silently drop that term's score instead of erring.  The corpus
    needed to reach 38 digits (T·tf ≳ 1e34, i.e. ~1e15× the 100 TB
    target) is out of envelope, but if this form is ever lifted to
    document-scale aggregates, enable ANSI mode (or assert the
    numerator non-null) so the failure is loud, not a quiet ranking
    change."""
    d = load_table(spark, sf_dir, "documents")
    dl = d.select("doc_id",
                  F.size(F.split("text", " ")).cast("long").alias("dl"))
    tot = dl.agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("dl").alias("t_tokens"))
    hits, df = _query_term_hits(d)
    scored = (hits.join(F.broadcast(df), "term")
              .crossJoin(F.broadcast(tot))
              .join(dl, "doc_id"))
    return (scored.groupBy("doc_id")
            .agg(F.sum(F.expr(
                "cast((cast(1000 * n_docs div df as decimal(38,0))"
                "      * 22 * t_tokens * tf)"
                " div (10 * t_tokens * tf + 3 * t_tokens"
                "      + 9 * dl * n_docs) as bigint)")).alias("bm25_e3"),
                 F.count(F.lit(1)).alias("n_terms_matched"))
            .orderBy(F.col("bm25_e3").desc(), "doc_id")
            .limit(TOP_K))
