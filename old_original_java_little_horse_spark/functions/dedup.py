"""Deduplication operators for training-data pipelines.

- exact dedup: hash-groupBy on normalized content;
- MinHash + LSH: shingle → per-band salted min-hash signature →
  band-bucket join for candidate pairs → exact-Jaccard verification;
- SimHash: bit-majority signature over token hashes;
- n-gram Jaccard: verified pair similarity within blocking buckets.

Scale design: every family is expressed as explode → shuffle-on-hash
→ per-bucket pair generation, never an O(n²) cross join.  Candidate
generation shuffles on (band, signature) — at 100 TB the bucket key
is the only wide exchange and AQE splits skewed buckets.  MinHash
uses md5 (identical on both engines) so the DuckDB oracle reproduces
signatures bit-for-bit.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from ..registry import query
from ..sources.parquet import load_table
from .text import shingles_col, words_col

N_BANDS = 8


def normalized_text(c: Column) -> Column:
    """Dedup normalization: lowercase, collapse whitespace, trim."""
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


# --------------------------------------------------------------------------
# Exact dedup — hash groupBy on normalized content
# --------------------------------------------------------------------------

@query(
    "d_exact_dedup",
    oracle="""
SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS content_key,
       COUNT(*)    AS n_copies,
       MIN(doc_id) AS canonical_doc_id
FROM documents
GROUP BY 1
""",
)
def d_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate groups: map-side partial-agg on the content
    hash; keep min doc_id as canonical.  One shuffle on a uniform
    128-bit key — the cheapest possible dedup at any scale."""
    d = load_table(spark, sf_dir, "documents")
    key = F.md5(normalized_text(F.col("text")))
    return d.groupBy(key.alias("content_key")).agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.min("doc_id").alias("canonical_doc_id"),
    )


# --------------------------------------------------------------------------
# MinHash signatures — per-band salted 1-perm min-hash
# --------------------------------------------------------------------------

def minhash_bands(text: Column, n_bands: int = N_BANDS) -> Column:
    """Array of n_bands minhash values: band b = min over shingles of
    md5(b || '|' || shingle).  Salting the hash per band is the
    standard cheap substitute for independent permutations."""
    sh = shingles_col(words_col(normalized_text(text)))
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_bands - 1)),
        lambda b: F.array_min(
            F.transform(sh, lambda s: F.md5(F.concat(b.cast("string"), F.lit("|"), s)))
        ),
    )


_MINHASH_ORACLE_SHINGLES = """
WITH t AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS w
  FROM documents
), s AS (
  SELECT doc_id,
         CASE WHEN len(w) >= 3
              THEN list_transform(generate_series(1, len(w) - 2),
                                  i -> array_to_string(w[i:i+2], ' '))
              ELSE [] END AS shingles
  FROM t
)
"""

_MINHASH_ORACLE_SIGS = _MINHASH_ORACLE_SHINGLES + f"""
, sigs AS (
  SELECT doc_id, b.band,
         list_aggregate(
           list_transform(shingles, s -> md5(CAST(b.band AS VARCHAR) || '|' || s)),
           'min') AS sig
  FROM s, (SELECT unnest(generate_series(0, {N_BANDS - 1})) AS band) b
)
"""


@query(
    "d_minhash_signatures",
    oracle=_MINHASH_ORACLE_SIGS + "SELECT doc_id, band, sig FROM sigs",
)
def d_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document LSH band signatures (the shuffle key of the dedup
    join).  Signature computation is a pure per-row map."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.posexplode(minhash_bands(F.col("text"))).alias("band", "sig")
    )


# --------------------------------------------------------------------------
# MinHash LSH candidate pairs + exact-Jaccard verification
# --------------------------------------------------------------------------

@query(
    "d_minhash_lsh_pairs",
    oracle=_MINHASH_ORACLE_SIGS + """
, cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sigs a JOIN sigs b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
), ds AS (
  SELECT doc_id, list_distinct(shingles) AS sh FROM s
)
SELECT c.doc_a, c.doc_b,
       CAST(ROUND(
         len(list_filter(x.sh, v -> list_contains(y.sh, v))) * 1.0 /
         NULLIF(len(x.sh) + len(y.sh) - len(list_filter(x.sh, v -> list_contains(y.sh, v))), 0),
         4) AS DOUBLE) AS jaccard
FROM cand c JOIN ds x ON c.doc_a = x.doc_id JOIN ds y ON c.doc_b = y.doc_id
WHERE len(list_filter(x.sh, v -> list_contains(y.sh, v))) * 1.0 /
      NULLIF(len(x.sh) + len(y.sh) - len(list_filter(x.sh, v -> list_contains(y.sh, v))), 0) >= 0.5
""",
)
def d_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs: band-bucket join → candidate pairs →
    exact Jaccard on distinct shingle sets, keep >= 0.5.

    Scale notes: the only wide op is the self-join on (band, sig) —
    identical signatures are rare, so buckets are tiny; the verify
    join ships each doc's shingle set once per candidate pair, never
    a cross join.  At 100 TB, add `F.hash(sig) % P` sub-bucketing to
    cap bucket width.
    """
    d = load_table(spark, sf_dir, "documents")
    sigs = d.select("doc_id", F.posexplode(minhash_bands(F.col("text"))).alias("band", "sig"))
    a = sigs.alias("a")
    b = sigs.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.sig") == F.col("b.sig"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    shset = d.select(
        "doc_id",
        F.array_distinct(shingles_col(words_col(normalized_text(F.col("text"))))).alias("sh"),
    )
    x = shset.alias("x")
    y = shset.alias("y")
    inter = F.size(F.array_intersect(F.col("x.sh"), F.col("y.sh")))
    union = F.size(F.col("x.sh")) + F.size(F.col("y.sh")) - inter
    jac = inter * F.lit(1.0) / F.nullif(union.cast("long"), F.lit(0))
    return (
        cand.join(x, cand.doc_a == F.col("x.doc_id"))
        .join(y, cand.doc_b == F.col("y.doc_id"))
        .where(jac >= 0.5)
        .select("doc_a", "doc_b", F.round(jac, 4).cast("double").alias("jaccard"))
    )


# --------------------------------------------------------------------------
# SimHash — 16-bit bit-majority signature (hex-nibble top bit of md5)
# --------------------------------------------------------------------------

@query(
    "d_simhash",
    oracle="""
WITH t AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS w
  FROM documents
)
SELECT doc_id,
       array_to_string(
         list_transform(generate_series(1, 16),
           i -> CASE WHEN 2 * len(list_filter(w,
                        x -> strpos('89abcdef', substr(md5(x), i, 1)) > 0))
                     > len(w)
                THEN '1' ELSE '0' END),
         '') AS simhash16
FROM t
""",
)
def d_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash: bit i is the majority of md5(token) hex nibble
    i's top bit across tokens.  Near-dups differ in few bits; bucket
    by signature (or by bit-bands) for candidate generation."""
    d = load_table(spark, sf_dir, "documents")
    # SQL-expression form: the band index `i` feeds substring's position
    # argument, which the Python F.substring signature can't take as a
    # lambda variable — the expr is still pure Catalyst (codegen'd).
    sim = F.expr(
        """
        array_join(
          transform(sequence(1, 16),
            i -> CASE WHEN 2 * size(filter(split(trim(regexp_replace(lower(text), '\\\\s+', ' ')), ' '),
                           x -> instr('89abcdef', substring(md5(x), i, 1)) > 0))
                      > size(split(trim(regexp_replace(lower(text), '\\\\s+', ' ')), ' '))
                 THEN '1' ELSE '0' END),
          '')
        """
    )
    return d.select("doc_id", sim.alias("simhash16"))


# --------------------------------------------------------------------------
# n-gram Jaccard within blocking buckets (source = block key)
# --------------------------------------------------------------------------

@query(
    "d_ngram_jaccard_pairs",
    oracle="""
WITH t AS (
  SELECT doc_id, source,
         list_distinct(
           CASE WHEN len(string_split(text, ' ')) >= 3
                THEN list_transform(generate_series(1, len(string_split(text, ' ')) - 2),
                                    i -> array_to_string((string_split(text, ' '))[i:i+2], ' '))
                ELSE [] END) AS sh
  FROM documents
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(ROUND(
         len(list_filter(a.sh, v -> list_contains(b.sh, v))) * 1.0 /
         NULLIF(len(a.sh) + len(b.sh) - len(list_filter(a.sh, v -> list_contains(b.sh, v))), 0),
         4) AS DOUBLE) AS jaccard
FROM t a JOIN t b ON a.source = b.source AND a.doc_id < b.doc_id
WHERE len(list_filter(a.sh, v -> list_contains(b.sh, v))) * 1.0 /
      NULLIF(len(a.sh) + len(b.sh) - len(list_filter(a.sh, v -> list_contains(b.sh, v))), 0) >= 0.02
""",
)
def d_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise 3-gram Jaccard restricted to a blocking key (source).

    Blocking bounds the pair count to sum over buckets of |bucket|²
    instead of n² — the shuffle is on the block key.  Threshold keeps
    genuinely similar pairs.
    """
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", "source",
        F.array_distinct(shingles_col(words_col(F.col("text")))).alias("sh"),
    )
    a, b = t.alias("a"), t.alias("b")
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.col("a.sh")) + F.size(F.col("b.sh")) - inter
    jac = inter * F.lit(1.0) / F.nullif(union.cast("long"), F.lit(0))
    return (
        a.join(b, (F.col("a.source") == F.col("b.source")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .where(jac >= 0.02)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(jac, 4).cast("double").alias("jaccard"),
        )
    )
