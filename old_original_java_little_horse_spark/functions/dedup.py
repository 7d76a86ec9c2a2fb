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

N_BANDS = 8
SHINGLE_K = 5  # 5-word shingles: the corpus vocabulary is tiny, so
               # shorter shingles collide constantly and LSH buckets blow up


def normalized_text(c: Column) -> Column:
    """Dedup normalization: lowercase, collapse whitespace, trim."""
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def shingle_rows(spark: SparkSession, sf_dir: str, k: int) -> DataFrame:
    """Distinct (doc_id, source, s) k-word shingle rows.

    Built as posexplode(words) + window `lead` instead of a
    `transform(sequence, i -> concat_ws(slice(...)))` array
    expression: Spark evaluates higher-order functions interpreted
    (outside whole-stage codegen) and that measured ~25x slower.
    Here everything — split, explode, lead, concat — stays in
    codegen; the only exchange is the hash partition on doc_id, which
    the downstream distinct/groupBy reuse.
    """
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    w = d.select(
        "doc_id", "source",
        F.posexplode(F.split(normalized_text(F.col("text")), " ")).alias("pos", "w"),
    )
    win = Window.partitionBy("doc_id").orderBy("pos")
    parts = [F.col("w")] + [F.lead("w", i).over(win) for i in range(1, k)]
    return (
        w.select(
            "doc_id", "source",
            F.concat_ws(" ", *parts).alias("s"),
            F.lead("w", k - 1).over(win).alias("_tail"),
        )
        .where(F.col("_tail").isNotNull())  # drop incomplete trailing shingles
        .select("doc_id", "source", "s")
        .distinct()
    )


def _hashed_shingle_sets(spark: SparkSession, sf_dir: str, k: int) -> DataFrame:
    """(doc_id, source, sh) with sh = set of 32-bit shingle hashes.

    Verification jaccard runs array_intersect per candidate pair —
    interpreted, so cost scales with per-element comparison work.
    Each shingle becomes the first 8 md5 hex chars parsed to a LONG:
    long-array intersection beats string arrays on both compare cost
    and shuffle bytes.  The mapping hex→long is a bijection, so
    intersection/union COUNTS (all the oracle checks) are unchanged —
    the DuckDB side keeps the hex-string form.  32-bit collisions
    among ~100 shingles/doc are negligible (and identical on both
    engines either way).
    """
    rows = shingle_rows(spark, sf_dir, k).withColumn(
        "s", F.conv(F.substring(F.md5("s"), 1, 8), 16, 10).cast("long")
    )
    return rows.groupBy("doc_id", "source").agg(F.collect_set("s").alias("sh"))


def minhash_sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, band, sig) LSH signatures: shingle rows → codegen md5
    per band → partial-aggregated groupBy min (map-side combine
    collapses shingles before the exchange — the scale path)."""
    exploded = shingle_rows(spark, sf_dir, SHINGLE_K)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{b}|"), F.col("s")))).alias(f"b{b}")
        for b in range(N_BANDS)
    ]
    wide = exploded.groupBy("doc_id").agg(*aggs)
    stack = ", ".join(f"{b}, b{b}" for b in range(N_BANDS))
    return wide.select(
        "doc_id", F.expr(f"stack({N_BANDS}, {stack}) as (band, sig)")
    )


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
# (Spark-side plan built by `minhash_sigs` above)
# --------------------------------------------------------------------------

_MINHASH_ORACLE_SHINGLES = f"""
WITH t AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS w
  FROM documents
), s AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len(w) >= {SHINGLE_K}
              THEN list_transform(generate_series(1, len(w) - {SHINGLE_K - 1}),
                                  i -> array_to_string(w[i:i+{SHINGLE_K - 1}], ' '))
              ELSE [] END) AS shingles
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
  WHERE len(shingles) > 0
)
"""


@query(
    "d_minhash_signatures",
    oracle=_MINHASH_ORACLE_SIGS + "SELECT doc_id, band, sig FROM sigs",
)
def d_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document LSH band signatures (the shuffle key of the dedup
    join)."""
    return minhash_sigs(spark, sf_dir)


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
  SELECT doc_id, list_distinct(list_transform(shingles, v -> substr(md5(v), 1, 8))) AS sh FROM s
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
    cap bucket width.  inter/union are computed in one projection so
    the (interpreted) array_intersect runs once per pair, and the
    filter compares integers, not a recomputed ratio.
    """
    sigs = minhash_sigs(spark, sf_dir)
    a = sigs.alias("a")
    b = sigs.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.sig") == F.col("b.sig"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    shset = _hashed_shingle_sets(spark, sf_dir, SHINGLE_K).drop("source")
    x = shset.alias("x")
    y = shset.alias("y")
    pairs = (
        cand.join(x, cand.doc_a == F.col("x.doc_id"))
        .join(y, cand.doc_b == F.col("y.doc_id"))
        .select(
            "doc_a", "doc_b",
            F.size(F.array_intersect(F.col("x.sh"), F.col("y.sh"))).alias("inter"),
            (F.size(F.col("x.sh")) + F.size(F.col("y.sh"))).alias("sz_sum"),
        )
        .select(
            "doc_a", "doc_b",
            (F.col("inter") * F.lit(1.0)
             / F.nullif((F.col("sz_sum") - F.col("inter")).cast("long"), F.lit(0))).alias("jac"),
        )
    )
    return pairs.where(F.col("jac") >= 0.5).select(
        "doc_a", "doc_b", F.round("jac", 4).cast("double").alias("jaccard")
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
WITH w0 AS (
  SELECT doc_id, source,
         string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS w
  FROM documents
), t AS (
  SELECT doc_id, source,
         list_distinct(list_transform(
           CASE WHEN len(w) >= 3
                THEN list_transform(generate_series(1, len(w) - 2),
                                    i -> array_to_string(w[i:i+2], ' '))
                ELSE [] END,
           v -> substr(md5(v), 1, 8))) AS sh
  FROM w0
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
    t = _hashed_shingle_sets(spark, sf_dir, k=3)
    a, b = t.alias("a"), t.alias("b")
    pairs = (
        a.join(b, (F.col("a.source") == F.col("b.source")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh"))).alias("inter"),
            (F.size(F.col("a.sh")) + F.size(F.col("b.sh"))).alias("sz_sum"),
        )
        .select(
            "doc_a", "doc_b",
            (F.col("inter") * F.lit(1.0)
             / F.nullif((F.col("sz_sum") - F.col("inter")).cast("long"), F.lit(0))).alias("jac"),
        )
    )
    return pairs.where(F.col("jac") >= 0.02).select(
        "doc_a", "doc_b", F.round("jac", 4).cast("double").alias("jaccard")
    )


# --------------------------------------------------------------------------
# SimHash near-dup pairs — bucket by signature prefix, verify by Hamming
# --------------------------------------------------------------------------

_SIMHASH_EXPR_SPARK = """
        array_join(
          transform(sequence(1, 16),
            i -> CASE WHEN 2 * size(filter(split(trim(regexp_replace(lower(text), '\\\\s+', ' ')), ' '),
                           x -> instr('89abcdef', substring(md5(x), i, 1)) > 0))
                      > size(split(trim(regexp_replace(lower(text), '\\\\s+', ' ')), ' '))
                 THEN '1' ELSE '0' END),
          '')
"""


@query(
    "d_simhash_pairs",
    oracle="""
WITH t AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS w
  FROM documents
), sh AS (
  SELECT doc_id,
       array_to_string(
         list_transform(generate_series(1, 16),
           i -> CASE WHEN 2 * len(list_filter(w,
                        x -> strpos('89abcdef', substr(md5(x), i, 1)) > 0))
                     > len(w)
                THEN '1' ELSE '0' END),
         '') AS sig
  FROM t
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       len(list_filter(generate_series(1, 16),
           i -> substr(a.sig, i, 1) <> substr(b.sig, i, 1))) AS hamming
FROM sh a JOIN sh b
  ON substr(a.sig, 1, 8) = substr(b.sig, 1, 8) AND a.doc_id < b.doc_id
WHERE len(list_filter(generate_series(1, 16),
          i -> substr(a.sig, i, 1) <> substr(b.sig, i, 1))) <= 3
""",
)
def d_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-duplicate pairs: bucket on the signature's first
    8 bits (the LSH blocking key — near-dups rarely differ there),
    verify candidates by full 16-bit Hamming distance <= 3.

    Scale notes: the self-join shuffles on the prefix bucket only;
    Hamming verification runs per candidate pair, not per n² pair.
    More prefix tables (rotated bit ranges) would raise recall the
    same way the ANN query's OR'd tables do.
    """
    d = load_table(spark, sf_dir, "documents")
    sigs = d.select("doc_id", F.expr(_SIMHASH_EXPR_SPARK).alias("sig"))
    a, b = sigs.alias("a"), sigs.alias("b")
    hamming = F.size(F.filter(
        F.sequence(F.lit(1), F.lit(16)),
        lambda i: F.substring(F.col("a.sig"), 1, 16).substr(i, F.lit(1))
        != F.substring(F.col("b.sig"), 1, 16).substr(i, F.lit(1)),
    ))
    return (
        a.join(b, (F.substring(F.col("a.sig"), 1, 8) == F.substring(F.col("b.sig"), 1, 8))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.alias("hamming"),
        )
        .where(F.col("hamming") <= 3)
    )
