"""Distributed sketches: HLL / KMV (cardinality) and count-min (counts).

Counting distinct users per event type over 100 TB is the canonical
"can't afford exact" aggregation: exact distinct shuffles every
distinct key; a sketch shuffles a CONSTANT number of bytes per group.
Both sketches here are built from deterministic md5-derived integers,
so the DuckDB oracle reproduces the registers BIT FOR BIT — the
driver hash-gate verifies the sketch construction itself, not a
tolerance band around a float estimate (the estimate is a one-line
driver-side formula over the verified registers).

- **HLL** (`sk_hll_registers`): register = first byte of md5(user),
  rho = leading-zero count of the next 60 bits + 1; the sketch is
  `max(rho)` per (group, register) — a 256-register table per group,
  built with ONE map-side-combined exchange.  This is exactly the
  aggregation shape of Spark's own `approx_count_distinct`
  (HyperLogLog++), spelled out so the oracle can replay it.
- **KMV / bottom-k** (`sk_kmv_distinct`): keep the k smallest
  distinct hash values per group; the k-th smallest pins the
  estimate  (k−1) · 2^56 / h_k  — integer division on both engines,
  drift-free.  Emitted next to the EXACT distinct count so the
  sketch's error is itself an oracle-checked integer.

- **Count-min** (`sk_cms_registers` / `sk_cms_point_queries`): the
  frequency-estimation twin — 4×256 salted registers whose map-side
  combine is bounded at 1024 rows per partition at ANY event volume,
  plus point queries whose one-sided overestimate is itself an
  oracle-checked integer column.

Reference basis: HLL per Flajolet et al. (AofA 2007) / HLL++ (Heule
et al., EDBT 2013 — the variant inside Spark); KMV per
Bar-Yossef et al. (RANDOM 2002); CMS per Cormode & Muthukrishnan
(J. Algorithms 2005).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..registry import query
from ..sources.parquet import load_table

HLL_REGISTERS = 256  # first md5 byte
KMV_K = 32


def _hex_long(col, start: int, length: int):
    """First `length` hex chars of md5(col) from `start` (1-based) as
    a non-negative BIGINT (≤ 60 bits, so signed-long safe).  DuckDB
    mirror: CAST('0x' || substr(md5(x), start, length) AS BIGINT)."""
    return F.conv(F.substring(F.md5(col), start, length), 16, 10).cast("long")


# --------------------------------------------------------------------------
# HLL register table
# --------------------------------------------------------------------------

@query(
    "sk_hll_registers",
    oracle="""
WITH h AS (
  SELECT DISTINCT event_type, md5(CAST(user_id AS VARCHAR)) AS hx
  FROM events
), r AS (
  SELECT event_type,
         CAST(('0x' || substr(hx, 1, 2)) AS BIGINT) AS register,
         CAST(('0x' || substr(hx, 3, 15)) AS BIGINT) AS tail
  FROM h
)
SELECT event_type, register,
       MAX(CASE WHEN tail = 0 THEN 61
                ELSE 61 - length(bin(tail)) END) AS max_rho
FROM r GROUP BY event_type, register
""",
)
def sk_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog register table per event type, oracle-replayable.

    rho = (leading zeros of the 60-bit tail) + 1 = 61 − bitlength —
    `length(bin(x))` on both engines.  Scale shape: ONE exchange on
    (event_type, register) with map-side `max` partial aggregation —
    per-group sketch state is 256 bytes no matter how many billion
    users pass through, which is the entire reason this operator
    exists at 100 TB.  (The distinct-hash pre-step collapses
    duplicate users map-side too; HLL's max() makes it optional, but
    it keeps the oracle's row set identical under any plan.)

    Estimate (driver-side, over the verified registers):
    alpha_256 * 256² / Σ 2^(−rho), with the standard small-range
    correction — deliberately not emitted: it is derived float math
    over exactly this table."""
    return hll_register_table(load_table(spark, sf_dir, "events"))


# --------------------------------------------------------------------------
# KMV bottom-k with oracle-checked error
# --------------------------------------------------------------------------

@query(
    "sk_kmv_distinct",
    oracle=f"""
WITH h AS (
  SELECT DISTINCT event_type,
         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 14)) AS BIGINT)
           AS hv
  FROM events
), rk AS (
  SELECT event_type, hv,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hv) AS rn
  FROM h
), kth AS (
  SELECT event_type, hv AS kth_hash FROM rk WHERE rn = {KMV_K}
), exact AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS exact_distinct FROM h
  GROUP BY event_type
)
SELECT event_type, kth_hash,
       ({KMV_K} - 1) * (1::BIGINT << 56) // kth_hash AS distinct_est,
       exact_distinct,
       abs(({KMV_K} - 1) * (1::BIGINT << 56) // kth_hash - exact_distinct)
         * 100 // exact_distinct AS err_pct
FROM kth JOIN exact USING (event_type)
""",
)
def sk_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct-count sketch per event type, with its
    error against the exact count as oracle-checked integers.

    The k-th smallest of the distinct 56-bit hashes pins the sketch:
    est = (k−1)·2^56 / h_k (uniform order statistics; 56 bits so
    (k−1)·2^56 stays inside int64), integer division on both
    engines.  Scale shape: distinct hashes collapse
    map-side into ONE exchange; the rank-k selection is a per-group
    window (k·|groups| survivors).  At extreme group cardinality the
    same sketch is an algebraic aggregate (merge = bottom-k of
    unions) — Spark's `approx_count_distinct` is the built-in with
    identical shuffle shape; this spelled-out form exists so the
    sketch itself sits under the hash gate."""
    ev = load_table(spark, sf_dir, "events")
    h = (ev.select("event_type",
                   _hex_long(F.col("user_id").cast("string"), 1, 14)
                   .alias("hv"))
         .distinct())
    w = Window.partitionBy("event_type").orderBy("hv")
    kth = (h.withColumn("rn", F.row_number().over(w))
           .where(F.col("rn") == KMV_K)
           .select("event_type", F.col("hv").alias("kth_hash")))
    exact = (h.groupBy("event_type")
             .agg(F.count(F.lit(1)).alias("exact_distinct")))
    est = F.expr(f"({KMV_K} - 1) * shiftleft(1L, 56) div kth_hash")
    return (kth.join(exact, "event_type")
            .select("event_type", "kth_hash",
                    est.alias("distinct_est"), "exact_distinct",
                    F.expr(f"abs(({KMV_K} - 1) * shiftleft(1L, 56)"
                           f" div kth_hash - exact_distinct)"
                           f" * 100 div exact_distinct").alias("err_pct")))


# --------------------------------------------------------------------------
# Count-min sketch: frequency estimation (the counts-side sketch)
# --------------------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 256  # one md5 byte per row

# The oracle's depth list is DERIVED from CMS_DEPTH so the constant
# cannot drift between the Spark plans and the SQL text.
_CMS_DEPTHS_SQL = f"(SELECT unnest({list(range(CMS_DEPTH))}) AS depth) d"


def cms_register_table(ev: DataFrame) -> DataFrame:
    """The CMS register build shared by both CMS queries: replicate
    ×depth, salt-hash to a bucket, one map-side-combined rollup.

    NULL keys do not enter the sketch (mirrored by the oracles'
    `WHERE user_id IS NOT NULL`): Spark's concat_ws SKIPS a NULL uid
    (hashing just the salt) while SQL's `||` propagates it — the only
    portable contract is to exclude the key."""
    rows = (ev.where(F.col("user_id").isNotNull())
              .select(F.col("user_id").cast("string").alias("uid"))
              .withColumn("depth", F.explode(F.array(
                  *[F.lit(i) for i in range(CMS_DEPTH)]))))
    bucket = F.conv(
        F.substring(F.md5(F.concat_ws(":", "uid", "depth")), 1, 2),
        16, 10).cast("long")
    return (rows.groupBy("depth", bucket.alias("bucket"))
            .agg(F.count(F.lit(1)).alias("total")))


def hll_register_table(ev: DataFrame, distinct: bool = True) -> DataFrame:
    """The HLL register build shared with the streaming twin
    (`streaming/queries.py:stream_hll_registers`).  `distinct=False`
    skips the batch path's distinct-hash pre-step — max() makes it
    optional, and a streaming plan cannot stack two stateful ops."""
    hx = F.md5(F.col("user_id").cast("string"))
    h = ev.select("event_type", hx.alias("hx"))
    if distinct:
        h = h.distinct()
    tail = F.conv(F.substring("hx", 3, 15), 16, 10).cast("long")
    return (h.select(
                "event_type",
                F.conv(F.substring("hx", 1, 2), 16, 10).cast("long")
                 .alias("register"),
                tail.alias("tail"))
            .groupBy("event_type", "register")
            .agg(F.max(F.when(F.col("tail") == 0, F.lit(61))
                       .otherwise(F.lit(61) - F.length(F.expr("bin(tail)"))))
                 .alias("max_rho")))


@query(
    "sk_cms_registers",
    oracle=f"""
SELECT d.depth,
       CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':' ||
                                CAST(d.depth AS VARCHAR)), 1, 2)) AS BIGINT)
         AS bucket,
       CAST(COUNT(*) AS BIGINT) AS total
FROM events, {_CMS_DEPTHS_SQL}
WHERE user_id IS NOT NULL
GROUP BY 1, 2
""",
)
def sk_cms_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch registers over per-user event counts — the
    COUNTS sketch next to the CARDINALITY sketches above (Cormode &
    Muthukrishnan, J.Algorithms 2005): {d} independent md5-salted
    hash rows × {w} buckets; register = total events hashing there.

    Scale shape: the stream is replicated ×{d} by a literal-array
    explode, then ONE exchange — and because the group space is
    capped at {d}·{w} keys, map-side partial aggregation collapses
    each partition to ≤{dw} rows before the shuffle no matter how
    many trillion events flow through.  That bounded-combine property
    is the entire sketch: a heavy-hitter dashboard at 100 TB ships
    {dw} integers per partition, not a per-user table."""
    return cms_register_table(load_table(spark, sf_dir, "events"))


@query(
    "sk_cms_point_queries",
    oracle=f"""
WITH reg AS (
  SELECT d.depth,
         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':' ||
                                  CAST(d.depth AS VARCHAR)), 1, 2)) AS BIGINT)
           AS bucket,
         CAST(COUNT(*) AS BIGINT) AS total
  FROM events, {_CMS_DEPTHS_SQL}
  WHERE user_id IS NOT NULL
  GROUP BY 1, 2
), exact AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact_n FROM events
  WHERE user_id IS NOT NULL
  GROUP BY user_id ORDER BY exact_n DESC, user_id LIMIT 5
), probe AS (
  SELECT e.user_id, e.exact_n, d.depth,
         CAST(('0x' || substr(md5(CAST(e.user_id AS VARCHAR) || ':' ||
                                  CAST(d.depth AS VARCHAR)), 1, 2)) AS BIGINT)
           AS bucket
  FROM exact e, {_CMS_DEPTHS_SQL}
)
SELECT p.user_id, p.exact_n,
       MIN(r.total) AS cms_est,
       MIN(r.total) - p.exact_n AS overestimate
FROM probe p JOIN reg r ON r.depth = p.depth AND r.bucket = p.bucket
GROUP BY p.user_id, p.exact_n
""",
)
def sk_cms_point_queries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CMS point queries for the 5 heaviest users: est = MIN over the
    {d} rows of the register each hash lands in — never under the
    true count, and the oracle-checked `overestimate` column IS the
    sketch's one-sided error, as exact integers.

    Scale shape: registers build as in `sk_cms_registers`; the probe
    side is 5 users × {d} rows and joins the ({d}·{w})-row register
    table — both sides broadcastable; the heavy-key selection itself
    is a TakeOrdered over the per-user rollup (in production the
    probe keys come from the application, not a rollup)."""
    ev = load_table(spark, sf_dir, "events")
    depths = F.array(*[F.lit(i) for i in range(CMS_DEPTH)])
    reg = cms_register_table(ev)
    # NULL keys excluded like the register build — and the NULLS-
    # FIRST/LAST default differs between engines, so a NULL group in
    # the top-5 tie-break would diverge anyway.
    exact = (ev.where(F.col("user_id").isNotNull())
             .groupBy("user_id")
             .agg(F.count(F.lit(1)).alias("exact_n"))
             .orderBy(F.col("exact_n").desc(), "user_id").limit(5))
    probe = (exact.withColumn("depth", F.explode(depths))
             .withColumn("bucket", F.conv(
                 F.substring(F.md5(F.concat_ws(
                     ":", F.col("user_id").cast("string"), "depth")), 1, 2),
                 16, 10).cast("long")))
    return (probe.join(reg, ["depth", "bucket"])
            .groupBy("user_id", "exact_n")
            .agg(F.min("total").alias("cms_est"),
                 (F.min("total") - F.col("exact_n")).alias("overestimate")))


for _f in (sk_cms_registers, sk_cms_point_queries):
    _f.__doc__ = _f.__doc__.format(d=CMS_DEPTH, w=CMS_WIDTH,
                                   dw=CMS_DEPTH * CMS_WIDTH)


# --------------------------------------------------------------------------
# Bottom-k quantile sketch (uniform-hash sample → value-at-rank)
# --------------------------------------------------------------------------

BOTTOMK_K = 256  # sample size: rows with the k smallest md5(event_id)


@query(
    "sk_bottomk_quantiles",
    oracle=f"""
WITH s AS (
  SELECT CAST(round(value * 100, 0) AS BIGINT) AS cents
  FROM events
  WHERE value IS NOT NULL
  ORDER BY md5(CAST(event_id AS VARCHAR)) LIMIT {BOTTOMK_K}
), a AS (
  SELECT list_sort(list(cents)) AS v, CAST(COUNT(*) AS BIGINT) AS k FROM s
)
SELECT k,
       CAST(v[1 + (k - 1) // 2] AS BIGINT) AS p50_cents,
       CAST(v[1 + ((k - 1) * 9) // 10] AS BIGINT) AS p90_cents,
       CAST(v[1 + ((k - 1) * 99) // 100] AS BIGINT) AS p99_cents
FROM a
""",
)
def sk_bottomk_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate p50/p90/p99 of event value from a bottom-k-by-hash
    sample — the QUANTILE sketch beside the cardinality (HLL/KMV) and
    frequency (CMS) families.  The k rows with the smallest
    md5(event_id) are a uniform random sample that every partition
    can compute locally and any two sketches can MERGE (union, keep
    the k smallest) — the property GK/KLL sketches exist for, in its
    simplest exact-deterministic form, so the oracle reproduces the
    sample BIT FOR BIT instead of accepting a tolerance band.

    Physical plan: per-partition top-k on the hash
    (TakeOrderedAndProject — no global sort, no full shuffle; each
    partition forwards at most k rows), then exact value-at-rank
    inside the k-row sample via one bounded sorted array.  At 100 TB
    the driver-side cost is fixed at k rows forever; accuracy is the
    standard ±O(1/sqrt(k)) quantile-rank error of a uniform sample.
    `w5_length_quantiles` is the EXACT full-data counterpart (one
    sort exchange over everything) — this is the one you run on the
    whole corpus when that sort is the bottleneck."""
    ev = load_table(spark, sf_dir, "events")
    # NULL values are excluded from the sketch on BOTH sides:
    # collect_list silently skips NULLs while count(*) counts them, so
    # a NULL-valued event would desync k from |v| and push the rank
    # selector past the array's end (found by the events edge corpus).
    sample = (ev.where(F.col("value").isNotNull())
        .select(
            F.md5(F.col("event_id").cast("string")).alias("hx"),
            F.round(F.col("value") * 100, 0).cast("long").alias("cents"))
        .orderBy("hx").limit(BOTTOMK_K))
    a = sample.agg(F.sort_array(F.collect_list("cents")).alias("v"),
                   F.count(F.lit(1)).alias("k"))
    at = lambda num, den: F.try_element_at(  # noqa: E731 — rank selector;
        # greatest(..., 1): k=0 makes every rank expression 0 (int
        # truncation of 1 - num/den), and Spark's try_element_at
        # REJECTS index 0 outright (INVALID_INDEX_OF_ZERO) instead of
        # returning NULL — clamp to 1, where try_ on the empty array
        # gives the NULL the oracle's v[0]-on-NULL-list produces.
        "v", F.greatest(
            (F.lit(1) + ((F.col("k") - 1) * num) / den).cast("int"),
            F.lit(1)))
    return a.select(
        "k",
        at(1, 2).alias("p50_cents"),
        at(9, 10).alias("p90_cents"),
        at(99, 100).alias("p99_cents"))


# --------------------------------------------------------------------------
# KMV set algebra — union / intersection estimates from mergeable sketches
# --------------------------------------------------------------------------

@query(
    "sk_kmv_set_ops",
    oracle=f"""
WITH m AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS in_a,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS in_b
  FROM events
  WHERE event_type IN ('click', 'purchase')
  GROUP BY 1
), h AS (
  SELECT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 14)) AS BIGINT)
           AS hv,
         in_a, in_b
  FROM m
), bot AS (
  SELECT hv, in_a, in_b, ROW_NUMBER() OVER (ORDER BY hv) AS rn FROM h
), kth AS (
  SELECT hv AS kth_hash FROM bot WHERE rn = {KMV_K}
), agg AS (
  SELECT CAST(SUM(in_a * in_b) AS BIGINT) AS n_common
  FROM bot WHERE rn <= {KMV_K}
), exact AS (
  SELECT CAST(SUM(in_a * in_b) AS BIGINT) AS exact_inter,
         CAST(COUNT(*) AS BIGINT) AS exact_union
  FROM m
)
SELECT kth_hash,
       ({KMV_K} - 1) * (1::BIGINT << 56) // kth_hash AS union_est,
       n_common,
       n_common * (({KMV_K} - 1) * (1::BIGINT << 56) // kth_hash)
         // {KMV_K} AS inter_est,
       n_common * 1000000 // {KMV_K} AS jaccard_e6,
       exact_union, exact_inter
FROM kth, agg, exact
""",
)
def sk_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV sketch SET ALGEBRA: estimate |A ∪ B|, |A ∩ B| and the
    Jaccard similarity of two user populations (clickers vs
    purchasers) from one merged bottom-k sketch — the mergeability
    property that makes KMV/theta sketches the cross-dataset overlap
    tool (audience overlap, corpus contamination, A/B exposure
    leakage) at 100 TB: each side's sketch is k numbers, so set
    expressions over N datasets combine k·N values, never the sets.

    Math (Beyer et al., SIGMOD 2007): the k smallest distinct hashes
    of A ∪ B give union_est = (k−1)·2^56 / h_k; of those k "minimal
    witnesses", the fraction present in BOTH sides estimates Jaccard,
    and inter_est = that fraction × union_est.  All arithmetic is
    integer floor division on 56-bit md5 prefixes — both engines
    replay it bit-identically — and the EXACT union/intersection
    ride along so the sketch error is itself oracle-checked.

    Spark-first: one exchange on user_id builds per-user membership
    flags with map-side partial max; the bottom-k is
    `orderBy(hv).limit(k)` — Catalyst's TakeOrdered, a per-partition
    top-k merged on the driver, k rows forever; the three scalar
    aggregates over k rows are a single tiny job.  Nothing but the
    first exchange ever touches raw event volume."""
    e = load_table(spark, sf_dir, "events")
    m = (e.where(F.col("event_type").isin("click", "purchase"))
         .groupBy("user_id")
         .agg(F.max(F.when(F.col("event_type") == "click", 1)
                    .otherwise(0)).alias("in_a"),
              F.max(F.when(F.col("event_type") == "purchase", 1)
                    .otherwise(0)).alias("in_b")))
    h = m.select(_hex_long(F.col("user_id").cast("string"), 1, 14).alias("hv"),
                 "in_a", "in_b")
    # TakeOrdered bottom-k first (scale path): within the ≤k
    # candidate rows, max(hv) IS the k-th smallest hash — but only
    # when exactly k rows exist; with fewer distinct users there is
    # no k-th hash and the sketch is undefined — emit zero rows,
    # exactly like the oracle's `rn = K` CTE (small/filtered inputs
    # must not silently use the wrong-k estimator formula).  A plain
    # aggregate, not a row_number window: same result, no
    # single-partition WindowExec.
    bot = h.orderBy("hv").limit(KMV_K)
    sk = (bot.agg(F.max("hv").alias("kth_hash"),
                  F.count(F.lit(1)).alias("n_seen"),
                  F.sum(F.col("in_a") * F.col("in_b")).cast("long")
                   .alias("n_common"))
          .where(F.col("n_seen") == KMV_K).drop("n_seen"))
    exact = m.agg(F.sum(F.col("in_a") * F.col("in_b")).cast("long")
                  .alias("exact_inter"),
                  F.count(F.lit(1)).alias("exact_union"))
    est = F.expr(f"({KMV_K} - 1) * shiftleft(1L, 56) div kth_hash")
    return (sk.crossJoin(exact)
            .select("kth_hash",
                    est.alias("union_est"),
                    "n_common",
                    F.expr(f"n_common * (({KMV_K} - 1) * shiftleft(1L, 56)"
                           f" div kth_hash) div {KMV_K}").alias("inter_est"),
                    F.expr(f"n_common * 1000000 div {KMV_K}")
                     .alias("jaccard_e6"),
                    "exact_union", "exact_inter"))
