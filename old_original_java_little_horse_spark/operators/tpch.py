"""TPC-H completion: q7-q12 and q15 — the seven plan shapes the
registry did not yet carry.  With these, all 22 TPC-H queries have an
oracle-checked twin on this schema.

Adaptation notes (this synthetic schema has no partsupp table and no
l_shipmode / l_commitdate / l_receiptdate columns — each adapted query
keeps the SHAPE the original exists to exercise and documents the
substitution):

- q7  volume shipping            — verbatim shape (nation-pair flows).
- q8  market share               — verbatim shape (share-of-total by year).
- q9  product-type profit        — partsupp.ps_supplycost →
                                   part.p_retailprice as the unit cost.
- q10 returned-item reporting    — verbatim shape (top-20 revenue loss).
- q11 important stock            — partsupp value → lineitem revenue by
                                   part for one region's suppliers;
                                   keeps the HAVING-vs-scalar-subquery
                                   shape that defines Q11.
- q12 shipping modes             — l_shipmode/receipt-lateness →
                                   ship-delay buckets (shipdate −
                                   orderdate); keeps the two-way
                                   CASE-count rollup over the
                                   fact ⋈ orders join.
- q15 top supplier               — verbatim shape (aggregate view ⋈
                                   its own MAX).

Money math is exact-integer end to end (cents, and e4 = cents ×
(100 − discount%)) so the DuckDB hash gate is drift-free; the one
float that appears (day bucketing in q12) is an integer-valued double
on both engines before the floor.

Reference parity: these are headline analytics plans in the spirit of
SURVEY.md §2.5-§2.7 (rollups, ordered top-N, set/semi logic) — the
same physical shapes (scan→partial-agg→exchange→final-agg, broadcast
dim joins, decorrelated scalar subqueries) the engine's own queries
compile to.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..registry import query
from ..sources.parquet import load_table

# Exact revenue in e4 units: cents x (100 - discount%).
_REV_E4_SQL = """(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                  * (100 - CAST(round(l_discount * 100, 0) AS BIGINT)))"""


def _rev_e4() -> F.Column:
    return (F.round(F.col("l_extendedprice") * 100, 0).cast("long")
            * (F.lit(100) - F.round(F.col("l_discount") * 100, 0).cast("long")))


# --------------------------------------------------------------------------
# Q7: nation-pair trade volume by year
# --------------------------------------------------------------------------

@query(
    "q7_volume_shipping",
    oracle=f"""
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(rev) AS BIGINT) AS rev_e4,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
         {_REV_E4_SQL} AS rev
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON n1.n_nationkey = s_nationkey
  JOIN nation n2 ON n2.n_nationkey = c_nationkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
)
GROUP BY supp_nation, cust_nation, l_year
""",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: revenue shipped between two nations, per direction
    and year — the multi-hop star join (fact → supplier-dim one way,
    fact → orders → customer-dim the other) with a symmetric
    pair predicate.

    Scale shape: the nation filter is applied INSIDE each dim branch
    (supplier and customer each shrink to 2/25 of their rows before
    any fact row moves), so the pair predicate costs nothing at the
    fact scan and the surviving supplier side BROADCASTS.  The fact
    exchanges once on l_orderkey to meet orders; customer arrives on
    o_custkey — at this SF Spark broadcasts the filtered customer
    branch too, and at 100 TB AQE would decide between broadcast and
    shuffle from the observed post-filter size.  The final rollup is
    4 x 2 rows: partial-agg collapses it map-side."""
    pair = ("NATION_1", "NATION_2")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n_pair = n.where(F.col("n_name").isin(*pair))
    s = (load_table(spark, sf_dir, "supplier")
         .select("s_suppkey", "s_nationkey")
         .join(F.broadcast(n_pair), F.col("s_nationkey") == F.col("n_nationkey"))
         .select("s_suppkey", F.col("n_name").alias("supp_nation")))
    c = (load_table(spark, sf_dir, "customer")
         .select("c_custkey", "c_nationkey")
         .join(F.broadcast(n_pair), F.col("c_nationkey") == F.col("n_nationkey"))
         .select("c_custkey", F.col("n_name").alias("cust_nation")))
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = (load_table(spark, sf_dir, "lineitem")
          .where((F.col("l_shipdate") >= "1996-01-01")
                 & (F.col("l_shipdate") < "1998-01-01"))
          .select("l_suppkey", "l_orderkey",
                  F.year("l_shipdate").cast("long").alias("l_year"),
                  _rev_e4().alias("rev")))
    a, b = pair
    return (li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
            .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .join(c, F.col("o_custkey") == F.col("c_custkey"))
            .where(((F.col("supp_nation") == a) & (F.col("cust_nation") == b))
                   | ((F.col("supp_nation") == b) & (F.col("cust_nation") == a)))
            .groupBy("supp_nation", "cust_nation", "l_year")
            .agg(F.sum("rev").alias("rev_e4"),
                 F.count(F.lit(1)).alias("n_lines")))


# --------------------------------------------------------------------------
# Q8: market share of one supplier nation within a region
# --------------------------------------------------------------------------

@query(
    "q8_market_share",
    oracle=f"""
SELECT o_year,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_6' THEN rev ELSE 0 END)
            AS BIGINT) AS target_rev_e4,
       CAST(SUM(rev) AS BIGINT) AS total_rev_e4
FROM (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
         sn.n_name AS supp_nation,
         {_REV_E4_SQL} AS rev
  FROM lineitem
  JOIN part     ON p_partkey = l_partkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation cn ON cn.n_nationkey = c_nationkey
  JOIN region    ON r_regionkey = cn.n_regionkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation sn ON sn.n_nationkey = s_nationkey
  WHERE p_type = 'STANDARD' AND r_name = 'AMERICA'
    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
)
GROUP BY o_year
""",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: NATION_6's share of STANDARD-part revenue sold to
    AMERICA customers, by order year — the share-of-total rollup
    (conditional numerator + unconditional denominator in ONE pass,
    never two scans).

    Returned as exact numerator/denominator so the caller's division
    is the only float.  Scale shape: part is pre-filtered to one type
    (1/6) and BROADCASTS, pruning the fact at the probe; the region
    restriction collapses customer⋈nation⋈region into a broadcast
    key-set BEFORE touching orders; supplier⋈nation broadcasts as a
    (suppkey → nation) map.  The only wide exchange is fact⋈orders on
    the order key; the rollup output is one row per year."""
    li = (load_table(spark, sf_dir, "lineitem")
          .select("l_partkey", "l_suppkey", "l_orderkey",
                  _rev_e4().alias("rev")))
    p = (load_table(spark, sf_dir, "part")
         .where(F.col("p_type") == "STANDARD").select("p_partkey"))
    o = (load_table(spark, sf_dir, "orders")
         .where((F.col("o_orderdate") >= "1996-01-01")
                & (F.col("o_orderdate") < "1998-01-01"))
         .select("o_orderkey", "o_custkey",
                 F.year("o_orderdate").cast("long").alias("o_year")))
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey")
    r = (load_table(spark, sf_dir, "region")
         .where(F.col("r_name") == "AMERICA").select("r_regionkey"))
    c = (load_table(spark, sf_dir, "customer")
         .select("c_custkey", "c_nationkey")
         .join(F.broadcast(n.join(F.broadcast(r),
                                  F.col("n_regionkey") == F.col("r_regionkey"))
                           .select("n_nationkey")),
               F.col("c_nationkey") == F.col("n_nationkey"))
         .select("c_custkey"))
    s = (load_table(spark, sf_dir, "supplier")
         .select("s_suppkey", "s_nationkey")
         .join(F.broadcast(n.select("n_nationkey", "n_name")),
               F.col("s_nationkey") == F.col("n_nationkey"))
         .select("s_suppkey", F.col("n_name").alias("supp_nation")))
    return (li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
            .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .join(c, F.col("o_custkey") == F.col("c_custkey"))
            .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
            .groupBy("o_year")
            .agg(F.sum(F.when(F.col("supp_nation") == "NATION_6",
                              F.col("rev")).otherwise(F.lit(0)))
                 .alias("target_rev_e4"),
                 F.sum("rev").alias("total_rev_e4")))


# --------------------------------------------------------------------------
# Q9: product profit by supplier nation and year (cost = retail price)
# --------------------------------------------------------------------------

@query(
    "q9_product_profit",
    oracle=f"""
SELECT supp_nation, o_year,
       CAST(SUM(profit) AS BIGINT) AS profit_e4,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM (
  SELECT n_name AS supp_nation,
         CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
         {_REV_E4_SQL}
           - CAST(round(p_retailprice * 100, 0) AS BIGINT)
             * CAST(round(l_quantity, 0) AS BIGINT) * 100 AS profit
  FROM lineitem
  JOIN part     ON p_partkey = l_partkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation   ON n_nationkey = s_nationkey
  WHERE p_name LIKE '%widget%'
)
GROUP BY supp_nation, o_year
""",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9: profit on 'widget' parts by supplier nation and
    order year.  This schema has no partsupp, so unit cost is
    part.p_retailprice (same join direction and arithmetic shape as
    ps_supplycost; the point of Q9 — a LIKE-filtered dim pruning a
    5-way join, with profit arithmetic spanning columns of THREE
    tables — survives the substitution).

    profit_e4 = cents x (100 − disc%) − retail_cents x qty x 100,
    all BIGINT.  Scale shape: the LIKE filter cannot prune at the
    parquet scan (no leading prefix) but shrinks part to ~1/6 BEFORE
    its broadcast, so the fact probe discards non-widget rows without
    moving them; supplier⋈nation broadcasts; the single wide exchange
    is fact⋈orders on the order key, and the final rollup is
    25 x years rows."""
    li = (load_table(spark, sf_dir, "lineitem")
          .select("l_partkey", "l_suppkey", "l_orderkey",
                  _rev_e4().alias("rev"),
                  F.round(F.col("l_quantity"), 0).cast("long").alias("qty")))
    p = (load_table(spark, sf_dir, "part")
         .where(F.col("p_name").like("%widget%"))
         .select("p_partkey",
                 F.round(F.col("p_retailprice") * 100, 0).cast("long")
                 .alias("retail_cents")))
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").cast("long").alias("o_year"))
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    s = (load_table(spark, sf_dir, "supplier")
         .select("s_suppkey", "s_nationkey")
         .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
         .select("s_suppkey", F.col("n_name").alias("supp_nation")))
    profit = F.col("rev") - F.col("retail_cents") * F.col("qty") * F.lit(100)
    return (li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
            .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
            .select("supp_nation", "o_year", profit.alias("profit"))
            .groupBy("supp_nation", "o_year")
            .agg(F.sum("profit").alias("profit_e4"),
                 F.count(F.lit(1)).alias("n_lines")))


# --------------------------------------------------------------------------
# Q10: top customers by returned-item revenue (ordered top-N over a join)
# --------------------------------------------------------------------------

@query(
    "q10_returned_items",
    oracle=f"""
SELECT c_custkey, c_name, n_name,
       CAST(round(c_acctbal * 100, 0) AS BIGINT) AS acctbal_cents,
       CAST(SUM({_REV_E4_SQL}) AS BIGINT) AS rev_e4
FROM lineitem
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation   ON n_nationkey = c_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
GROUP BY c_custkey, c_name, n_name, acctbal_cents
ORDER BY rev_e4 DESC, c_custkey
LIMIT 20
""",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: the 20 customers who returned the most revenue in
    one quarter — grouped rollup over a 4-way join, finished by an
    ordered top-N (ties broken by the unique customer key so the
    LIMIT is deterministic under the hash gate).

    Scale shape: the quarter filter prunes orders AT THE SCAN to
    ~1/20 and the returnflag filter prunes the fact the same way, so
    the fact⋈orders exchange moves only surviving rows; customer
    attaches on its key (AQE picks broadcast vs shuffle from the
    filtered size) and nation broadcasts.  The ordered LIMIT compiles
    to TakeOrderedAndProject — per-partition top-20 heaps, single
    driver merge of 20 x partitions rows, never a global sort."""
    li = (load_table(spark, sf_dir, "lineitem")
          .where(F.col("l_returnflag") == "R")
          .select("l_orderkey", _rev_e4().alias("rev")))
    o = (load_table(spark, sf_dir, "orders")
         .where((F.col("o_orderdate") >= "1997-01-01")
                & (F.col("o_orderdate") < "1997-04-01"))
         .select("o_orderkey", "o_custkey"))
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey",
        F.round(F.col("c_acctbal") * 100, 0).cast("long")
        .alias("acctbal_cents"))
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .join(c, F.col("o_custkey") == F.col("c_custkey"))
            .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
            .groupBy("c_custkey", "c_name", "n_name", "acctbal_cents")
            .agg(F.sum("rev").alias("rev_e4"))
            .orderBy(F.col("rev_e4").desc(), F.col("c_custkey"))
            .limit(20))


# --------------------------------------------------------------------------
# Q11: parts carrying an outsized share of one region's revenue
# (HAVING against a scalar subquery over the same aggregate)
# --------------------------------------------------------------------------

@query(
    "q11_important_parts",
    oracle="""
WITH v AS (
  SELECT l_partkey,
         CAST(SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
              AS BIGINT) AS value_cents
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation   ON n_nationkey = s_nationkey
  JOIN region   ON r_regionkey = n_regionkey
  WHERE r_name = 'EUROPE'
  GROUP BY l_partkey
)
SELECT l_partkey, value_cents
FROM v
WHERE value_cents * 1000 > (SELECT CAST(SUM(value_cents) AS BIGINT) FROM v)
""",
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11: parts whose revenue from EUROPE-based suppliers
    exceeds 1/1000 of that region's total — the HAVING-vs-scalar-
    subquery shape (a group rollup filtered against an aggregate of
    ITSELF).  This schema has no partsupp, so 'stock value' is
    lineitem revenue by part; the defining double-aggregate
    decorrelation is unchanged.

    The threshold compare is exact-integer (value x 1000 > total) so
    no float epsilon can flip a boundary part.  Scale shape: the
    region restriction collapses supplier⋈nation⋈region to a
    broadcast key-set (1/5 of suppliers) pruning the fact at the
    probe; ONE exchange on l_partkey builds the per-part rollup, and
    the scalar total reuses that exchange (Catalyst ReusedExchange —
    the per-part subtree is byte-identical on both branches), so the
    'subquery' costs one extra reduce, not a second fact scan; the
    scalar then broadcasts into the filter."""
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey")
    r = (load_table(spark, sf_dir, "region")
         .where(F.col("r_name") == "EUROPE").select("r_regionkey"))
    eu_supp = (load_table(spark, sf_dir, "supplier")
               .select("s_suppkey", "s_nationkey")
               .join(F.broadcast(
                   n.join(F.broadcast(r),
                          F.col("n_regionkey") == F.col("r_regionkey"))
                   .select("n_nationkey")),
                     F.col("s_nationkey") == F.col("n_nationkey"))
               .select("s_suppkey"))
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey",
        F.round(F.col("l_extendedprice") * 100, 0).cast("long")
        .alias("cents"))
    per_part = (li.join(F.broadcast(eu_supp),
                        F.col("l_suppkey") == F.col("s_suppkey"))
                .groupBy("l_partkey")
                .agg(F.sum("cents").alias("value_cents")))
    total = per_part.agg(F.sum("value_cents").alias("total_cents"))
    return (per_part.crossJoin(F.broadcast(total))
            .where(F.col("value_cents") * 1000 > F.col("total_cents"))
            .select("l_partkey", "value_cents"))


# --------------------------------------------------------------------------
# Q12: late-shipment distribution by delay bucket (two-way CASE count)
# --------------------------------------------------------------------------

@query(
    "q12_shipping_delay",
    oracle="""
SELECT delay_bucket,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM (
  SELECT o_orderpriority,
         CAST(floor((epoch(l_shipdate) - epoch(o_orderdate))
                    / 86400.0 / 30.0) AS BIGINT) AS delay_bucket
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
)
GROUP BY delay_bucket
""",
)
def q12_shipping_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12: how many critical- vs normal-priority orders sit in
    each shipping-delay bucket.  This schema has no l_shipmode or
    receipt/commit dates, so the grouping key is the ship delay
    (shipdate − orderdate, 30-day buckets) — the defining shape
    survives intact: a fact ⋈ orders join whose ROLLUP KEY comes from
    one side and whose CASE-counted measure comes from the other.

    The delay is whole seconds of midnight timestamps, so
    seconds/86400 is an integer-valued double on both engines and the
    floor is drift-free.  Scale shape: the ship-year filter prunes
    the fact at the scan; both sides exchange once on the order key
    (neither is broadcastable at 100 TB); the two CASE counts fold in
    the same partial aggregate — one pass, no second join or union."""
    li = (load_table(spark, sf_dir, "lineitem")
          .where((F.col("l_shipdate") >= "1997-01-01")
                 & (F.col("l_shipdate") < "1998-01-01"))
          .select("l_orderkey", "l_shipdate"))
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority")
    delay_bucket = F.floor(
        (F.unix_timestamp("l_shipdate") - F.unix_timestamp("o_orderdate"))
        / F.lit(86400.0) / F.lit(30.0)).cast("long")
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .select(delay_bucket.alias("delay_bucket"), is_high.alias("hi"))
            .groupBy("delay_bucket")
            .agg(F.sum(F.when(F.col("hi"), 1).otherwise(0)).cast("long")
                 .alias("high_line_count"),
                 F.sum(F.when(F.col("hi"), 0).otherwise(1)).cast("long")
                 .alias("low_line_count")))


# --------------------------------------------------------------------------
# Q15: top supplier (aggregate view joined to its own MAX)
# --------------------------------------------------------------------------

@query(
    "q15_top_supplier",
    oracle=f"""
WITH r AS (
  SELECT l_suppkey, CAST(SUM({_REV_E4_SQL}) AS BIGINT) AS total_rev_e4
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    AND l_suppkey IS NOT NULL
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_rev_e4
FROM r JOIN supplier ON s_suppkey = l_suppkey
WHERE total_rev_e4 = (SELECT MAX(total_rev_e4) FROM r)
""",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: the supplier(s) with the maximum revenue in one
    quarter — the aggregate-view-joined-to-its-own-MAX shape (the
    original phrases it as a CREATE VIEW used twice).

    Revenue is the exact e4 integer, so the equality against MAX is
    drift-free and returns ALL tied suppliers (the spec's stated
    tie semantics), not an arbitrary first.  Scale shape: ONE
    exchange on l_suppkey builds the per-supplier rollup from the
    scan-pruned quarter; the MAX branch reuses that exchange
    (identical subtree → ReusedExchange), broadcasts one row, and
    the supplier dim broadcasts onto the ≤handful of survivors.

    The explicit l_suppkey IS NOT NULL (a no-op on this data, and
    mirrored in the oracle) exists to make exchange reuse FIRE: the
    supplier equi-join infers that filter into the main branch's
    scan, and without the same filter in the MAX branch the two
    per-supplier subtrees differ by that one predicate — Spark then
    scans the fact twice.  Plan-pinned in
    test_plans.test_q15_exchange_reused_single_fact_scan."""
    li = (load_table(spark, sf_dir, "lineitem")
          .where((F.col("l_shipdate") >= "1996-01-01")
                 & (F.col("l_shipdate") < "1996-04-01")
                 & F.col("l_suppkey").isNotNull())
          .select("l_suppkey", _rev_e4().alias("rev")))
    per_supp = (li.groupBy("l_suppkey")
                .agg(F.sum("rev").alias("total_rev_e4")))
    best = per_supp.agg(F.max("total_rev_e4").alias("best_rev"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (per_supp.crossJoin(F.broadcast(best))
            .where(F.col("total_rev_e4") == F.col("best_rev"))
            .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
            .select("s_suppkey", "s_name", "total_rev_e4"))
