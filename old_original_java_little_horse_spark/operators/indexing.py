"""Secondary-index operators (SURVEY.md §2 A1, P3, §3.3 search path).

The reference maintains a posting list per `(aliasKey, aliasValue)`
(`ResourceIndexProcessor.java:41-131`) fed by a per-record alias
projection (`GETable.java:142-149`, `WFRun.java:320-338`) re-keyed
through a repartition topic (`ApiTopologyBuilder.java:62-88`).

Spark-first: the repartition hop *is* the shuffle that
`groupBy(key, value)` inserts; the posting list is an ordered
`collect_list`; search (`GETApi.java:87-183`) is a filter over the
index table joined back to the id store.  At scale the index table
would be a Delta table partitioned by `key` and Z-ordered by `value`
so point lookups prune to one partition.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..registry import query
from ..sources.parquet import load_table


# --------------------------------------------------------------------------
# P3 — alias projection: each record emits its (key, value) index pairs
# (GETable.java:142-149; WFRun.java:320-338 string-valued-variable rule)
# --------------------------------------------------------------------------

@query(
    "p3_alias_projection",
    oracle="""
SELECT doc_id AS object_id, 'lang' AS key, lang AS value FROM documents
UNION ALL
SELECT doc_id AS object_id, 'source' AS key, source AS value FROM documents
""",
)
def p3_alias_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral-view explode of a record's string-valued index pairs.

    The reference filters to `instanceof String` variables
    (`WFRun.java:328-330`); here the string-typed attributes of a
    document are exploded to (object_id, key, value) rows.
    """
    d = load_table(spark, sf_dir, "documents")
    pairs = F.create_map(
        F.lit("lang"), F.col("lang"),
        F.lit("source"), F.col("source"),
    )
    return d.select(
        F.col("doc_id").alias("object_id"), F.explode(pairs).alias("key", "value")
    )


# --------------------------------------------------------------------------
# A1 — index posting-list build (ResourceIndexProcessor.java:41-131)
# --------------------------------------------------------------------------

@query(
    "a1_index_posting",
    oracle="""
SELECT key, value,
       COUNT(*) AS n_entries,
       MIN(object_id) AS first_object_id,
       STRING_AGG(CAST(object_id AS VARCHAR), ',' ORDER BY object_id) AS posting_list
FROM (
  SELECT doc_id AS object_id, 'lang' AS key, lang AS value FROM documents
  UNION ALL
  SELECT doc_id AS object_id, 'source' AS key, source AS value FROM documents
)
GROUP BY key, value
""",
)
def a1_index_posting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Posting list per (key, value), ordered by insertion (object id).

    The reference's repartition-topic hop becomes the shuffle this
    groupBy inserts; `sort_array(collect_list(...))` keeps the
    IndexEntry order contract (`IndexEntry.java:11-18` orders by
    firstOffset — monotone with object_id in this batch parity).
    Scale note: posting lists for hot keys can be huge — at 100 TB the
    list column would be bucketed or length-capped with overflow rows;
    the groupBy itself partial-aggregates map-side.
    """
    pairs = p3_alias_projection(spark, sf_dir)
    return pairs.groupBy("key", "value").agg(
        F.count(F.lit(1)).alias("n_entries"),
        F.min("object_id").alias("first_object_id"),
        F.concat_ws(",", F.sort_array(F.collect_list("object_id")).cast("array<string>")).alias("posting_list"),
    )


# --------------------------------------------------------------------------
# Search: alias lookup → fetch by id (GETApi.java:87-183 + client join)
# --------------------------------------------------------------------------

@query(
    "idx_search_lookup",
    oracle="""
WITH idx AS (
  SELECT doc_id AS object_id, 'lang' AS key, lang AS value FROM documents
)
SELECT d.doc_id, d.lang, d.source, d.n_chars
FROM idx JOIN documents d ON idx.object_id = d.doc_id
WHERE idx.key = 'lang' AND idx.value = 'fr'
""",
)
def idx_search_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`lhctl search lang fr`: index point-lookup then id-store fetch.

    The filter on (key, value) prunes before the join; the matched id
    set is small → broadcast join against the id store.
    """
    d = load_table(spark, sf_dir, "documents")
    idx = p3_alias_projection(spark, sf_dir).where(
        (F.col("key") == "lang") & (F.col("value") == "fr")
    )
    return F.broadcast(idx).join(d, idx.object_id == d.doc_id).select(
        "doc_id", "lang", "source", "n_chars"
    )
