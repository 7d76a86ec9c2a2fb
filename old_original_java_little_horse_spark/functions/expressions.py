"""Scalar / expression operators (SURVEY.md §2.8).

Re-expresses the reference's comparison enum
(`LHComparisonEnum.java:3-12`, eval `ThreadRun.java:487-503`,
`Mutation.java:314-344`), variable-mutation operations
(`VariableMutationOperation.java:3-13`, `Mutation.java:56-106`),
JSONPath value sources (`LHUtil.java:178-188`), type coercions
(`Mutation.java:108-199`) and string utilities (`LHUtil.java:42-77`)
as JVM-side Catalyst expressions — no Python UDFs anywhere in this
module, so every query stays inside whole-stage codegen.

These same builders are reused by the engine fold's *batch oracle*
form; the streaming engine applies the identical semantics in Python
(`engine/fold.py`) — unit tests assert the two agree.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from ..registry import query
from ..sources.parquet import load_table


# --------------------------------------------------------------------------
# Comparison operators — P4 edge conditions (ThreadRun.java:487-503)
# --------------------------------------------------------------------------

def comparator(lhs: Column, op: str, rhs: Column) -> Column:
    """EdgeCondition comparator → Catalyst boolean expression.

    Null semantics follow the reference: a null LHS makes EQUALS and
    NOT_EQUALS both false (`ThreadRun.java:497-498`).
    """
    ops = {
        "LESS_THAN": lambda: lhs < rhs,
        "LESS_THAN_EQ": lambda: lhs <= rhs,
        "GREATER_THAN": lambda: lhs > rhs,
        "GREATER_THAN_EQ": lambda: lhs >= rhs,
        "EQUALS": lambda: lhs.isNotNull() & lhs.eqNullSafe(rhs),
        "NOT_EQUALS": lambda: lhs.isNotNull() & ~lhs.eqNullSafe(rhs),
        "IN": lambda: F.array_contains(rhs, lhs),
        "NOT_IN": lambda: ~F.array_contains(rhs, lhs),
    }
    return ops[op]()


@query(
    "x_comparison_ops",
    oracle="""
SELECT l_orderkey, l_linenumber,
       l_quantity <  25                       AS lt,
       l_quantity <= 25                       AS lte,
       l_quantity >  25                       AS gt,
       l_quantity >= 25                       AS gte,
       l_returnflag = 'R'                     AS eq,
       l_returnflag <> 'R'                    AS neq,
       l_returnflag IN ('A','R')              AS in_set,
       l_returnflag NOT IN ('A','R')          AS not_in_set
FROM lineitem
""",
)
def x_comparison_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All 8 edge-condition comparators evaluated columnar."""
    l = load_table(spark, sf_dir, "lineitem")
    qty, flag = F.col("l_quantity"), F.col("l_returnflag")
    rset = F.array(F.lit("A"), F.lit("R"))
    return l.select(
        "l_orderkey", "l_linenumber",
        comparator(qty, "LESS_THAN", F.lit(25)).alias("lt"),
        comparator(qty, "LESS_THAN_EQ", F.lit(25)).alias("lte"),
        comparator(qty, "GREATER_THAN", F.lit(25)).alias("gt"),
        comparator(qty, "GREATER_THAN_EQ", F.lit(25)).alias("gte"),
        comparator(flag, "EQUALS", F.lit("R")).alias("eq"),
        comparator(flag, "NOT_EQUALS", F.lit("R")).alias("neq"),
        comparator(flag, "IN", rset).alias("in_set"),
        comparator(flag, "NOT_IN", rset).alias("not_in_set"),
    )


# --------------------------------------------------------------------------
# Arithmetic mutations — ADD/SUBTRACT/MULTIPLY/DIVIDE with the reference's
# INT-truncation semantics (Mutation.java:201-279, toInt 127-135)
# --------------------------------------------------------------------------

@query(
    "x_mutation_arith",
    oracle="""
SELECT l_orderkey, l_linenumber,
       l_linenumber + 7                                            AS add_int,
       CAST(ROUND(l_quantity + l_discount, 4) AS DOUBLE)           AS add_float,
       CAST(TRUNC(l_quantity - l_tax) AS BIGINT)                   AS sub_int_trunc,
       CAST(ROUND(l_quantity * 3.0, 4) AS DOUBLE)                  AS mul_float,
       CAST(TRUNC(l_quantity / 7.0) AS BIGINT)                     AS div_int_trunc,
       CASE WHEN l_linenumber - 1 = 0 THEN NULL
            ELSE CAST(ROUND(l_quantity / (l_linenumber - 1), 4) AS DOUBLE)
       END                                                         AS div_guarded
FROM lineitem
""",
)
def x_mutation_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADD / SUBTRACT / MULTIPLY / DIVIDE on INT and FLOAT variables.

    INT-typed results truncate toward zero like the reference's
    Double→int coercion (`Mutation.java:127-135` via `longValue()`);
    Spark's CAST(double AS BIGINT) truncates natively, the oracle
    spells it TRUNC().  Divide-by-zero → error in the reference
    (`Mutation.java:253-263`); the guarded form turns it into NULL —
    the engine fold maps that to a FAILED thread.
    """
    l = load_table(spark, sf_dir, "lineitem")
    qty, tax, disc, ln = F.col("l_quantity"), F.col("l_tax"), F.col("l_discount"), F.col("l_linenumber")
    return l.select(
        "l_orderkey", "l_linenumber",
        (ln + F.lit(7)).alias("add_int"),
        F.round(qty + disc, 4).cast("double").alias("add_float"),
        (qty - tax).cast("bigint").alias("sub_int_trunc"),
        F.round(qty * F.lit(3.0), 4).cast("double").alias("mul_float"),
        (qty / F.lit(7.0)).cast("bigint").alias("div_int_trunc"),
        F.when(ln - 1 == 0, F.lit(None).cast("double"))
        .otherwise(F.round(qty / (ln - 1), 4).cast("double"))
        .alias("div_guarded"),
    )


# --------------------------------------------------------------------------
# String mutations + identity helpers — ADD-as-concat (Mutation.java:212-216),
# k8s slug (LHUtil.java:53-67), digest (LHUtil.java:69-77)
# --------------------------------------------------------------------------

def k8s_slug(c: Column) -> Column:
    """LHUtil.toValidK8sName: lowercase, separators→'-', strip other
    non-alphanumerics, collapse dashes, trim, cap at 54 chars.

    Simplification vs the reference: LHUtil appends '-' + digest8
    when the slug reaches 63 chars (LHUtil.java:63-65); this SQL twin
    plain-caps at 54 because no harness input reaches 63 (p_name is
    ≤50 chars) and the oracle mirrors the cap exactly.  The deployer-
    side `engine.k8s_deployer.k8s_name` implements the full digest
    rule — use that wherever a real K8s name is emitted."""
    s = F.lower(c)
    s = F.regexp_replace(s, r"[. _\n]", "-")
    s = F.regexp_replace(s, r"[^0-9a-z-]", "")
    s = F.regexp_replace(s, r"-+", "-")
    s = F.regexp_replace(s, r"^-|-$", "")
    return F.substring(s, 1, 54)


@query(
    "x_mutation_string",
    oracle="""
SELECT p_partkey,
       p_name || '::' || p_brand                                   AS concat_add,
       substr(
         trim(BOTH '-' FROM
           regexp_replace(
             regexp_replace(
               regexp_replace(lower(p_name), '[. _\n]', '-', 'g'),
               '[^0-9a-z-]', '', 'g'),
             '-+', '-', 'g')),
         1, 54)                                                    AS slug,
       substr(md5(p_name), 1, 8)                                   AS digest8,
       upper(p_type)                                               AS upper_type,
       length(p_name)                                              AS name_len
FROM part
""",
)
def x_mutation_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String ADD (concat), k8s-name slug chain, 8-char digest."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.concat(F.col("p_name"), F.lit("::"), F.col("p_brand")).alias("concat_add"),
        k8s_slug(F.col("p_name")).alias("slug"),
        F.substring(F.md5(F.col("p_name")), 1, 8).alias("digest8"),
        F.upper("p_type").alias("upper_type"),
        F.length("p_name").alias("name_len"),
    )


# --------------------------------------------------------------------------
# Array mutations — ADD-append / EXTEND / REMOVE_IF_PRESENT / REMOVE_INDEX
# (Mutation.java:218-231, 233-251, 281-286, 295-300)
# --------------------------------------------------------------------------

@query(
    "x_mutation_array",
    oracle="""
WITH t AS (
  SELECT p_partkey, regexp_split_to_array(p_name, ' ') AS words FROM part
)
SELECT p_partkey,
       array_to_string(list_append(words, 'tail'), ',')                     AS add_append,
       array_to_string(list_concat(words, ['x','y']), ',')                  AS extend,
       array_to_string(list_filter(words, w -> w <> 'green'), ',')          AS remove_if_present,
       array_to_string(words[2:], ',')                                      AS remove_index_0,
       len(words)                                                           AS arr_len,
       list_contains(words, 'green')                                        AS had_green
FROM t
""",
)
def x_mutation_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-typed variable mutations as higher-order functions.

    All JVM-side (`array_append`/`concat`/`filter`/`slice`) — the hot
    path never leaves codegen.  REMOVE_INDEX(0) = slice from 2.
    """
    p = load_table(spark, sf_dir, "part")
    words = F.split(F.col("p_name"), " ")
    return p.select(
        "p_partkey",
        F.concat_ws(",", F.array_append(words, F.lit("tail"))).alias("add_append"),
        F.concat_ws(",", F.concat(words, F.array(F.lit("x"), F.lit("y")))).alias("extend"),
        F.concat_ws(",", F.filter(words, lambda w: w != F.lit("green"))).alias("remove_if_present"),
        F.concat_ws(",", F.slice(words, 2, F.greatest(F.size(words) - 1, F.lit(0)))).alias("remove_index_0"),
        F.size(words).alias("arr_len"),
        F.array_contains(words, "green").alias("had_green"),
    )


# --------------------------------------------------------------------------
# REMOVE_KEY on OBJECT variables (Mutation.java:288-293) via map_filter
# --------------------------------------------------------------------------

@query(
    "x_mutation_remove_key",
    oracle="""
SELECT doc_id,
       '{"source":"' || source || '","n_chars":' || n_chars || '}' AS obj_after_remove
FROM documents
""",
)
def x_mutation_remove_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REMOVE_KEY('lang') from an OBJECT variable.

    Spark side genuinely removes the key from a map column with
    `map_filter`; the oracle just states the expected JSON.  Key order
    is pinned by construction so the JSON strings compare equal.
    """
    d = load_table(spark, sf_dir, "documents")
    obj = F.create_map(
        F.lit("lang"), F.col("lang").cast("string"),
        F.lit("source"), F.col("source").cast("string"),
        F.lit("n_chars"), F.col("n_chars").cast("string"),
    )
    after = F.map_filter(obj, lambda k, _: k != F.lit("lang"))
    # Render deterministically: source is a string field, n_chars numeric.
    return d.select(
        "doc_id",
        F.concat(
            F.lit('{"source":"'), F.element_at(after, "source"),
            F.lit('","n_chars":'), F.element_at(after, "n_chars"), F.lit("}"),
        ).alias("obj_after_remove"),
    )


# --------------------------------------------------------------------------
# JSONPath value sources (LHUtil.java:178-188; VariableAssignment eval
# ThreadRun.java:174-228) — get_json_object + defaults via coalesce
# --------------------------------------------------------------------------

@query(
    "x_jsonpath",
    oracle="""
WITH kx AS (
  SELECT event_id,
         CASE WHEN json_valid(props) THEN
           trim(json_extract_string(props, '$.k'),
                ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12))
         END AS k_raw,
         CASE WHEN json_valid(props) THEN
           trim(json_extract_string(props, '$.missing'),
                ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12))
         END AS m_raw
  FROM events
), kv AS (
  SELECT event_id,
         CASE WHEN regexp_matches(k_raw, '^[+-]?[0-9]+$')
              THEN TRY_CAST(k_raw AS BIGINT) END AS k_value,
         CASE WHEN regexp_matches(m_raw, '^[+-]?[0-9]+$')
              THEN TRY_CAST(m_raw AS BIGINT) END AS m_value
  FROM kx
)
SELECT event_id, k_value,
       CASE WHEN k_value IS NOT NULL THEN
         TRY_CAST(json_extract_string(
           '{"run":{"meta":{"k":' || CAST(k_value AS VARCHAR) || '}}}',
           '$.run.meta.k') AS BIGINT)
       END AS nested_k,
       COALESCE(m_value, -1) AS with_default
FROM kv
""",
)
def x_jsonpath(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONPath reads with defaultValue fallback (coalesce).

    `get_json_object` covers the `$.a.b` subset the harness uses; the
    engine fold falls back to a Python JSONPath walker for exotic
    paths (slices, filters) inside `applyInPandas`.

    MALFORMED data is a contained NULL, never a crash or a divergence
    (r12 hostile-props corpus): `try_cast` instead of `cast` — under
    Spark 4's default ANSI mode a bare cast of a non-numeric
    extraction ('{"k": "abc"}') THROWS, killing the query on one bad
    event.  The oracle mirrors Spark's exact semantics, which differ
    from DuckDB's defaults in three ways it must neutralize:
    (1) DuckDB's `json_extract` ERRORS on malformed JSON text where
    `get_json_object` returns NULL → guard with `json_valid`;
    (2) DuckDB TRY_CASTs '1.5' to 2 (rounds) where Spark's
    string→BIGINT grammar yields NULL → integral-string regex gate;
    (3) DuckDB casts JSON true to 1 where Spark stringifies to
    'true' → NULL — the same regex gate covers it;
    (4) Spark's try_cast string→BIGINT trims ALL whitespace/control
    chars where DuckDB's bare trim() strips spaces only → the oracle
    trims with the explicit ' \\t\\n\\r\\v\\f' set (ADVICE r12; the
    tab/newline-padded corpus values pin it).
    """
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").try_cast("bigint")
    nested = F.concat(F.lit('{"run":{"meta":{"k":'), k.cast("string"), F.lit("}}}"))
    return e.select(
        "event_id",
        k.alias("k_value"),
        F.get_json_object(nested, "$.run.meta.k").try_cast("bigint")
        .alias("nested_k"),
        F.coalesce(
            F.get_json_object(F.col("props"), "$.missing")
            .try_cast("bigint"), F.lit(-1)
        ).alias("with_default"),
    )


# --------------------------------------------------------------------------
# Type-coercion suite (Mutation.java:108-199)
# --------------------------------------------------------------------------

@query(
    "x_type_coercion",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(CAST(l_linenumber AS VARCHAR) AS BIGINT)      AS str_to_int,
       CAST(TRUNC(l_quantity) AS BIGINT)                  AS double_to_int_trunc,
       CAST(l_linenumber AS DOUBLE)                       AS int_to_double,
       CAST(l_quantity AS VARCHAR)                        AS to_str,
       CAST('true' AS BOOLEAN)                            AS str_to_bool,
       l_linenumber <> 0                                  AS int_to_bool
FROM lineitem
""",
)
def x_type_coercion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """toInt/toDouble/toBool/toStr coercions.

    String "5"→5 matches Spark CAST; Double→int truncates (the
    reference's `longValue()`); the oracle uses TRUNC because DuckDB
    CAST rounds instead.
    """
    l = load_table(spark, sf_dir, "lineitem")
    qty, ln = F.col("l_quantity"), F.col("l_linenumber")
    return l.select(
        "l_orderkey", "l_linenumber",
        ln.cast("string").cast("bigint").alias("str_to_int"),
        qty.cast("bigint").alias("double_to_int_trunc"),
        ln.cast("double").alias("int_to_double"),
        qty.cast("string").alias("to_str"),
        F.lit("true").cast("boolean").alias("str_to_bool"),
        (ln != 0).alias("int_to_bool"),
    )


# --------------------------------------------------------------------------
# Template substitution — <<varname>> replacement (BashExecutor.java:39-67,
# pattern Constants.java:40-42) as a deterministic string scalar
# --------------------------------------------------------------------------

@query(
    "x_template_substitution",
    oracle="""
SELECT doc_id,
       replace(replace('run --lang=<<lang>> --source=<<source>>',
                       '<<lang>>', lang),
               '<<source>>', source) AS argv
FROM documents
""",
)
def x_template_substitution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Worker argv template substitution: `<<varname>>` → value."""
    d = load_table(spark, sf_dir, "documents")
    tpl = F.lit("run --lang=<<lang>> --source=<<source>>")
    out = F.replace(tpl, F.lit("<<lang>>"), F.col("lang"))
    out = F.replace(out, F.lit("<<source>>"), F.col("source"))
    return d.select("doc_id", out.alias("argv"))
