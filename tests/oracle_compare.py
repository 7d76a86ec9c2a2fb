"""Local mirror of the driver's Spark-vs-DuckDB correctness check.

Runs a registered query on Spark and its oracle SQL on DuckDB over
the same parquet tables, then compares row count, column names, and
an order-insensitive value multiset (values normalized to strings the
same way on both sides).
"""

from __future__ import annotations

from collections import Counter
from decimal import Decimal

import duckdb

from old_original_java_little_horse_spark.sources.parquet import TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(v):
    # Deliberately STRICTER than needed: Decimal is normalized scale-
    # preserving (str(Decimal('1.50')) = '1.50', never collapsed
    # through float), so a Spark DECIMAL vs DuckDB HUGEINT/DECIMAL
    # type-surface mismatch fails HERE the way it fails on the
    # driver's hash path — round 5 proved the two harnesses
    # disagreeing is worse than either being wrong.
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return str(int(v)) + ".0"
        return repr(v)
    if isinstance(v, Decimal):
        return str(v)
    return str(v)


def row_multiset(rows, colnames) -> Counter:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return Counter(tuple(_norm(r[i]) for i in order) for r in rows)


# The repo-wide output-type contract.  Round 5's six red driver rows
# were exactly the queries emitting Spark DECIMAL or DuckDB HUGEINT —
# types the driver's hash path serializes differently than here, so
# they are HARD-BANNED with no escape hatch (money/ratio channels are
# *_cents / *_e6 BIGINT fixed-point).  DOUBLE and DATE serialize
# identically on both engines (every green driver row among q1, q3,
# p1, j3, w3, sim_* carries them), but float channels are one
# summation-order drift away from a hash flip — so they are allowed
# only for the frozen pre-round-6 queries below; NEW queries must
# stick to {BIGINT, INTEGER, VARCHAR, BOOLEAN}.
SPARK_ALLOWED_DTYPES = {"bigint", "int", "string", "boolean"}
SPARK_SOFT_DTYPES = {"double", "date"}
SPARK_ALLOWED_TYPES_DOC = sorted(SPARK_ALLOWED_DTYPES)
DUCKDB_ALLOWED_TYPES = {"BIGINT", "INTEGER", "VARCHAR", "BOOLEAN"}
DUCKDB_SOFT_TYPES = {"DOUBLE", "DATE"}

# Frozen: the queries that shipped DOUBLE/DATE columns before round 6
# (all with deterministic float paths — single-value projections or
# order-independent reductions).  Do NOT add to this list.
FLOAT_DATE_WHITELIST = frozenset({
    "q18_large_orders", "agg_rollup_sets", "d_minhash_lsh_pairs",
    "x_type_coercion", "sim_topk_bruteforce", "sim_lsh_bucketed_ann",
    "sim_label_blocked_neardup", "sim_ivf_ann",
    "stream_minhash_incremental", "q1_pricing_summary",
    "q3_shipping_priority", "q5_local_supplier_volume",
    "p1_fanout_filter", "j3_lookup_join", "w3_timer_scan",
    "sort_limit_topn", "d_ngram_jaccard_pairs", "t_quality_score",
    "x_mutation_arith",
})


def spark_type_violations(sdf, name: str = "") -> list:
    allowed = SPARK_ALLOWED_DTYPES | (
        SPARK_SOFT_DTYPES if name in FLOAT_DATE_WHITELIST else set())
    return [f"{c}:{t}" for c, t in sdf.dtypes if t not in allowed]


def oracle_type_violations(con, oracle_sql: str, name: str = "") -> list:
    allowed = DUCKDB_ALLOWED_TYPES | (
        DUCKDB_SOFT_TYPES if name in FLOAT_DATE_WHITELIST else set())
    rows = con.execute(f"DESCRIBE {oracle_sql}").fetchall()
    return [f"{r[0]}:{r[1]}" for r in rows if r[1] not in allowed]


def compare(spark, sf_dir: str, name: str, spec) -> dict:
    sdf = spec.fn(spark, sf_dir)
    srows = sdf.collect()
    scols = sdf.columns

    con = duckdb_conn(sf_dir)
    ocur = con.execute(spec.oracle)
    ocols = [d[0] for d in ocur.description]
    orows = ocur.fetchall()

    result = {
        "name": name,
        "spark_rows": len(srows),
        "oracle_rows": len(orows),
        "cols_match": sorted(scols) == sorted(ocols),
        "spark_cols": sorted(scols),
        "oracle_cols": sorted(ocols),
    }
    result["count_match"] = result["spark_rows"] == result["oracle_rows"]
    result["type_violations"] = (
        spark_type_violations(sdf, name)
        + oracle_type_violations(con, spec.oracle, name))
    if result["cols_match"] and result["count_match"]:
        sm = row_multiset([tuple(r) for r in srows], scols)
        om = row_multiset(orows, ocols)
        result["values_match"] = sm == om
        if not result["values_match"]:
            only_s = list((sm - om).items())[:3]
            only_o = list((om - sm).items())[:3]
            result["diff_sample"] = {"spark_only": only_s, "oracle_only": only_o}
    else:
        result["values_match"] = False
    result["ok"] = (result["cols_match"] and result["count_match"]
                    and result["values_match"]
                    and not result["type_violations"])
    return result
