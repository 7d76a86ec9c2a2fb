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
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return str(int(v)) + ".0"
        return repr(v)
    if isinstance(v, Decimal):
        return _norm(float(v))
    return str(v)


def row_multiset(rows, colnames) -> Counter:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return Counter(tuple(_norm(r[i]) for i in order) for r in rows)


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
    result["ok"] = result["cols_match"] and result["count_match"] and result["values_match"]
    return result
