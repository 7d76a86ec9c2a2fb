"""Adversarial-corpus parity for the orders-table window/rank family.

The generated orders have near-unique (custkey, orderdate, totalprice)
triples, so RANGE frames, rank tie-breaks, and top-1-per-group picks
are never actually contested.  This corpus plants exact ties: several
orders of ONE customer sharing one order instant (RANGE frame must
include all peers), equal totalprice across customers (global rank
ties), a customer whose whole history is one instant, and half-cent
prices.  Every query must still hash-match its DuckDB oracle.
"""
from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

import pytest

from old_original_java_little_horse_spark.registry import all_queries
from old_original_java_little_horse_spark.sources.parquet import TABLES

from .conftest import SF_SMOKE
from .oracle_compare import compare

QUERIES = [
    "w7_rolling_revenue", "a11_rfm_segments", "s4_scd2_dimension",
    "sort_limit_topn", "q2_min_cost_supplier", "q15_top_supplier",
    "q1_pricing_summary", "q3_shipping_priority", "q4_priority_semi",
    "q13_order_distribution", "q18_large_orders", "j8_temporal_join",
    "q22_idle_customers_anti",
]


@pytest.fixture(scope="module")
def edge_sf_dir(spark):
    import pandas as pd

    workdir = Path(tempfile.mkdtemp(prefix="edge-orders-"))
    try:
        for t in TABLES:
            src = Path(SF_SMOKE) / f"{t}.parquet"
            if t != "orders" and src.exists():
                shutil.copy(src, workdir / f"{t}.parquet")
        df = pd.read_parquet(Path(SF_SMOKE) / "orders.parquet")
        df = df.sort_values("o_orderkey").reset_index(drop=True)
        tail = df.index[-12:]
        one_cust = int(df.loc[tail[0], "o_custkey"])
        instant = df.loc[tail[0], "o_orderdate"]
        # Rows 0-4: ONE customer, ONE instant, equal prices — RANGE
        # frames must include every peer; rank ties contested.
        for i in tail[:5]:
            df.loc[i, "o_custkey"] = one_cust
            df.loc[i, "o_orderdate"] = instant
            df.loc[i, "o_totalprice"] = 1000.00
        # Rows 5-8: equal totalprice across DIFFERENT customers
        # (global sort/rank tie), same date.
        for i in tail[5:9]:
            df.loc[i, "o_orderdate"] = instant
            df.loc[i, "o_totalprice"] = 2000.00
        # Rows 9-11: half-cent prices (rounding fenceposts).
        for j, price in zip(tail[9:], (0.005, 99.995, 12345.675)):
            df.loc[j, "o_totalprice"] = price
        # Appended rows (r12): an UNDATED order (NULL o_orderdate — out
        # of the SCD2 changelog contract, see scd2_change_rows; the
        # engines would sort it to opposite ends of the validity
        # order) and a NULL price / NULL priority order (aggregation
        # NULL propagation; a changelog row whose attr is NULL).
        extra = pd.DataFrame([
            dict(o_orderkey=900001, o_custkey=one_cust, o_orderdate=None,
                 o_totalprice=777.77, o_orderpriority="3-MEDIUM"),
            dict(o_orderkey=900002, o_custkey=one_cust, o_orderdate=instant,
                 o_totalprice=None, o_orderpriority=None),
        ]).reindex(columns=list(df.columns))
        df = pd.concat([df, extra], ignore_index=True)
        df["o_orderdate"] = df["o_orderdate"].astype("datetime64[us]")
        df.to_parquet(workdir / "orders.parquet")
        yield str(workdir)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


@pytest.mark.parametrize("name", QUERIES)
def test_orders_edge_parity(spark, edge_sf_dir, name):
    specs = all_queries()
    res = compare(spark, edge_sf_dir, name, specs[name])
    assert res["ok"], res
