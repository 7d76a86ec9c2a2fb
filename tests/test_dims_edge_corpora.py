"""Adversarial-corpus parity for the dimension-join TPC-H family
(VERDICT r11 item 5).

The generated supplier/part/customer tables are clean: unique names,
no NULL keys, no contested argmins, no boundary-exact thresholds — so
the dimension queries' tie-breaks, NULL-key joins, and strict-vs-
inclusive comparisons have never actually been contested.  This corpus
plants, on top of sf0.001:

- suppliers with a NULL nation key (drop from every nation join), a
  NULL name (q21's group key), a DUPLICATED name across two suppkeys
  (q21 must merge them), an account balance of exactly 0 / -0.005 /
  NULL (q16's `< 0` exclusion boundary);
- parts named exactly 'red' (q20's LIKE 'red%' boundary), a NULL
  name, a NULL brand, a NULL size, and two parts sharing one
  (brand, size) cell (q16's group must merge their suppliers);
- customers with a NULL nation key / NULL segment (q13/q22 paths);
- an EXACT duplicate EUROPE region row (nation⋈region fanout must
  double the European rollups identically on both engines), a nation
  with a NULL region key, and a SECOND nation named NATION_7 under a
  fresh key (q20 filters by name — both nations' suppliers pass);
- lineitem rows wiring the new dims into each query's edge: a
  contested q2 argmin (two European suppliers at the SAME min
  cost_cents — the suppkey tie-break is now load-bearing), an offer
  whose every line divides by zero quantity (cost_cents NULL — the
  window must order it NULLS LAST like the oracle), a NULL partkey
  group, q20 red-part quantity sums of exactly 100 (excluded — `>`
  is strict) vs 101 (included) vs 100.5-rounds-to-101, and q21
  orders covering sole-fault / both-fault / single-supplier /
  NULL-returnflag / duplicate-name cases.

Every query must still hash-match its DuckDB oracle on this corpus.
"""
from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

import pandas as pd
import pytest

from old_original_java_little_horse_spark.registry import all_queries
from old_original_java_little_horse_spark.sources.parquet import TABLES

from .conftest import SF_SMOKE
from .oracle_compare import compare

# The five VERDICT-named dimension queries plus every other registry
# query that reads supplier/part/customer through a join.
QUERIES = [
    "q2_min_cost_supplier", "q11_important_parts", "q16_supplier_variety",
    "q20_heavy_part_suppliers", "q21_sole_fault_suppliers",
    "q5_local_supplier_volume", "q7_volume_shipping", "q8_market_share",
    "q9_product_profit", "q10_returned_items", "q13_order_distribution",
    "q14_promo_revenue", "q15_top_supplier", "q17_small_quantity_revenue",
    "q19_disjunctive_revenue", "q22_idle_customers_anti",
    "j9_salted_skew_join",
]

# European nations in the generated data: n_regionkey = key % 5, so
# region 3 (EUROPE) holds nations {3, 8, 13, 18, 23}.
_EURO_NATIONS = (3, 8, 13, 18, 23)


def _mk_lineitem_rows():
    """Appended fact rows wiring the edge dims into each query.  Order
    keys 999xx deliberately do NOT exist in orders, so order-joining
    queries drop them identically on both engines."""
    rows = []

    def li(okey, pkey, skey, ln, qty, price, rf="N", ship="1997-06-15"):
        rows.append(dict(
            l_orderkey=okey, l_partkey=pkey, l_suppkey=skey,
            l_linenumber=ln, l_quantity=qty, l_extendedprice=price,
            l_discount=0.05, l_tax=0.03, l_returnflag=rf,
            l_linestatus="O", l_shipdate=pd.Timestamp(ship)))

    # q2: part 1000's offers — supplier 3 (EUROPE) at 1000 cents/unit;
    # supplier 107 (EUROPE) whose ONLY line has quantity 0, so its
    # cost_cents is NULL (x div 0 is NULL on both engines) and the
    # argmin window must put it LAST, not first.
    li(99901, 1000, 3, 1, 10.0, 1000.00)
    li(99901, 1000, 107, 2, 0.0, 50.00)
    # q2: part 1003 — suppliers 107 and 108 (both EUROPE) at the SAME
    # 2000 cents/unit: the rk-1 pick rides on the s_suppkey tie-break.
    li(99902, 1003, 107, 1, 20.0, 400.00)
    li(99902, 1003, 108, 2, 10.0, 200.00)
    # q2/q11: a NULL partkey group from a European supplier (5).
    li(99903, None, 5, 1, 4.0, 20.00)
    # q2: part 1004's only European offer has NULL quantity → a
    # single-offer NULL cost (rk=1 either way; pins NULL propagation).
    li(99903, 1004, 107, 2, None, 10.00)
    # q2/q20: part 1001 (NULL name) from supplier 3.
    li(99904, 1001, 3, 1, 5.0, 25.00)
    # q20: NATION_7 supplier 102 ships exactly 100 units of red part
    # 1000 (60 + 40): `qty > 100` is strict — excluded; supplier 103
    # ships 101 (60 + 41) — included; supplier 104 ships 100.4 of red
    # part 1005 (rounds to 100, excluded) and 100.5 of red part 1002
    # (HALF_UP rounds to 101 on both engines — included).
    li(99905, 1000, 102, 1, 60.0, 600.00)
    li(99905, 1000, 102, 2, 40.0, 400.00)
    li(99906, 1000, 103, 1, 60.0, 600.00)
    li(99906, 1000, 103, 2, 41.0, 410.00)
    li(99907, 1005, 104, 1, 100.4, 1004.00)
    li(99908, 1002, 104, 1, 100.5, 1005.00)
    # q20 via the duplicate-name nation: supplier 109 sits in the
    # SECOND nation named NATION_7 (key 77) and ships 150 units of
    # red part 1000 — it must appear in q20's output.  Supplier 110's
    # nation has a NULL region key, so its line must vanish from
    # every region-joining rollup (q2/q11) but still count where only
    # nation-by-name or no nation is involved.
    li(99917, 1000, 109, 1, 150.0, 1500.00)
    li(99918, 1000, 110, 1, 10.0, 100.00)
    # q16: part 1003 (Brand#77, size 9) shipped by suppliers 104
    # (acctbal exactly 0 — NOT in arrears), 105 (-0.005 — excluded)
    # and 106 (NULL acctbal — NOT excluded); part 1004 (same
    # (brand, size) cell) also by 104, which must count ONCE across
    # the merged cell.
    li(99909, 1003, 104, 1, 1.0, 10.00)
    li(99909, 1003, 105, 2, 1.0, 10.00)
    li(99909, 1003, 106, 3, 1.0, 10.00)
    li(99909, 1004, 104, 4, 1.0, 10.00)
    # q21: order 99910 — suppliers 102 ('R') and 103 ('N'): sole
    # fault, counted under the DUPLICATED name both share; 99911 —
    # both 'R': excluded; 99912 — single supplier 'R': excluded;
    # 99913 — NULL-named supplier 101 is the sole fault: a NULL
    # group-key row; 99914 — one supplier twice: n_supp=1, excluded;
    # 99916 — 'R' + NULL returnflag from another supplier: the NULL
    # flag must not count as a second fault.
    li(99910, 1000, 102, 1, 1.0, 10.00, rf="R")
    li(99910, 1000, 103, 2, 1.0, 10.00, rf="N")
    li(99911, 1000, 102, 1, 1.0, 10.00, rf="R")
    li(99911, 1000, 103, 2, 1.0, 10.00, rf="R")
    li(99912, 1000, 104, 1, 1.0, 10.00, rf="R")
    li(99913, 1000, 101, 1, 1.0, 10.00, rf="R")
    li(99913, 1000, 3, 2, 1.0, 10.00, rf="N")
    li(99914, 1000, 101, 1, 1.0, 10.00, rf="R")
    li(99914, 1003, 101, 2, 1.0, 10.00, rf="N")
    li(99916, 1000, 3, 1, 1.0, 10.00, rf="R")
    li(99916, 1000, 5, 2, 1.0, 10.00, rf=None)
    # An exact duplicate row (same orderkey/linenumber twice): PK
    # violations must change COUNTs identically, never dedup.
    li(99915, 1003, 104, 1, 2.0, 20.00)
    li(99915, 1003, 104, 1, 2.0, 20.00)
    return rows


@pytest.fixture(scope="module")
def edge_sf_dir(spark):
    workdir = Path(tempfile.mkdtemp(prefix="edge-dims-"))
    try:
        edited = ("supplier", "part", "customer", "lineitem",
                  "nation", "region")
        for t in TABLES:
            src = Path(SF_SMOKE) / f"{t}.parquet"
            if t not in edited and src.exists():
                shutil.copy(src, workdir / f"{t}.parquet")

        # region: an EXACT duplicate of the EUROPE row — every
        # nation⋈region join fans out 2x for European nations, which
        # must double q11's per-part cents and q2's offer rows
        # IDENTICALLY on both engines (group-bys absorb the fanout,
        # sums double on both).
        r = pd.read_parquet(Path(SF_SMOKE) / "region.parquet")
        r = pd.concat([r, pd.DataFrame([
            dict(r_regionkey=3, r_name="EUROPE")])], ignore_index=True)
        r["r_regionkey"] = r["r_regionkey"].astype("Int32")
        r.to_parquet(workdir / "region.parquet")

        # nation: a NULL region key (drops from region joins) and a
        # SECOND nation named NATION_7 under a fresh key — q20 filters
        # by NAME, so supplier 109 (below) must pass through the
        # duplicate-name nation, pinning name-vs-key distinction.
        n = pd.read_parquet(Path(SF_SMOKE) / "nation.parquet")
        n = pd.concat([n, pd.DataFrame([
            dict(n_nationkey=76, n_name="NATION_EDGE76", n_regionkey=None),
            dict(n_nationkey=77, n_name="NATION_7", n_regionkey=0),
        ])], ignore_index=True)
        for col in ("n_nationkey", "n_regionkey"):
            n[col] = n[col].astype("Int32")
        n.to_parquet(workdir / "nation.parquet")

        s = pd.read_parquet(Path(SF_SMOKE) / "supplier.parquet")
        s_new = pd.DataFrame([
            dict(s_suppkey=100, s_name="Supplier#EDGE100",
                 s_nationkey=None, s_acctbal=100.0),
            dict(s_suppkey=101, s_name=None, s_nationkey=3, s_acctbal=50.0),
            dict(s_suppkey=102, s_name="Supplier#DUP", s_nationkey=7,
                 s_acctbal=10.0),
            dict(s_suppkey=103, s_name="Supplier#DUP", s_nationkey=7,
                 s_acctbal=20.0),
            dict(s_suppkey=104, s_name="Supplier#EDGE104", s_nationkey=7,
                 s_acctbal=0.0),
            dict(s_suppkey=105, s_name="Supplier#EDGE105", s_nationkey=8,
                 s_acctbal=-0.005),
            dict(s_suppkey=106, s_name="Supplier#EDGE106", s_nationkey=13,
                 s_acctbal=None),
            dict(s_suppkey=107, s_name="Supplier#EDGE107", s_nationkey=18,
                 s_acctbal=75.0),
            dict(s_suppkey=108, s_name="Supplier#EDGE108", s_nationkey=23,
                 s_acctbal=75.0),
            dict(s_suppkey=109, s_name="Supplier#EDGE109", s_nationkey=77,
                 s_acctbal=30.0),  # the duplicate-name NATION_7
            dict(s_suppkey=110, s_name="Supplier#EDGE110", s_nationkey=76,
                 s_acctbal=30.0),  # nation with a NULL region key
        ])
        s = pd.concat([s, s_new], ignore_index=True)
        s["s_nationkey"] = s["s_nationkey"].astype("Int32")
        s.to_parquet(workdir / "supplier.parquet")

        p = pd.read_parquet(Path(SF_SMOKE) / "part.parquet")
        p_new = pd.DataFrame([
            dict(p_partkey=1000, p_name="red", p_brand="Brand#9",
                 p_type="ECONOMY", p_size=4, p_retailprice=100.0),
            dict(p_partkey=1001, p_name=None, p_brand="Brand#9",
                 p_type="ECONOMY", p_size=4, p_retailprice=100.0),
            dict(p_partkey=1002, p_name="red widget", p_brand=None,
                 p_type="STANDARD", p_size=9, p_retailprice=100.0),
            dict(p_partkey=1003, p_name="blue widget", p_brand="Brand#77",
                 p_type="ECONOMY", p_size=9, p_retailprice=100.0),
            dict(p_partkey=1004, p_name="green widget", p_brand="Brand#77",
                 p_type="PROMO", p_size=9, p_retailprice=100.0),
            dict(p_partkey=1005, p_name="red thing", p_brand="Brand#9",
                 p_type="ECONOMY", p_size=None, p_retailprice=100.0),
        ])
        p = pd.concat([p, p_new], ignore_index=True)
        p["p_size"] = p["p_size"].astype("Int32")
        p.to_parquet(workdir / "part.parquet")

        c = pd.read_parquet(Path(SF_SMOKE) / "customer.parquet")
        c_new = pd.DataFrame([
            dict(c_custkey=2000, c_name="Customer#EDGE2000",
                 c_nationkey=None, c_acctbal=10.0, c_mktsegment="BUILDING"),
            dict(c_custkey=2001, c_name="Customer#EDGE2001", c_nationkey=3,
                 c_acctbal=None, c_mktsegment=None),
        ])
        c = pd.concat([c, c_new], ignore_index=True)
        c["c_nationkey"] = c["c_nationkey"].astype("Int32")
        c.to_parquet(workdir / "customer.parquet")

        li = pd.read_parquet(Path(SF_SMOKE) / "lineitem.parquet")
        li_new = pd.DataFrame(_mk_lineitem_rows())
        li = pd.concat([li, li_new], ignore_index=True)
        li["l_partkey"] = li["l_partkey"].astype("Int64")
        li["l_linenumber"] = li["l_linenumber"].astype("int32")
        li["l_quantity"] = li["l_quantity"].astype("Float64")
        li["l_shipdate"] = li["l_shipdate"].astype("datetime64[us]")
        li.to_parquet(workdir / "lineitem.parquet")
        yield str(workdir)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


@pytest.mark.parametrize("name", QUERIES)
def test_dims_edge_parity(spark, edge_sf_dir, name):
    specs = all_queries()
    res = compare(spark, edge_sf_dir, name, specs[name])
    assert res["ok"], res
