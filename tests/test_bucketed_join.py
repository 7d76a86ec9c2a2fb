"""Bucketed co-located joins: the shuffle-elimination strategy the
100 TB plan relies on (SURVEY §6 / the partitioning playbook).

A fact⋈fact join (lineitem⋈orders on the order key) cannot broadcast
either side at scale; the standard fix is to WRITE both tables
bucketed on the join key so every subsequent join is exchange-free.
These tests prove the engine actually gets that plan — same join,
same results, zero `Exchange` operators — not just that the API was
called.
"""

from __future__ import annotations

import shutil
import tempfile

import pyspark.sql.functions as F

from old_original_java_little_horse_spark.plans.inspect import (
    count_exchanges, explain_str,
)
from old_original_java_little_horse_spark.session import scoped_conf
from old_original_java_little_horse_spark.sources.parquet import load_table

# At the smoke SF orders fits the broadcast threshold, which would
# sidestep the thing under test: at 100 TB NEITHER side broadcasts,
# so pin the planner into the big-join regime.
_BIG_JOIN = {"spark.sql.autoBroadcastJoinThreshold": "-1"}

from .conftest import SF_SMOKE

N_BUCKETS = 8


def test_bucketed_join_is_exchange_free(spark):
    """lineitem⋈orders bucketed on the order key: the sort-merge join
    reads both sides' buckets directly — NO Exchange anywhere in the
    plan — and returns exactly the rows of the unbucketed join."""
    workdir = tempfile.mkdtemp(prefix="bucketed-")
    li = load_table(spark, SF_SMOKE, "lineitem")
    o = load_table(spark, SF_SMOKE, "orders")
    try:
        (li.write.bucketBy(N_BUCKETS, "l_orderkey")
           .sortBy("l_orderkey")
           .option("path", f"{workdir}/lineitem_b")
           .mode("overwrite").saveAsTable("lineitem_b"))
        (o.write.bucketBy(N_BUCKETS, "o_orderkey")
           .sortBy("o_orderkey")
           .option("path", f"{workdir}/orders_b")
           .mode("overwrite").saveAsTable("orders_b"))

        with scoped_conf(spark, _BIG_JOIN):
            lib = spark.table("lineitem_b")
            ob = spark.table("orders_b")
            joined = (lib.join(ob, lib.l_orderkey == ob.o_orderkey)
                      .groupBy("o_orderpriority")
                      .agg(F.count(F.lit(1)).alias("n"),
                           F.sum(F.col("l_quantity").cast("long"))
                            .alias("qty")))

            txt = explain_str(joined)
            # The join itself is exchange-free (bucket-co-located);
            # the only exchange allowed is the final small rollup on
            # o_orderpriority.
            assert count_exchanges(joined) <= 1, txt
            assert "SortMergeJoin" in txt, txt

            # Same answer as the plain (shuffling) join.
            plain = (li.join(o, li.l_orderkey == o.o_orderkey)
                     .groupBy("o_orderpriority")
                     .agg(F.count(F.lit(1)).alias("n"),
                          F.sum(F.col("l_quantity").cast("long"))
                           .alias("qty")))
            assert sorted(map(tuple, joined.collect())) == \
                sorted(map(tuple, plain.collect()))

            # And the plain join DOES shuffle both sides — the
            # baseline the bucketing removed.
            assert count_exchanges(plain) >= 2, explain_str(plain)
    finally:
        spark.sql("DROP TABLE IF EXISTS lineitem_b")
        spark.sql("DROP TABLE IF EXISTS orders_b")
        shutil.rmtree(workdir, ignore_errors=True)


def test_bucketed_groupby_reuses_bucketing(spark):
    """An aggregation keyed on the bucket column needs no exchange
    either — bucketing is a reusable physical property, not a
    join-only trick."""
    workdir = tempfile.mkdtemp(prefix="bucketed-agg-")
    li = load_table(spark, SF_SMOKE, "lineitem")
    try:
        (li.write.bucketBy(N_BUCKETS, "l_orderkey")
           .option("path", f"{workdir}/li_b")
           .mode("overwrite").saveAsTable("li_agg_b"))
        agg = (spark.table("li_agg_b")
               .groupBy("l_orderkey")
               .agg(F.sum(F.col("l_quantity").cast("long")).alias("qty")))
        assert count_exchanges(agg) == 0, explain_str(agg)
        # Parity with the shuffling plan.
        plain = (li.groupBy("l_orderkey")
                 .agg(F.sum(F.col("l_quantity").cast("long")).alias("qty")))
        assert sorted(map(tuple, agg.collect())) == \
            sorted(map(tuple, plain.collect()))
    finally:
        spark.sql("DROP TABLE IF EXISTS li_agg_b")
        shutil.rmtree(workdir, ignore_errors=True)
