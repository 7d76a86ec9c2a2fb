"""`exact_ntile` must be bit-identical to SQL NTILE(k) under a total
order — including the uneven-bucket arithmetic (first n%k buckets get
one extra row) and the degenerate n < k case — while never planning a
single-partition sort (the whole point of the rewrite; a11's old
global-NTILE windows were the repo's one plan that funneled all rows
through one task)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from old_original_java_little_horse_spark.operators.analytics import (
    exact_global_rank,
    exact_ntile,
)


def _frame(spark, n, seed):
    # xxhash-scrambled values: distinct-ish but with collisions, so
    # the custkey tiebreak genuinely decides some bucket boundaries
    return spark.range(n).select(
        F.col("id").alias("c_custkey"),
        (F.xxhash64(F.col("id") + seed) % 97).alias("v"))


@pytest.mark.parametrize("n,k", [(1, 5), (3, 5), (5, 5), (7, 3),
                                 (100, 5), (101, 5), (104, 5), (997, 7)])
def test_matches_sql_ntile(spark, n, k):
    df = _frame(spark, n, k)
    want = {r["c_custkey"]: r["b"] for r in df.select(
        "c_custkey",
        F.ntile(k).over(Window.orderBy(F.col("v").desc(), "c_custkey"))
        .cast("long").alias("b")).collect()}
    got = {r["c_custkey"]: r["s"] for r in exact_ntile(
        df, k, [F.col("v").desc(), "c_custkey"], "s").collect()}
    assert got == want


@pytest.mark.parametrize("n,k", [(3, 5), (101, 5), (997, 7)])
def test_stacked_matches_sql_ntile_per_dimension(spark, n, k):
    """The amortized multi-dimension form must equal NTILE(k) per
    dimension — ascending AND descending (negated), sharing one
    exchange."""
    from old_original_java_little_horse_spark.operators.analytics import (
        exact_ntile_stacked,
    )

    df = _frame(spark, n, k).withColumn(
        "w", (F.xxhash64(F.col("c_custkey") * 7) % 13))
    want_v = {r["c_custkey"]: r["b"] for r in df.select(
        "c_custkey",
        F.ntile(k).over(Window.orderBy(F.col("v").asc(), "c_custkey"))
        .cast("long").alias("b")).collect()}
    want_w = {r["c_custkey"]: r["b"] for r in df.select(
        "c_custkey",
        F.ntile(k).over(Window.orderBy(F.col("w").desc(), "c_custkey"))
        .cast("long").alias("b")).collect()}
    got = {r["c_custkey"]: (r["sv"], r["sw"]) for r in exact_ntile_stacked(
        df, k, [("sv", F.col("v")), ("sw", -F.col("w"))],
        key="c_custkey").collect()}
    assert {c: b[0] for c, b in got.items()} == want_v
    assert {c: b[1] for c, b in got.items()} == want_w


def test_all_equal_values_bucket_by_tiebreak(spark):
    """Degenerate skew: every value identical — NTILE must cut purely
    on the c_custkey tiebreak, and the range partitioner must spread
    the tied rows across partitions instead of piling them up (the
    tiebreak is part of the partition key — the skew-proofing claim)."""
    df = spark.range(503).select(
        F.col("id").alias("c_custkey"), F.lit(7).alias("v"))
    want = {r["c_custkey"]: r["b"] for r in df.select(
        "c_custkey",
        F.ntile(5).over(Window.orderBy("v", "c_custkey"))
        .cast("long").alias("b")).collect()}
    got = {r["c_custkey"]: r["s"] for r in exact_ntile(
        df, 5, ["v", "c_custkey"], "s").collect()}
    assert got == want


def test_heavy_skew_matches_sql_ntile(spark):
    """90% of rows share one value (a hub), the rest are distinct —
    the realistic skew shape for frequency-like dimensions."""
    df = spark.range(1000).select(
        F.col("id").alias("c_custkey"),
        F.when(F.col("id") % 10 < 9, 42).otherwise(F.col("id"))
        .cast("long").alias("v"))
    want = {r["c_custkey"]: r["b"] for r in df.select(
        "c_custkey",
        F.ntile(4).over(Window.orderBy(F.col("v").desc(), "c_custkey"))
        .cast("long").alias("b")).collect()}
    got = {r["c_custkey"]: r["s"] for r in exact_ntile(
        df, 4, [F.col("v").desc(), "c_custkey"], "s").collect()}
    assert got == want


def test_global_rank_is_dense_and_total(spark):
    df = _frame(spark, 500, 11)
    ranks = sorted(r["_grank"] for r in exact_global_rank(
        df, [F.col("v").asc(), "c_custkey"]).select("_grank").collect())
    assert ranks == list(range(1, 501))


def test_a11_plans_no_single_partition_window(spark):
    """The executed a11 plan must contain no Window whose child is a
    single-partition Exchange — NTILE's signature shape."""
    from old_original_java_little_horse_spark.operators.analytics import (
        a11_rfm_segments,
    )

    import re

    from .conftest import SF_SMOKE

    df = a11_rfm_segments(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # The NTILE signature is specifically Window→Sort→Exchange
    # SinglePartition; the 1-row scalar aggregates (ref date, ntile
    # total) legitimately coalesce to one partition under
    # HashAggregate and are fine.
    assert not re.search(
        r"Window[^\n]*\n[^\n]*Sort[^\n]*\n[^\n]*Exchange SinglePartition",
        plan), plan


def test_stacked_carry_columns_ride_the_exchange(spark):
    """`carry` columns re-emerge next to the scores — same values as
    the join-back form, no join needed (the round-7 a11 shave) — and
    a carry name colliding with the internal stacked columns is
    rejected eagerly instead of failing deep in analysis."""
    import pytest as _pytest

    from old_original_java_little_horse_spark.operators.analytics import (
        exact_ntile_stacked,
    )

    df = (_frame(spark, 101, 5)
          .withColumn("payload", F.col("c_custkey") * 1000 + 7)
          .withColumn("val", F.col("v")))
    got = exact_ntile_stacked(
        df, 5, [("s", F.col("v"))], key="c_custkey",
        scope="t:carry", carry=("payload", "val"))
    rows = {r["c_custkey"]: r for r in got.collect()}
    base = {r["c_custkey"]: r for r in df.collect()}
    assert set(rows) == set(base)
    for ck, r in rows.items():
        assert r["payload"] == base[ck]["payload"]
        assert r["val"] == base[ck]["val"]
    want = {r["c_custkey"]: r["b"] for r in df.select(
        "c_custkey",
        F.ntile(5).over(Window.orderBy("v", "c_custkey"))
        .cast("long").alias("b")).collect()}
    assert {ck: r["s"] for ck, r in rows.items()} == want
    # reserved-name collision: eager ValueError, not an opaque
    # AMBIGUOUS_REFERENCE at analysis time
    with _pytest.raises(ValueError, match="collide"):
        exact_ntile_stacked(df, 5, [("s", F.col("v"))],
                            key="c_custkey", carry=("v",))


def test_stacked_carry_rejects_out_name_and_duplicate_collisions(spark):
    """A carry name that matches a dims out_name (or another carry
    entry) would emit duplicate output columns — rejected eagerly."""
    import pytest as _pytest

    from old_original_java_little_horse_spark.operators.analytics import (
        exact_ntile_stacked,
    )

    df = _frame(spark, 11, 3).withColumn("score", F.col("v") + 1)
    with _pytest.raises(ValueError, match="collide"):
        exact_ntile_stacked(df, 3, [("score", F.col("v"))],
                            key="c_custkey", carry=("score",))
    with _pytest.raises(ValueError, match="collide"):
        exact_ntile_stacked(df, 3, [("s", F.col("v"))],
                            key="c_custkey", carry=("score", "score"))


def test_offsets_are_prefix_scanned_not_triangular_joined(spark):
    """VERDICT r13 item 5: the prefix offsets must come from a
    cumulative window over the count table, never the O(P²) triangular
    `_bpid < _pid` self-join (which planned as a LeftOuter join and
    got worse with `spark.sql.shuffle.partitions`)."""
    from old_original_java_little_horse_spark.operators.analytics import (
        exact_ntile_stacked,
    )

    df = _frame(spark, 101, 5)
    stacked = exact_ntile_stacked(df, 5, [("s", F.col("v"))],
                                  key="c_custkey", scope="t:planshape")
    plan = stacked._jdf.queryExecution().executedPlan().toString()
    assert "LeftOuter" not in plan, plan
    ranked = exact_global_rank(df, ["v", "c_custkey"], scope="t:planshape2")
    plan = ranked._jdf.queryExecution().executedPlan().toString()
    assert "LeftOuter" not in plan, plan
