"""Deterministic salted join: equality with the plain join on skewed
data, salt genuinely in the shuffle key, and retry-determinism of the
salt function."""

from __future__ import annotations

import pyspark.sql.functions as F

from old_original_java_little_horse_spark.operators.skew import salted_join
from old_original_java_little_horse_spark.plans.inspect import explain_str


def _skewed(spark):
    """100k fact rows, 90% on one hot key; 50-row dim."""
    fact = (spark.range(100_000)
            .select(F.when(F.col("id") % 10 < 9, F.lit(7))
                    .otherwise(F.col("id") % 50).alias("k"),
                    F.col("id").alias("payload")))
    dim = spark.range(50).select(F.col("id").alias("k"),
                                 F.concat(F.lit("d"), "id").alias("name"))
    return fact, dim


def test_salted_join_equals_plain(spark):
    fact, dim = _skewed(spark)
    for how in ("inner", "left"):
        got = salted_join(fact, dim, "k", how=how, salt=8)
        want = fact.join(dim, "k", how)
        assert sorted(map(tuple, got.collect())) == \
            sorted(map(tuple, want.collect())), how


def test_salted_join_missing_dim_keys_left(spark):
    """Left join keeps fact rows whose key has no dim match (salting
    must not turn them into drops)."""
    fact, dim = _skewed(spark)
    dim_holey = dim.where(F.col("k") != 7)  # hot key absent from dim
    got = salted_join(fact, dim_holey, "k", how="left", salt=8)
    want = fact.join(dim_holey, "k", "left")
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, want.collect()))


def test_salt_widens_shuffle_key(spark):
    """The exchange hashes on (k, _salt), so the hot key spreads over
    `salt` reducers instead of one.  (Broadcast pinned off: when the
    dim fits the broadcast threshold there is no exchange to salt and
    salted_join is unnecessary — the utility exists for the
    medium-dim regime.)"""
    from old_original_java_little_horse_spark.session import scoped_conf

    fact, dim = _skewed(spark)
    with scoped_conf(spark, {"spark.sql.autoBroadcastJoinThreshold": "-1"}):
        df = salted_join(fact, dim, "k", salt=8)
        txt = explain_str(df)
        assert "_salt" in txt, txt
        assert "hashpartitioning(k" in txt and "_salt" in \
            txt[txt.index("hashpartitioning(k"):], txt


def test_salt_is_deterministic_per_row(spark):
    """xxhash64-of-row salting: the same DataFrame salts identically
    across evaluations (what rand() salting cannot guarantee under
    task retry)."""
    fact, _ = _skewed(spark)
    salted = fact.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]),
                        F.lit(8)).cast("int"))
    a = sorted(map(tuple, salted.collect()))
    b = sorted(map(tuple, salted.collect()))
    assert a == b
    # and it actually spreads the hot key
    spread = (salted.where(F.col("k") == 7)
              .select("_salt").distinct().count())
    assert spread == 8
