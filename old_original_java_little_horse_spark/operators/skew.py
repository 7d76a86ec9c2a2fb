"""Skew-safe joins: deterministic salting for hot keys.

`grid_self_pairs` (functions/dedup.py) handles the SELF-join skew
case; this is the general A⋈B companion for when one side of an
equi-join has hot keys too big for one reducer but the other side is
too big to broadcast outright (the 100 TB fact⋈medium-dim regime —
e.g. events⋈users where one synthetic "user" owns 10% of events).

Standard salting with `rand()` breaks Spark's task-retry determinism
(a re-executed partition would re-salt differently and double- or
drop rows); here the salt is `pmod(xxhash64(<all fact columns>), salt)` —
a pure function of the row, so retries, AQE re-plans, and speculative
tasks all agree.  Identical duplicate rows share a cell, which only
matters if the hot key's rows are ALSO near-identical — at that point
dedup, not salting, is the fix.

The dim side replicates ×salt (the fragment-replicate trade: tiny
rows × salt vs a reducer melting), the join key becomes
(key, _salt), and the hot key's fan-in spreads over `salt` reducers.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def salted_join(fact: DataFrame, dim: DataFrame, on: str,
                how: str = "inner", salt: int = 16) -> DataFrame:
    """Equi-join `fact ⋈ dim` on column `on`, skew-spread over `salt`
    cells.  `on` must exist on both sides; output columns = fact ∪
    dim-minus-key, like a plain `join(..., on)`.

    `how` supports the fact-preserving joins ("inner", "left") —
    right/outer would need the TRANSPOSE salting (dim rows salted,
    fact replicated), which is the mirror image and not what the
    fact-heavy regime wants.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if "_salt" in fact.columns or "_salt" in dim.columns:
        raise ValueError("salted_join reserves the column name '_salt'")
    cells = F.array(*[F.lit(i) for i in range(salt)])
    fact_s = fact.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]),
                        F.lit(salt)).cast("int"))
    dim_s = dim.withColumn("_salt", F.explode(cells))
    return fact_s.join(dim_s, [on, "_salt"], how).drop("_salt")


# --------------------------------------------------------------------------
# Registry proof: salted join ≡ plain join (one oracle, skew-proof plan)
# --------------------------------------------------------------------------

from pyspark.sql import SparkSession

from ..registry import query
from ..sources.parquet import load_table

SALT = 8


@query(
    "j9_salted_skew_join",
    oracle="""
SELECT c.c_nationkey,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(round(e.value * 100, 0) AS BIGINT)) AS BIGINT)
         AS value_cents
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1
""",
)
def j9_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation event rollup computed through `salted_join` — the
    skew-spread fact⋈dim equi-join — against a PLAIN-join oracle: the
    salting must be invisible in the result (same rows, every retry /
    AQE re-plan deterministic) while the plan spreads each hot user's
    fan-in over {salt} reducer cells.

    This row exists so the skew playbook is driver-evidence, not just
    unit-tested: the dim side replicates ×{salt} (tiny × 8 here; at
    100 TB you size salt to hot-key row count / target partition
    size), the join key becomes (user_id, _salt) with the salt a pure
    row function (xxhash64, not rand() — task retries must agree),
    and the rollup re-aggregates to exactly the plain join's answer.
    `tests/test_skew_join.py` additionally pins cell balance and
    retry determinism."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"))
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_nationkey")
    joined = salted_join(e, dim, on="user_id", salt=SALT)
    return (joined.groupBy("c_nationkey")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum("cents").alias("value_cents")))


j9_salted_skew_join.__doc__ = j9_salted_skew_join.__doc__.format(salt=SALT)
