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
