"""Recall of the sorted-neighborhood candidate cap in sim_neardup_topk
(VERDICT r10 item 2).

The capped query bounds the pair intermediate at N x N_TABLES x
NEARDUP_WINDOW; the price is that a qualifying pair sitting more than
NEARDUP_WINDOW apart in vec_id order inside every shared bucket is
missed.  This suite MEASURES that price against the uncapped reference
(the exhaustive verified pair set of sim_label_blocked_neardup,
directed both ways and ranked per vector — the round-10 semantics) on
both committed test corpora.
"""
from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window

from old_original_java_little_horse_spark.functions.similarity import (
    NEARDUP_TOPK,
    sim_label_blocked_neardup,
    sim_neardup_topk,
)

from .conftest import SF_SMOKE

SF_MED = SF_SMOKE.replace("sf0.001", "sf0.01")


def _uncapped_topk(spark, sf_dir):
    pairs = sim_label_blocked_neardup(spark, sf_dir)
    e4 = F.round(F.col("cosine") * 10000).cast("long").alias("cosine_e4")
    directed = pairs.select(
        F.col("vec_a").alias("vec_id"), F.col("vec_b").alias("partner_id"), e4
    ).unionByName(pairs.select(
        F.col("vec_b").alias("vec_id"), F.col("vec_a").alias("partner_id"), e4))
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cosine_e4").desc(), F.col("partner_id"))
    return (directed.withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= NEARDUP_TOPK)
            .select("vec_id", "partner_id"))


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_MED])
def test_capped_topk_recall(spark, sf_dir):
    want = {(r.vec_id, r.partner_id) for r in _uncapped_topk(spark, sf_dir).collect()}
    got = {(r.vec_id, r.partner_id)
           for r in sim_neardup_topk(spark, sf_dir).collect()}
    assert want, "uncapped reference produced no pairs — corpus mismatch"
    recall = len(want & got) / len(want)
    # Measured 1.0 on both corpora (every dup neighborhood fits the
    # 16-successor window); the floor leaves headroom for corpus
    # regeneration, not for a real recall regression.
    assert recall >= 0.95, f"capped top-k recall {recall:.3f} at {sf_dir}"


def test_candidate_set_is_linear(spark):
    """The pair intermediate must be bounded by N * N_TABLES * WINDOW."""
    from old_original_java_little_horse_spark.functions.similarity import (
        N_TABLES,
        NEARDUP_WINDOW,
    )
    from old_original_java_little_horse_spark.sources.parquet import load_table

    n = load_table(spark, SF_MED, "embeddings").count()
    out = sim_neardup_topk(spark, SF_MED)
    assert out.count() <= NEARDUP_TOPK * n
    # The structural bound the cap exists to provide:
    assert n * N_TABLES * NEARDUP_WINDOW < n * n
