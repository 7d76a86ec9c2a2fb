"""The enumerate-contract candidate counters (VERDICT r11 item 3).

`enum_candidates.ENUM_COUNTERS` gives the decade probe the honest
scale unit (wall per candidate) for the pair-enumeration queries.
Each counter must equal the EXACT number of candidate join rows the
query's verify stage receives — pinned here by executing the real
candidate join (same builders, pre-dedup) at sf0.001 and comparing.
A drift between counter and join would silently corrupt the probe's
`us_per_candidate` columns, so these are equality assertions, not
bounds.
"""
from __future__ import annotations

from pyspark.sql import functions as F

from old_original_java_little_horse_spark.functions import dedup as D
from old_original_java_little_horse_spark.functions import similarity as S
from old_original_java_little_horse_spark.functions.dedup import grid_self_pairs
from old_original_java_little_horse_spark.functions.enum_candidates import (
    ENUM_COUNTERS,
)

SF = "/root/testdata/sf0.001"


def test_registry_queries_have_counters():
    from old_original_java_little_horse_spark.registry import all_queries

    q = all_queries()
    missing = [n for n in ENUM_COUNTERS if n not in q]
    assert not missing, f"counters for unregistered queries: {missing}"


def test_minhash_counter_matches_join(spark):
    actual = grid_self_pairs(
        D.minhash_sigs(spark, SF), ["band", "sig"], dedup=False).count()
    counted = ENUM_COUNTERS["d_minhash_lsh_pairs"](spark, SF)
    assert counted == actual
    assert counted > 0  # the corpus plants near-dups even at sf0.001


def test_ngram_counter_matches_join(spark):
    sigs = D.minhash_sigs(spark, SF, k=3, n_bands=D.NGRAM_BANDS,
                          with_source=True)
    actual = grid_self_pairs(
        sigs, ["source", "band", "sig"], dedup=False).count()
    assert ENUM_COUNTERS["d_ngram_jaccard_pairs"](spark, SF) == actual


def test_simhash_counter_matches_join(spark):
    bands = D.simhash_band_keys(spark, SF)
    actual = grid_self_pairs(bands, ["bkey"], dedup=False).count()
    assert ENUM_COUNTERS["d_simhash_pairs"](spark, SF) == actual


def test_winnow_counter_matches_join(spark):
    live = D.winnow_live_postings(spark, SF)
    actual = (live.alias("a")
              .join(live.alias("b"),
                    (F.col("a.h") == F.col("b.h"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")))
              .count())
    assert ENUM_COUNTERS["d_winnow_fingerprint_pairs"](spark, SF) == actual


def test_edit_segment_counter_matches_join(spark):
    live = D.edit_aligned_live(D.edit_prefix_base(spark, SF))
    actual = (live.alias("a")
              .join(live.alias("r"),
                    (F.col("a.lang") == F.col("r.lang"))
                    & (F.col("a.i") == F.col("r.i"))
                    & (F.col("a.s") == F.col("r.s"))
                    & (F.col("a.doc_id") < F.col("r.doc_id")))
              .count())
    assert ENUM_COUNTERS["d_edit_segment_pairs"](spark, SF) == actual


def test_edit_shift_counter_matches_join(spark):
    base = D.edit_prefix_base(spark, SF)
    live = D.edit_aligned_live(base)
    subs = D.edit_shift_substrings(base)
    actual = (live.alias("a")
              .join(subs.alias("b"),
                    (F.col("a.lang") == F.col("b.lang"))
                    & (F.col("a.i") == F.col("b.i"))
                    & (F.col("a.s") == F.col("b.s"))
                    & (F.col("a.doc_id") != F.col("b.doc_id")))
              .count())
    assert ENUM_COUNTERS["d_edit_shift_pairs"](spark, SF) == actual


def test_neardup_counter_matches_join(spark):
    e = S.directed_vectors(spark, SF, with_label=True)
    sigs = S.neardup_block_sigs(e)
    actual = grid_self_pairs(sigs, ["label", "bucket"], id_col="vec_id",
                             dedup=False).count()
    counted = ENUM_COUNTERS["sim_label_blocked_neardup"](spark, SF)
    assert counted == actual
    assert counted > 0
