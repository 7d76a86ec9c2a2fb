"""Candidate-pair counters for the enumerate-contract queries
(VERDICT r11 item 3).

Some registry queries' CONTRACT is pair enumeration: they must emit
every qualifying near-duplicate pair, so on clustered data their
output — and the candidate set they verify — grows quadratically
within each dense neighborhood while staying linear in the blocking
structure.  For these queries a wall-clock ratio against a x10 data
step measures the RESULT SET's growth, not plan health; the honest
scale unit is wall time PER CANDIDATE.  The r10/r11 decade probes
adjudicated this by hand in a docstring each round; this module makes
the probe compute it: `tools/scale_probe.py` records
`candidates_small/big` and `us_per_candidate_*` for every query listed
in ENUM_COUNTERS, and its audit bound for them trips on per-candidate
growth instead of wall ratio.

Each counter computes the EXACT number of candidate rows the query's
verify stage receives (pre-dedup join rows — the work the join
actually performs), using the SAME sig/posting builders the query
executes (`minhash_sigs`, `simhash_band_keys`, `winnow_live_postings`,
`edit_aligned_live`/`edit_shift_substrings`, `neardup_block_sigs`), so
the counted work cannot drift from the executed plan.  The identity
"counter == actual join-row count" is pinned per family by
`tests/test_enum_candidates.py` against an independent execution of
the real candidate join at sf0.001.

Counting rule: every family blocks on an equi-join key, so
  - self-join families: candidates = sum over key groups of C(m, 2)
    (each doc appears at most once per key group in every family —
    bucket ids embed their table index, aligned segments embed their
    position, fingerprints are array_distinct-ed per doc);
  - the shift family (aligned segments x shifted substrings):
    candidates = sum over keys of m_seg * m_sub, minus the same-doc
    matches the join's `doc_id != doc_id` condition drops (per-key
    multiplicities are <= 1 per doc on each side, so that correction
    is one inner join count on key + doc_id).
NULL join keys never match, so rows with a NULL key column are
excluded exactly like the join excludes them (NULL labels in the
embeddings corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def self_pair_count(sigs: DataFrame, key_cols: list[str]) -> int:
    """Sum of C(m, 2) over `key_cols` groups — the candidate join-row
    count of an equi-self-join on `key_cols` with an id inequality,
    given at most one row per (id, key) (true for every registered
    family; see module docstring)."""
    per = (sigs.dropna(subset=key_cols)  # NULL keys never join
           .groupBy(*key_cols).count())
    row = per.select(F.coalesce(
        F.sum(F.col("count") * (F.col("count") - F.lit(1)) / F.lit(2.0)),
        F.lit(0.0)).alias("c")).first()
    return int(row["c"])


def _count_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> int:
    from .dedup import minhash_sigs

    return self_pair_count(minhash_sigs(spark, sf_dir), ["band", "sig"])


def _count_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> int:
    from .dedup import NGRAM_BANDS, minhash_sigs

    sigs = minhash_sigs(spark, sf_dir, k=3, n_bands=NGRAM_BANDS,
                        with_source=True)
    return self_pair_count(sigs, ["source", "band", "sig"])


def _count_simhash_pairs(spark: SparkSession, sf_dir: str) -> int:
    from .dedup import simhash_band_keys

    return self_pair_count(simhash_band_keys(spark, sf_dir), ["bkey"])


def _count_winnow_pairs(spark: SparkSession, sf_dir: str) -> int:
    from .dedup import winnow_live_postings

    return self_pair_count(winnow_live_postings(spark, sf_dir), ["h"])


def _count_edit_segment_pairs(spark: SparkSession, sf_dir: str) -> int:
    from .dedup import edit_aligned_live, edit_prefix_base

    live = edit_aligned_live(edit_prefix_base(spark, sf_dir))
    return self_pair_count(live, ["lang", "i", "s"])


def _count_edit_shift_pairs(spark: SparkSession, sf_dir: str) -> int:
    from .dedup import (edit_aligned_live, edit_prefix_base,
                        edit_shift_substrings)

    base = edit_prefix_base(spark, sf_dir)
    key = ["lang", "i", "s"]
    live = (edit_aligned_live(base).dropna(subset=key)
            .select(*key, "doc_id"))
    subs = (edit_shift_substrings(base).dropna(subset=key)
            .select(*key, "doc_id"))
    a = live.groupBy(*key).agg(F.count(F.lit(1)).alias("na"))
    b = subs.groupBy(*key).agg(F.count(F.lit(1)).alias("nb"))
    total = a.join(b, key).select(F.coalesce(
        F.sum(F.col("na") * F.col("nb")), F.lit(0)).alias("c")).first()["c"]
    # same-doc rows the join's doc_id != doc_id condition drops: per
    # (key, doc) multiplicities are <= 1 on each side, so the count is
    # one inner join on key + doc_id.
    self_matches = live.join(subs, [*key, "doc_id"]).count()
    return int(total) - int(self_matches)


def _count_label_blocked_neardup(spark: SparkSession, sf_dir: str) -> int:
    from .similarity import directed_vectors, neardup_block_sigs

    e = directed_vectors(spark, sf_dir, with_label=True)
    return self_pair_count(neardup_block_sigs(e), ["label", "bucket"])


# Query name -> fn(spark, sf_dir) -> exact candidate-pair count.
ENUM_COUNTERS = {
    "d_minhash_lsh_pairs": _count_minhash_lsh_pairs,
    "d_ngram_jaccard_pairs": _count_ngram_jaccard_pairs,
    "d_simhash_pairs": _count_simhash_pairs,
    "d_winnow_fingerprint_pairs": _count_winnow_pairs,
    "d_edit_segment_pairs": _count_edit_segment_pairs,
    "d_edit_shift_pairs": _count_edit_shift_pairs,
    "sim_label_blocked_neardup": _count_label_blocked_neardup,
}
