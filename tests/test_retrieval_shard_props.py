"""Semantic property tests for the round-5 additions that the oracle
hash gate cannot express: BM25's ranking behaviors (saturation /
length normalization) and the shard-packing manifest's invariants
(contiguity, bounds, append stability)."""

from __future__ import annotations

import pyspark.sql.functions as F

from old_original_java_little_horse_spark.functions.multimodal import SHARD_BYTES
from old_original_java_little_horse_spark.registry import all_queries

from .conftest import SF_SMOKE

Q = all_queries()


def _bm25_term_score(tf: int, dl: int, n_docs: int, df: int, t_tokens: int) -> int:
    """The exact integer form both engines compute, in plain Python."""
    idf_e3 = (1000 * n_docs) // df
    return (idf_e3 * 22 * t_tokens * tf) // (
        10 * t_tokens * tf + 3 * t_tokens + 9 * dl * n_docs)


def test_bm25_tf_saturation_and_length_norm():
    """The integer rational keeps BM25's two defining monotonicities:
    marginal gain per extra occurrence shrinks (saturation), and the
    same tf scores lower in a longer document (length norm)."""
    n_docs, df, t_tokens, dl = 1000, 50, 150_000, 150
    scores = [_bm25_term_score(tf, dl, n_docs, df, t_tokens)
              for tf in range(1, 30)]
    assert scores == sorted(scores), "score must rise with tf"
    gains = [b - a for a, b in zip(scores, scores[1:])]
    assert all(g2 <= g1 for g1, g2 in zip(gains, gains[1:])), \
        f"marginal gains must shrink (saturation): {gains}"
    # Saturation ceiling: tf→∞ approaches idf·(k1+1)/1 ≈ idf_e3·22/10.
    assert scores[-1] <= (1000 * n_docs // df) * 22 // 10
    short = _bm25_term_score(3, 50, n_docs, df, t_tokens)
    long_ = _bm25_term_score(3, 500, n_docs, df, t_tokens)
    assert long_ < short, "same tf must score lower in a longer doc"


def test_bm25_topk_is_subset_of_tfidf_candidates(spark):
    """BM25 and tf·idf share the posting fetch (`_query_term_hits`),
    so every BM25 hit must be a document carrying ≥1 query term — and
    both emit exactly TOP_K rows at this SF."""
    from old_original_java_little_horse_spark.functions.retrieval import (
        TOP_K, _query_term_hits,
    )
    from old_original_java_little_horse_spark.sources.parquet import load_table

    bm = Q["idx_bm25_topk"].fn(spark, SF_SMOKE).collect()
    tf = Q["idx_tfidf_topk"].fn(spark, SF_SMOKE).collect()
    assert len(bm) == TOP_K and len(tf) == TOP_K
    hits, _ = _query_term_hits(load_table(spark, SF_SMOKE, "documents"))
    candidates = {r["doc_id"] for r in hits.select("doc_id").distinct().collect()}
    assert {r["doc_id"] for r in bm} <= candidates
    assert all(r["n_terms_matched"] >= 1 for r in bm)
    assert all(r["bm25_e3"] > 0 for r in bm)


def test_shard_assign_invariants(spark):
    """Per source: offsets are the exact running sum (contiguity — no
    gaps, no overlap), shard_offset < SHARD_BYTES, shard ids are
    non-decreasing in doc_id order, and every doc appears once."""
    rows = Q["mm_shard_assign"].fn(spark, SF_SMOKE).collect()
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    assert len(rows) == len({r["doc_id"] for r in rows})
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r["doc_id"])
        running = 0
        prev_shard = -1
        for r in rs:
            start = r["shard_id"] * SHARD_BYTES + r["shard_offset"]
            assert start == running, (src, r["doc_id"], start, running)
            assert 0 <= r["shard_offset"] < SHARD_BYTES
            assert r["shard_id"] >= prev_shard, "shard ids must not regress"
            prev_shard = r["shard_id"]
            running += r["n_bytes"]


def test_shard_assign_append_stable(spark):
    """Appending new docs (higher doc_ids) must not move any existing
    assignment — the property that lets the manifest be maintained
    incrementally instead of recomputed."""
    from old_original_java_little_horse_spark.sources.parquet import load_table

    full = {(r["doc_id"], r["source"]): (r["shard_id"], r["shard_offset"])
            for r in Q["mm_shard_assign"].fn(spark, SF_SMOKE).collect()}

    d = load_table(spark, SF_SMOKE, "documents")
    cut = d.approxQuantile("doc_id", [0.5], 0.0)[0]
    prefix = d.where(F.col("doc_id") <= cut)
    import tempfile

    tmp = tempfile.mkdtemp(prefix="shard-prefix-")
    prefix.write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    sub = {(r["doc_id"], r["source"]): (r["shard_id"], r["shard_offset"])
           for r in Q["mm_shard_assign"].fn(spark, tmp).collect()}
    assert sub == {k: v for k, v in full.items() if k in sub}


def test_extend_shard_assign_equals_full_recompute(spark):
    """Incremental manifest maintenance: assigning only the NEW docs
    against the old manifest's per-source tails must reproduce exactly
    what a full recompute assigns them — and reject docs that violate
    the append-only contract."""
    import pyspark.sql.functions as F

    from old_original_java_little_horse_spark.functions.multimodal import (
        extend_shard_assign,
    )
    from old_original_java_little_horse_spark.sources.parquet import load_table

    d = load_table(spark, SF_SMOKE, "documents")
    cut = d.approxQuantile("doc_id", [0.5], 0.0)[0]
    old_docs, new_docs = (d.where(F.col("doc_id") <= cut),
                          d.where(F.col("doc_id") > cut))

    full = {(r["doc_id"], r["source"]): (r["shard_id"], r["shard_offset"])
            for r in Q["mm_shard_assign"].fn(spark, SF_SMOKE).collect()}
    import tempfile

    tmp = tempfile.mkdtemp(prefix="shard-old-")
    old_docs.write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    manifest = Q["mm_shard_assign"].fn(spark, tmp)
    ext = {(r["doc_id"], r["source"]): (r["shard_id"], r["shard_offset"])
           for r in extend_shard_assign(manifest, new_docs).collect()}
    assert ext == {k: v for k, v in full.items()
                   if k not in {(r["doc_id"], r["source"])
                                for r in manifest.collect()}}

    # Appending an ALREADY-ASSIGNED doc_id must be rejected — at
    # action time: the contract check is a raise_error column in the
    # returned plan, not an eager extra job.
    import pytest as _pytest

    with _pytest.raises(Exception, match="append-only"):
        extend_shard_assign(manifest, old_docs.limit(1)).collect()
