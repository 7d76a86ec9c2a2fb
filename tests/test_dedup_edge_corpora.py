"""Adversarial-corpus parity: the dedup/text family must hash-match
its DuckDB oracle on edge-case documents the generated testdata never
contains — empty/whitespace text, shingle-boundary lengths, unicode,
exact duplicates.  The sf0.01 driver check can't see these; a
divergence here (e.g. a split() edge both engines handle differently)
would silently corrupt results at scale."""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

import pytest

from old_original_java_little_horse_spark.registry import all_queries
from old_original_java_little_horse_spark.sources.parquet import TABLES

from .conftest import SF_SMOKE
from .oracle_compare import compare

EDGE_DOCS = [
    # (doc_id, text, lang, source)
    (0, "", "en", "src0"),                            # empty
    (1, "   ", "en", "src0"),                         # whitespace only
    (2, "word", "en", "src0"),                        # single token
    (3, "one two", "en", "src0"),                     # below 3-gram k
    (4, "one two three", "en", "src0"),               # exactly 3-gram k
    (5, "one two three four", "en", "src0"),          # below 5-shingle k
    (6, "one two three four five", "en", "src0"),     # exactly 5-shingle k
    (7, "a\t b\n\nc   d\te f", "en", "src1"),         # mixed whitespace
    (8, "héllo wörld ñiño désu 中文 テスト", "xx", "src1"),  # unicode
    (9, "Héllo Wörld ñiño désu 中文 テスト", "xx", "src1"),  # case-folded dup
    (10, "the quick brown fox jumps over the lazy dog today", "en", "src1"),
    (11, "the quick brown fox jumps over the lazy dog today", "en", "src1"),
    (12, "the quick brown fox jumps over the lazy dog tonight", "en", "src1"),
    (13, "THE  QUICK   brown fox jumps over the lazy dog today", "en", "src1"),
    (14, None, "en", "src0"),                         # NULL text (ADVICE r10:
    # a plain explode silently dropped such docs from d_simhash while
    # the oracle still emitted an all-zeros signature row)
]

QUERIES = [
    "d_exact_dedup", "d_minhash_signatures", "d_minhash_lsh_pairs",
    "d_ngram_jaccard_pairs", "d_simhash", "d_simhash_pairs",
    "d_dup_clusters", "d_dedup_canonical",
    "d_edit_shift_pairs", "d_edit_segment_pairs",
    "t_lang_id", "t_quality_score", "t_token_count", "t_fingerprint",
    "t_corpus_stats", "t_pii_redact",
    # round 11: the rest of the documents-table family, so every text
    # operator is pinned on the NULL/empty/unicode/boundary corpus
    "t_doc_chunks", "t_hash_split", "t_top_ngrams", "t_distinctive_terms",
    "t_segment_dedup", "t_lm_score", "t_repetition_score",
    "t_global_shuffle", "t_pack_sequences", "t_balanced_mix",
    "t_decontaminate", "t_decontaminate_bloom", "t_stratified_sample",
    "t_curated_corpus", "t_span_dedup", "t_source_overlap",
    "t_dsir_weights", "t_dsir_resample", "t_bpe_merges", "t_bpe_encode",
    "d_winnow_fingerprint_pairs", "d_url_dedup",
]


@pytest.fixture(scope="module")
def edge_sf_dir(spark):
    """sf0.001 with documents.parquet replaced by the edge corpus."""
    workdir = Path(tempfile.mkdtemp(prefix="edge-corpus-"))
    try:
        for t in TABLES:
            src = Path(SF_SMOKE) / f"{t}.parquet"
            if t != "documents" and src.exists():
                shutil.copy(src, workdir / f"{t}.parquet")
        df = spark.createDataFrame(
            [(i, txt, lang, src, len(txt) if txt is not None else None)
             for i, txt, lang, src in EDGE_DOCS],
            schema="doc_id long, text string, lang string, source string, n_chars long",
        )
        # ONE plain parquet file, same layout as the driver's testdata.
        df.toPandas().to_parquet(workdir / "documents.parquet")
        yield str(workdir)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


@pytest.mark.parametrize("name", QUERIES)
def test_edge_corpus_parity(spark, edge_sf_dir, name):
    specs = all_queries()
    res = compare(spark, edge_sf_dir, name, specs[name])
    assert res["ok"], res


def test_edge_corpus_finds_the_planted_dups(spark, edge_sf_dir):
    """Sanity that the corpus exercises what it claims: docs 10/11/13
    normalize to distinct keys (13 differs in case only after collapse
    — lowercase makes it equal), 10==11 exactly."""
    specs = all_queries()
    rows = {r["content_key"]: r
            for r in specs["d_exact_dedup"].fn(spark, edge_sf_dir).collect()}
    by_copies = sorted((r["n_copies"], r["canonical_doc_id"])
                       for r in rows.values())
    # 10, 11 and 13 all collapse to one normalized string → 3 copies.
    assert (3, 10) in by_copies, by_copies


def test_grid_self_pairs_degenerate_bucket_exact(spark):
    """The skew-bomb case: ONE bucket holding 40 ids must yield every
    C(40,2)=780 pair exactly once — fragment-replicate sub-bucketing
    changes WHERE a pair is produced, never WHETHER (or how often)."""
    from old_original_java_little_horse_spark.functions.dedup import (
        grid_self_pairs,
    )

    sigs = spark.createDataFrame([(i, "b0") for i in range(40)],
                                 "doc_id long, bucket string")
    pairs = [(r["id_a"], r["id_b"])
             for r in grid_self_pairs(sigs, ["bucket"]).collect()]
    assert len(pairs) == 780 and len(set(pairs)) == 780
    assert all(a < b for a, b in pairs)


def test_grid_self_pairs_no_cross_bucket_pairs(spark):
    """Pairs never cross buckets, and multi-bucket membership (a doc
    in several LSH bands) still dedupes to one output pair."""
    from old_original_java_little_horse_spark.functions.dedup import (
        grid_self_pairs,
    )

    rows = [(1, "x"), (2, "x"), (1, "y"), (2, "y"), (3, "z")]
    sigs = spark.createDataFrame(rows, "doc_id long, bucket string")
    pairs = [(r["id_a"], r["id_b"])
             for r in grid_self_pairs(sigs, ["bucket"]).collect()]
    assert pairs == [(1, 2)]


def test_winnowing_shared_substring_guarantee(spark):
    """Winnowing's theorem (Schleimer et al. §2): any shared word run
    of length ≥ k + w − 1 (= 8 here) guarantees at least one shared
    fingerprint, REGARDLESS of where the run sits in each document.
    Two docs share an 8-word run embedded at different offsets in
    otherwise-disjoint filler; a third doc has no overlap — the pair
    (0,1) must be detected, and no pair involving doc 2 may be."""
    from old_original_java_little_horse_spark.functions.dedup import (
        WINNOW_K, WINNOW_W, d_winnow_fingerprint_pairs,
    )
    from old_original_java_little_horse_spark.sources.parquet import TABLES

    run = " ".join(f"shared{i}" for i in range(WINNOW_K + WINNOW_W - 1))
    fill = lambda tag, n: " ".join(f"{tag}{i}" for i in range(n))  # noqa: E731
    docs = [
        (0, f"{fill('alpha', 7)} {run} {fill('beta', 12)}"),
        (1, f"{fill('gamma', 23)} {run} {fill('delta', 4)}"),
        (2, fill("omega", 40)),
    ]
    workdir = Path(tempfile.mkdtemp(prefix="winnow-guarantee-"))
    try:
        for t in TABLES:
            src = Path(SF_SMOKE) / f"{t}.parquet"
            if t != "documents" and src.exists():
                shutil.copy(src, workdir / f"{t}.parquet")
        df = spark.createDataFrame(
            [(i, txt, "en", "src0", len(txt)) for i, txt in docs],
            schema="doc_id long, text string, lang string, "
                   "source string, n_chars long")
        df.toPandas().to_parquet(workdir / "documents.parquet")

        pairs = {(r["doc_a"], r["doc_b"]): r["n_shared"]
                 for r in d_winnow_fingerprint_pairs(
                     spark, str(workdir)).collect()}
        # MIN_SHARED is 2; an exactly-(k+w-1)-length run guarantees ≥1
        # shared fingerprint, and this run's 4 k-grams span 1 window
        # on each side... the guarantee is ≥1, so check the posting
        # level too: with MIN_SHARED=2 the pair may legitimately need
        # the longer run below.  Assert no doc-2 pair ever appears.
        assert all(2 not in p for p in pairs), pairs
        # A run of k + 2w − 1 words (2 full windows) guarantees ≥2
        # shared fingerprints → must clear MIN_SHARED.
        run2 = " ".join(f"twice{i}" for i in range(WINNOW_K + 2 * WINNOW_W - 1))
        docs2 = [
            (0, f"{fill('alpha', 9)} {run2} {fill('beta', 3)}"),
            (1, f"{fill('gamma', 2)} {run2} {fill('delta', 17)}"),
            (2, fill("omega", 40)),
        ]
        df2 = spark.createDataFrame(
            [(i, txt, "en", "src0", len(txt)) for i, txt in docs2],
            schema="doc_id long, text string, lang string, "
                   "source string, n_chars long")
        df2.toPandas().to_parquet(workdir / "documents.parquet")
        pairs2 = {(r["doc_a"], r["doc_b"]): r["n_shared"]
                  for r in d_winnow_fingerprint_pairs(
                      spark, str(workdir)).collect()}
        assert (0, 1) in pairs2, pairs2
        assert pairs2[(0, 1)] >= 2
        assert all(2 not in p for p in pairs2), pairs2
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def test_grid_self_pairs_dedup_false_multiplicity(spark):
    """dedup=False contract: a pair sharing m buckets comes out m
    times — once per shared bucket, never per grid cell — and the
    bucket column is exposed so the caller can pick a winner by
    expression (the simhash first-matching-band pattern)."""
    from old_original_java_little_horse_spark.functions.dedup import (
        grid_self_pairs,
    )

    rows = [(1, "x"), (2, "x"), (1, "y"), (2, "y"), (3, "z")]
    sigs = spark.createDataFrame(rows, "doc_id long, bucket string")
    out = [(r["id_a"], r["id_b"], r["bucket"])
           for r in grid_self_pairs(sigs, ["bucket"],
                                    dedup=False).collect()]
    assert sorted(out) == [(1, 2, "x"), (1, 2, "y")]


def test_simhash_pairs_emit_each_pair_exactly_once(spark, edge_sf_dir):
    """First-matching-band replaces dropDuplicates: identical docs
    agree in ALL 4 band tables (and the exact-dup trio 10/11/13
    agrees everywhere), so a multiplicity bug would emit them up to
    4x.  Every output pair must appear exactly once."""
    specs = all_queries()
    rows = [(r["doc_a"], r["doc_b"])
            for r in specs["d_simhash_pairs"].fn(spark, edge_sf_dir).collect()]
    assert len(rows) == len(set(rows)), rows
    assert (10, 11) in rows  # the planted exact dup survives


def test_edit_segment_pairs_multiplicity_and_bound(spark, edge_sf_dir):
    """A pair sharing several aligned segments (exact dups share all
    nine) must come out once, with the true distance <= the bound."""
    specs = all_queries()
    rows = [(r["doc_a"], r["doc_b"], r["edit_dist"])
            for r in specs["d_edit_segment_pairs"].fn(
                spark, edge_sf_dir).collect()]
    pairs = [(a, b) for a, b, _ in rows]
    assert len(pairs) == len(set(pairs)), rows
    assert all(0 <= d <= 8 for _, _, d in rows)
    assert (10, 11, 0) in rows  # exact dup at distance 0
