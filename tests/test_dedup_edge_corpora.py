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
]

QUERIES = [
    "d_exact_dedup", "d_minhash_signatures", "d_minhash_lsh_pairs",
    "d_ngram_jaccard_pairs", "d_simhash", "d_simhash_pairs",
    "d_dup_clusters", "d_dedup_canonical",
    "t_lang_id", "t_quality_score", "t_token_count", "t_fingerprint",
    "t_corpus_stats",
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
            [(i, txt, lang, src, len(txt)) for i, txt, lang, src in EDGE_DOCS],
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
