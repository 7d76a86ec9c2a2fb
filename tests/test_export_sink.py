"""Training-shard export sink: directory layout, determinism, and
content parity with the registered operators it composes."""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

import pytest

from old_original_java_little_horse_spark.registry import all_queries
from old_original_java_little_horse_spark.sinks.export import (
    curated_chunks, export_corpus,
)

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def exported(spark):
    out = Path(tempfile.mkdtemp(prefix="shards-")) / "corpus"
    try:
        export_corpus(spark, SF_SMOKE, str(out), max_records_per_file=200)
        yield out
    finally:
        shutil.rmtree(out.parent, ignore_errors=True)


def test_layout_is_hive_partitioned_by_split(exported):
    splits = sorted(p.name for p in exported.iterdir() if p.is_dir())
    assert splits and all(s.startswith("split=") for s in splits), splits
    assert "split=train" in splits  # 80% bucket — always present


def test_roundtrip_matches_pipeline(spark, exported):
    back = spark.read.parquet(str(exported))
    want = curated_chunks(spark, SF_SMOKE)
    assert back.count() == want.count()
    assert set(back.columns) == set(want.columns)
    # one row per (doc_id, chunk_idx) of every split-assigned document
    n_chunks = all_queries()["t_doc_chunks"].fn(spark, SF_SMOKE).count()
    assert back.count() == n_chunks


def test_export_is_deterministic(spark, exported):
    """Re-exporting produces byte-identical row content (sorted file
    layout → reproducible shards)."""
    out2 = Path(tempfile.mkdtemp(prefix="shards2-")) / "corpus"
    try:
        export_corpus(spark, SF_SMOKE, str(out2), max_records_per_file=200)
        a = sorted(map(tuple, spark.read.parquet(str(exported)).collect()))
        b = sorted(map(tuple, spark.read.parquet(str(out2)).collect()))
        assert a == b
    finally:
        shutil.rmtree(out2.parent, ignore_errors=True)


def test_redaction_preserves_word_count(spark):
    """`curated_chunks` inner-joins clean-text chunks to raw-text chunk
    accounting on (doc_id, chunk_idx) — lossless only if redaction
    never changes the whitespace-word count.  It can't: every PII
    pattern matches inside a single whitespace word (no space can
    occur in a match) and the replacement tokens contain no spaces.
    Assert it on the whole corpus so a future pattern edit that breaks
    the invariant fails here, not as silently dropped chunks."""
    import pyspark.sql.functions as F

    from old_original_java_little_horse_spark.functions.corpus import t_pii_redact
    from old_original_java_little_horse_spark.sources.parquet import load_table

    raw = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    clean = t_pii_redact(spark, SF_SMOKE).select("doc_id", "clean_text")
    mismatched = (
        raw.join(clean, "doc_id")
        .where(F.size(F.split("text", " ")) != F.size(F.split("clean_text", " ")))
    )
    assert mismatched.isEmpty()


def test_chunk_join_is_lossless(spark):
    """Every raw-text chunk row survives the clean-text re-chunk join
    (the direct consequence of the word-count invariant)."""
    n_raw = all_queries()["t_doc_chunks"].fn(spark, SF_SMOKE).count()
    assert curated_chunks(spark, SF_SMOKE).count() == n_raw


def test_shard_size_bounded(spark, exported):
    files = list(exported.glob("split=*/*.parquet"))
    assert files
    import pyarrow.parquet as pq
    for f in files:
        assert pq.ParquetFile(f).metadata.num_rows <= 200, f
