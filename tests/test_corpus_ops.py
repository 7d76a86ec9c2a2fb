"""Corpus-prep operators on a planted corpus: the driver's sf tables
contain no PII and no document longer than one chunk, so redaction
hits and multi-chunk explode paths only execute here.  Each query is
also oracle-parity-checked on this corpus (same harness as the
driver), catching regex-dialect or slice-semantics divergence that
zero-match data would hide."""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

import pytest

from old_original_java_little_horse_spark.registry import all_queries
from old_original_java_little_horse_spark.sources.parquet import TABLES

from .conftest import SF_SMOKE
from .oracle_compare import compare

LONG_DOC = " ".join(f"w{i:03d}" for i in range(150))   # 4 chunks (0,48,96,144)
EXACT_64 = " ".join(f"v{i:02d}" for i in range(64))    # 2 chunks (second = 16 words)

PLANTED_DOCS = [
    # (doc_id, text, lang, source)
    (0, "contact me at alice.smith+work@example.co.uk or bob@test.io today", "en", "src0"),
    (1, "server 10.0.255.3 and 192.168.1.1 replied; call 555-123-4567 or 555.987.6543", "en", "src0"),
    (2, "email user@123.45.67.89 style hosts should redact as email then ip", "en", "src0"),
    (3, LONG_DOC, "en", "src1"),
    (4, EXACT_64, "en", "src1"),
    (5, "short doc no pii", "en", "src1"),
    (6, "", "en", "src1"),
]

QUERIES = ["t_pii_redact", "t_doc_chunks", "t_hash_split",
           "t_top_ngrams", "t_distinctive_terms"]


@pytest.fixture(scope="module")
def planted_sf_dir(spark):
    workdir = Path(tempfile.mkdtemp(prefix="corpus-ops-"))
    try:
        for t in TABLES:
            src = Path(SF_SMOKE) / f"{t}.parquet"
            if t != "documents" and src.exists():
                shutil.copy(src, workdir / f"{t}.parquet")
        df = spark.createDataFrame(
            [(i, txt, lang, src, len(txt)) for i, txt, lang, src in PLANTED_DOCS],
            schema="doc_id long, text string, lang string, source string, n_chars long",
        )
        df.toPandas().to_parquet(workdir / "documents.parquet")
        yield str(workdir)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


@pytest.mark.parametrize("name", QUERIES)
def test_planted_corpus_parity(spark, planted_sf_dir, name):
    specs = all_queries()
    res = compare(spark, planted_sf_dir, name, specs[name])
    assert res["ok"], res


def test_pii_redaction_semantics(spark, planted_sf_dir):
    specs = all_queries()
    rows = {r["doc_id"]: r for r in
            specs["t_pii_redact"].fn(spark, planted_sf_dir).collect()}
    assert rows[0]["n_emails"] == 2
    assert "<EMAIL>" in rows[0]["clean_text"]
    assert "alice" not in rows[0]["clean_text"]
    assert rows[1]["n_ips"] == 2 and rows[1]["n_phones"] == 2
    assert rows[1]["clean_text"].count("<IP>") == 2
    assert rows[1]["clean_text"].count("<PHONE>") == 2
    # email@ip-looking-host: the email pattern requires an alphabetic
    # TLD, so user@123.45.67.89 is NOT an email match — the IP pass
    # takes the quad and the local part survives as user@<IP>.
    assert "user@<IP>" in rows[2]["clean_text"]
    assert rows[5]["clean_text"] == "short doc no pii"


def test_chunking_semantics(spark, planted_sf_dir):
    specs = all_queries()
    rows = [r for r in specs["t_doc_chunks"].fn(spark, planted_sf_dir).collect()
            if r["doc_id"] == 3]
    by_idx = {r["chunk_idx"]: r for r in rows}
    assert sorted(by_idx) == [0, 1, 2, 3]
    assert by_idx[0]["n_tokens"] == 64
    assert by_idx[0]["chunk_text"].startswith("w000")
    assert by_idx[1]["chunk_text"].startswith("w048")  # 16-word overlap
    assert by_idx[3]["n_tokens"] == 150 - 144          # short tail kept
    # every word of the doc appears in at least one chunk
    covered = set(w for r in rows for w in r["chunk_text"].split(" "))
    assert covered == set(LONG_DOC.split(" "))
    # exactly-64-word doc: full chunk + 16-word overlap tail
    rows64 = sorted((r["chunk_idx"], r["n_tokens"]) for r in
                    specs["t_doc_chunks"].fn(spark, planted_sf_dir).collect()
                    if r["doc_id"] == 4)
    assert rows64 == [(0, 64), (1, 16)]


def test_hash_split_is_stable_and_complete(spark, planted_sf_dir):
    specs = all_queries()
    a = sorted(tuple(r) for r in specs["t_hash_split"].fn(spark, planted_sf_dir).collect())
    b = sorted(tuple(r) for r in specs["t_hash_split"].fn(spark, planted_sf_dir).collect())
    assert a == b  # deterministic across runs
    assert {r[2] for r in a} <= {"train", "val", "test"}


def test_bloom_screen_is_superset_of_exact(spark):
    """The Bloom decontamination screen may over-flag (false positives
    by design) but must NEVER under-flag: every doc the exact op finds
    contaminated appears in the Bloom output with n_flagged >= its
    exact n_hits — the property that makes screen-then-confirm sound."""
    Q = all_queries()
    exact = {r["doc_id"]: r["n_hits"]
             for r in Q["t_decontaminate"].fn(spark, SF_SMOKE).collect()}
    bloom = {r["doc_id"]: r["n_flagged"]
             for r in Q["t_decontaminate_bloom"].fn(spark, SF_SMOKE).collect()}
    assert exact, "planted corpus should have contamination"
    for doc_id, n_hits in exact.items():
        assert doc_id in bloom, f"exact-contaminated doc {doc_id} not screened"
        assert bloom[doc_id] >= n_hits, (doc_id, bloom[doc_id], n_hits)
