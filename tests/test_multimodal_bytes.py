"""Byte-exactness of the multimodal family on NON-ASCII payloads.

The driver's sf corpora are pure ASCII, where character and byte
offsets coincide — so they cannot catch a char-vs-byte divergence
between the Spark workers (which slice encoded bytes) and the DuckDB
oracles.  This plants documents with multi-byte UTF-8 (and texts
sized to straddle every window/frame/crop boundary) and runs the
same oracle-parity compare the driver runs."""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

import pytest

from old_original_java_little_horse_spark.registry import all_queries
from old_original_java_little_horse_spark.sources.parquet import TABLES

from .conftest import SF_SMOKE
from .oracle_compare import compare

# é = 2 bytes, 漢 = 3 bytes, 🎵 = 4 bytes: every UTF-8 width, at sizes
# that cross the AUDIO (256/192) and RESIZE (4096) boundaries and land
# multi-byte chars ON the boundaries.
PLANTED = [
    (0, "café " * 60, "fr", "src0"),                   # 360 bytes, 2-byte chars
    (1, "漢字テスト " * 40, "ja", "src0"),              # >500 bytes, 3-byte chars
    (2, "a🎵" * 130, "en", "src1"),                     # 650 bytes, 4-byte chars
    (3, "mixed café 漢 🎵 ascii tail " * 160, "en", "src1"),  # > RESIZE_TARGET
    (4, "plain ascii control doc", "en", "src1"),
    (5, "é", "fr", "src2"),                             # single 2-byte char
    (6, "", "en", "src2"),
]

QUERIES = ["mm_metadata_extract", "mm_frame_sample", "mm_resize_crop",
           "mm_audio_windows", "mm_shard_assign"]


@pytest.fixture(scope="module")
def nonascii_sf_dir(spark):
    workdir = Path(tempfile.mkdtemp(prefix="mm-bytes-"))
    try:
        for t in TABLES:
            src = Path(SF_SMOKE) / f"{t}.parquet"
            if t != "documents" and src.exists():
                shutil.copy(src, workdir / f"{t}.parquet")
        df = spark.createDataFrame(
            [(i, txt, lang, src, len(txt)) for i, txt, lang, src in PLANTED],
            schema="doc_id long, text string, lang string, source string, n_chars long",
        )
        df.toPandas().to_parquet(workdir / "documents.parquet")
        yield str(workdir)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


@pytest.mark.parametrize("name", QUERIES)
def test_nonascii_parity(spark, nonascii_sf_dir, name):
    specs = all_queries()
    r = compare(spark, nonascii_sf_dir, name, specs[name])
    assert r["ok"], r


def test_planted_bytes_really_exceed_chars(spark, nonascii_sf_dir):
    """Guard the fixture: the corpus must contain docs whose byte
    length differs from the char length, or the parity test above
    proves nothing."""
    import pyspark.sql.functions as F

    from old_original_java_little_horse_spark.sources.parquet import load_table

    d = load_table(spark, nonascii_sf_dir, "documents")
    n = d.where(F.octet_length("text") != F.length("text")).count()
    assert n >= 5, n
