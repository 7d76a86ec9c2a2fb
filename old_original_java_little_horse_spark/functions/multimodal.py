"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The container has no image/audio codecs, so the *decode* step is a
clearly-marked deterministic fake (`fake_decode_meta`), but the
Spark-side plumbing is real and what matters at 100 TB: binary
columns move as Arrow buffers into `mapInPandas` batches, metadata
extraction is schema-typed, and the pipeline stays per-partition
(no shuffle).  Swap `fake_decode_meta` for a PIL/ffmpeg call and
nothing else changes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType,
)

from ..registry import query
from ..sources.parquet import load_table

DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("byte_len", LongType()),
        StructField("content_md5", StringType()),
        StructField("fake_width", LongType()),
        StructField("fake_height", LongType()),
        StructField("fake_n_frames", LongType()),
    ]
)


def fake_decode_meta(payload: bytes) -> dict:
    """STUB for the real decoder (PIL / ffmpeg are not installed).

    Deterministic pure function of the bytes so the DuckDB oracle can
    reproduce it: "width/height/frames" derive from byte length.  A
    real deployment replaces this body with e.g.::

        img = PIL.Image.open(io.BytesIO(payload))   # real decode
        return {"width": img.width, ...}
    """
    n = len(payload)
    return {
        "byte_len": n,
        "content_md5": hashlib.md5(payload).hexdigest(),
        "fake_width": 64 + (n % 577),
        "fake_height": 64 + (n % 311),
        "fake_n_frames": 1 + (n % 24),
    }


def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: Arrow batches of (doc_id, payload) →
    metadata rows.  Per-partition, no shuffle; batch size is bounded
    by spark.sql.execution.arrow.maxRecordsPerBatch so executor
    memory holds only one batch of binaries at a time."""
    for pdf in batches:
        out = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            meta = fake_decode_meta(bytes(payload))
            meta["doc_id"] = doc_id
            out.append(meta)
        yield pd.DataFrame(out, columns=[f.name for f in DECODE_SCHEMA.fields])


@query(
    "mm_metadata_extract",
    oracle="""
SELECT doc_id,
       strlen(text)                      AS byte_len,
       md5(text)                         AS content_md5,
       64 + (strlen(text) % 577)         AS fake_width,
       64 + (strlen(text) % 311)         AS fake_height,
       1 + (strlen(text) % 24)           AS fake_n_frames
FROM documents
""",
)
def mm_metadata_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary ingest → mapInPandas decode → typed metadata table.

    The documents' text bytes stand in for image/audio payloads (the
    testdata has no binary column); the decode itself is the stub.
    The oracle recomputes the stub's arithmetic in SQL — proving the
    Arrow plumbing (binary column → pandas bytes → typed rows) is
    lossless.
    """
    from ..session import ship_package

    ship_package(spark)  # workers must import this module to unpickle
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    return d.mapInPandas(decode_batches, schema=DECODE_SCHEMA)
