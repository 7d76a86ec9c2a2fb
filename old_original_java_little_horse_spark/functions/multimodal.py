"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The container has no image/audio codecs, so the *decode* step is a
clearly-marked deterministic fake (`fake_decode_meta`), but the
Spark-side plumbing is real and what matters at 100 TB: binary
columns move as Arrow buffers into `mapInPandas` batches, metadata
extraction is schema-typed, and the pipeline stays per-partition
(no shuffle).  Swap `fake_decode_meta` for a PIL/ffmpeg call and
nothing else changes.

Byte-exactness: every operator here slices BYTES of the encoded
payload, never characters, and the oracles mirror that with
DuckDB's strlen (bytes) and hex(encode(text)) slice arithmetic (2
hex chars per byte) — one multi-byte UTF-8 character must not shift
a window.  Because DuckDB's md5 only takes VARCHAR (a raw byte slice
may not be valid UTF-8), slice digests are md5-of-uppercase-hex on
BOTH sides (`_hex_md5`), which is bijectively equivalent to hashing
the bytes.  `tests/test_multimodal_bytes.py` proves parity on a
planted corpus of 2/3/4-byte UTF-8 at every window boundary.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
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


# Feature-detect the real image codec once per interpreter (the module
# is shipped to Python workers, so each worker evaluates this at
# import — every row in a worker sees the same decoder).
try:
    from PIL import Image as _PILImage  # noqa: N812

    _HAS_PIL = True
except ImportError:
    _PILImage = None
    _HAS_PIL = False


def _hex_md5(b: bytes) -> str:
    """Digest of a byte slice computable by a VARCHAR-only md5:
    md5 of the uppercase hex expansion (DuckDB: md5(hex(blob)))."""
    return hashlib.md5(b.hex().upper().encode("ascii")).hexdigest()


def fake_decode_meta(payload: bytes) -> dict:
    """STUB decoder: deterministic pure function of the bytes so the
    DuckDB oracle can reproduce it — "width/height/frames" derive from
    byte length."""
    n = len(payload)
    return {
        "byte_len": n,
        "content_md5": hashlib.md5(payload).hexdigest(),
        "fake_width": 64 + (n % 577),
        "fake_height": 64 + (n % 311),
        "fake_n_frames": 1 + (n % 24),
    }


def decode_meta(payload: bytes) -> dict:
    """Feature-detected decode: PIL when importable AND the bytes are a
    decodable image; the deterministic stub otherwise.

    The registered queries feed text bytes (the testdata has no binary
    column), which no codec accepts — so their oracles mirror the stub
    arithmetic whether or not PIL is installed.  Real image payloads
    take the real branch when the codec exists
    (`tests/test_multimodal_decode.py` exercises it with a handcrafted
    BMP)."""
    if _HAS_PIL:
        import io

        try:
            with _PILImage.open(io.BytesIO(payload)) as img:
                return {
                    "byte_len": len(payload),
                    "content_md5": hashlib.md5(payload).hexdigest(),
                    "fake_width": img.width,
                    "fake_height": img.height,
                    "fake_n_frames": getattr(img, "n_frames", 1),
                }
        except Exception:
            pass  # not an image these codecs know → stub
    return fake_decode_meta(payload)


def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: Arrow batches of (doc_id, payload) →
    metadata rows.  Per-partition, no shuffle; batch size is bounded
    by spark.sql.execution.arrow.maxRecordsPerBatch so executor
    memory holds only one batch of binaries at a time."""
    for pdf in batches:
        out = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            meta = decode_meta(bytes(payload))
            meta["doc_id"] = doc_id
            out.append(meta)
        yield pd.DataFrame(out, columns=[f.name for f in DECODE_SCHEMA.fields])


@query(
    "mm_metadata_extract",
    oracle="""
SELECT doc_id,
       strlen(text)                      AS byte_len,
       md5(text)                               AS content_md5,
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


FRAME_STEP = 4  # sample every 4th frame

FRAME_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("frame_idx", LongType()),
    StructField("frame_len", LongType()),
    StructField("frame_md5", StringType()),
])


def frame_sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: each payload explodes into its sampled
    frames (1 input row → ceil(n_frames/STEP) output rows) — the
    frame-extraction batch shape: output rows never buffer more than
    one Arrow batch of payloads, and the explode happens worker-side
    so frame bytes are never shuffled unexploded."""
    for pdf in batches:
        out = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            b = bytes(payload)
            n = len(b)
            n_frames = 1 + (n % 24)          # fake_decode_meta's frame count
            chunk = max(n // n_frames, 1)
            for idx in range(0, n_frames, FRAME_STEP):
                frame = b[idx * chunk: idx * chunk + chunk]
                out.append({"doc_id": doc_id, "frame_idx": idx,
                            "frame_len": len(frame),
                            "frame_md5": _hex_md5(frame)})
        yield pd.DataFrame(out, columns=[f.name for f in FRAME_SCHEMA.fields])


@query(
    "mm_frame_sample",
    oracle=f"""
WITH m AS (
  SELECT doc_id, hex(encode(text)) AS p, strlen(text) AS n,
         1 + (strlen(text) % 24) AS n_frames,
         greatest(strlen(text) // (1 + (strlen(text) % 24)), 1)
           AS chunk
  FROM documents
), f AS (
  SELECT doc_id, p, chunk,
         unnest(generate_series(0, n_frames - 1, {FRAME_STEP})) AS frame_idx
  FROM m
)
SELECT doc_id, frame_idx,
       strlen(substr(p, 1 + 2 * frame_idx * chunk, 2 * chunk)) // 2
         AS frame_len,
       md5(substr(p, 1 + 2 * frame_idx * chunk, 2 * chunk)) AS frame_md5
FROM f
""",
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over "video" payloads: decode (stub) → every
    {FRAME_STEP}th frame as its own row with the frame bytes' digest.
    The real thing swaps the byte-slice for an ffmpeg seek-and-decode;
    the Spark shape — binary → mapInPandas → per-frame rows, no
    shuffle until a downstream aggregation — is what must scale.  The
    oracle slices the hex expansion of the ENCODED bytes (2 hex chars
    per byte), so offsets are byte-exact for any UTF-8 payload; frame
    digests are md5-of-hex on both sides (module docstring)."""
    from ..session import ship_package

    ship_package(spark)
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    return d.mapInPandas(frame_sample_batches, schema=FRAME_SCHEMA)


RESIZE_TARGET = 4096  # center-crop length (stand-in for a WxH resize)

RESIZE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("out_len", LongType()),
    StructField("resized_md5", StringType()),
])


def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: binary → binary transform (center crop to
    RESIZE_TARGET bytes) — the resize/transcode batch shape: payloads
    in, same-cardinality transformed payloads out, per-partition."""
    for pdf in batches:
        out = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            b = bytes(payload)
            n = len(b)
            target = min(n, RESIZE_TARGET)
            start = (n - target) // 2
            cropped = b[start: start + target]
            out.append({"doc_id": doc_id, "out_len": len(cropped),
                        "resized_md5": _hex_md5(cropped)})
        yield pd.DataFrame(out, columns=[f.name for f in RESIZE_SCHEMA.fields])


@query(
    "mm_resize_crop",
    oracle=f"""
WITH m AS (
  SELECT doc_id, hex(encode(text)) AS p,
         strlen(text) AS n,
         least(strlen(text), {RESIZE_TARGET}) AS target
  FROM documents
)
SELECT doc_id,
       target AS out_len,
       md5(substr(p, 1 + 2 * ((n - target) // 2), 2 * target))
         AS resized_md5
FROM m
""",
)
def mm_resize_crop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize-shaped binary transform (center crop): a PIL
    `img.resize()` drop-in would change only the worker body — the
    plumbing (binary in, binary-derived row out, Arrow-batched,
    shuffle-free) is the part under test, and the oracle proves the
    byte arithmetic round-trips losslessly on the hex expansion of
    the encoded payload (byte-exact for any UTF-8 text)."""
    from ..session import ship_package

    ship_package(spark)
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    return d.mapInPandas(resize_batches, schema=RESIZE_SCHEMA)


AUDIO_WIN = 256    # bytes per window (stand-in for e.g. 30 s of PCM)
AUDIO_STRIDE = 192 # 25% overlap — the ASR-chunking shape

AUDIO_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("win_idx", LongType()),
    StructField("start_byte", LongType()),
    StructField("win_len", LongType()),
    StructField("win_md5", StringType()),
])


def audio_window_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: each payload explodes into OVERLAPPING
    fixed-size windows (stride < size — consecutive windows share
    bytes, the chunking every ASR/audio-embedding pipeline feeds its
    model).  Same no-shuffle explode shape as frame sampling; overlap
    means output bytes exceed input bytes by size/stride, which is why
    the explode must stay worker-side and windows must flow straight
    into the next per-partition stage instead of being shuffled."""
    for pdf in batches:
        out = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            b = bytes(payload)
            n = len(b)
            for w in range((max(n - 1, 0)) // AUDIO_STRIDE + 1):
                start = w * AUDIO_STRIDE
                win = b[start: start + AUDIO_WIN]
                out.append({"doc_id": doc_id, "win_idx": w,
                            "start_byte": start, "win_len": len(win),
                            "win_md5": _hex_md5(win)})
        yield pd.DataFrame(out, columns=[f.name for f in AUDIO_SCHEMA.fields])


@query(
    "mm_audio_windows",
    oracle=f"""
WITH m AS (
  SELECT doc_id, hex(encode(text)) AS p, strlen(text) AS n
  FROM documents
), w AS (
  SELECT doc_id, p, n,
         unnest(generate_series(0, (greatest(n - 1, 0)) // {AUDIO_STRIDE}))
           AS win_idx
  FROM m
)
SELECT doc_id, win_idx,
       win_idx * {AUDIO_STRIDE} AS start_byte,
       strlen(substr(p, 1 + 2 * win_idx * {AUDIO_STRIDE}, 2 * {AUDIO_WIN})) // 2
         AS win_len,
       md5(substr(p, 1 + 2 * win_idx * {AUDIO_STRIDE}, 2 * {AUDIO_WIN}))
         AS win_md5
FROM w
""",
)
def mm_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping-window chunking over "audio" payloads ({AUDIO_WIN}-
    byte windows, {AUDIO_STRIDE}-byte stride): the decode-and-chunk
    front of every speech pipeline.  Differs from `mm_frame_sample` in
    the property that matters at scale: windows OVERLAP, so output
    volume is input x (size/stride) — the explode stays worker-side in
    one mapInPandas pass and nothing re-shuffles the duplicated bytes.
    Oracle reproduces the byte arithmetic on the hex expansion of the
    encoded payload — byte-exact for any UTF-8 text (module
    docstring)."""
    from ..session import ship_package

    ship_package(spark)
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    return d.mapInPandas(audio_window_batches, schema=AUDIO_SCHEMA)


SHARD_BYTES = 65_536  # target training-shard payload size


@query(
    "mm_shard_assign",
    oracle=f"""
WITH sized AS (
  SELECT doc_id, source, strlen(text) AS n_bytes FROM documents
), packed AS (
  SELECT doc_id, source, CAST(n_bytes AS BIGINT) AS n_bytes,
         CAST(SUM(n_bytes) OVER (PARTITION BY source ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) - n_bytes
              AS BIGINT) AS start_off
  FROM sized
)
SELECT doc_id, source, n_bytes,
       start_off // {SHARD_BYTES} AS shard_id,
       start_off % {SHARD_BYTES}  AS shard_offset
FROM packed
ORDER BY source, doc_id
""",
)
def mm_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Size-based shard packing for blob export — the manifest step
    that turns a corpus of variable-size payloads into ~{SHARD_BYTES}-
    byte training shards (webdataset/TFRecord style), one deterministic
    (shard_id, shard_offset) per document.

    Packing rule: blobs are laid end-to-end in (source, doc_id) order
    and a blob belongs to the shard where it STARTS (start-offset
    floor-division), so assignment is a pure function of the running
    sum — no bin-packing heuristics, replay-stable, and append-only
    friendly (new docs never move old ones).

    Scale shape: ONE exchange on `source`, then an in-partition sort +
    running sum (window with ROWS UNBOUNDED PRECEDING is streaming-
    evaluated, O(1) state).  Parallelism is per-source here; at 100 TB
    the partition key becomes (source, date_bucket) so no single
    source serializes, at the cost of shard ids scoped per bucket —
    the same trade every sharded export makes."""
    return _pack_manifest(load_table(spark, sf_dir, "documents"))


def _pack_manifest(d: DataFrame) -> DataFrame:
    """The packing rule shared by full assignment and extension."""
    w = (Window.partitionBy("source").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    # octet_length: the manifest describes ENCODED payload bytes, and
    # the DuckDB oracle's strlen counts bytes — F.length would count
    # characters and drift on the first non-ASCII document.
    sized = d.select("doc_id", "source",
                     F.octet_length("text").cast("long").alias("n_bytes"))
    packed = sized.withColumn(
        "start_off", (F.sum("n_bytes").over(w) - F.col("n_bytes"))
        .cast("long"))
    # No output orderBy: the manifest is keyed, a presentation sort
    # would add a range exchange for nothing.
    return packed.select(
        "doc_id", "source", "n_bytes",
        F.expr(f"start_off div {SHARD_BYTES}").alias("shard_id"),
        (F.col("start_off") % SHARD_BYTES).alias("shard_offset"))


mm_shard_assign.__doc__ = mm_shard_assign.__doc__.replace(
    "{SHARD_BYTES}", str(SHARD_BYTES))


@query(
    "mm_shard_extend",
    oracle=f"""
WITH bounds AS (
  SELECT (MIN(doc_id) + MAX(doc_id)) // 2 AS cut FROM documents
), sized AS (
  SELECT doc_id, source, strlen(text) AS n_bytes FROM documents
), packed AS (
  SELECT doc_id, source, CAST(n_bytes AS BIGINT) AS n_bytes,
         CAST(SUM(n_bytes) OVER (PARTITION BY source ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) - n_bytes
              AS BIGINT) AS start_off
  FROM sized
)
SELECT doc_id, source, n_bytes,
       start_off // {SHARD_BYTES} AS shard_id,
       start_off % {SHARD_BYTES}  AS shard_offset
FROM packed, bounds
WHERE doc_id > cut
""",
)
def mm_shard_extend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental manifest maintenance: the corpus is split at the
    deterministic midpoint doc_id, the FIRST half is packed into a
    manifest (`mm_shard_assign` rule), and the second half is
    appended with `extend_shard_assign` — O(new docs) work plus one
    |sources|-row tail-offset broadcast, never re-reading the old
    manifest's rows.

    The oracle is the FULL recompute restricted to the appended docs,
    so the hash gate independently asserts the load-bearing property:
    extending == recomputing, because assignment is a pure function
    of the per-source running sum (append-only friendly by
    construction).  At 100 TB this is the difference between a daily
    manifest job that scans the delta and one that scans the
    corpus."""
    d = load_table(spark, sf_dir, "documents")
    lo, hi = d.agg(F.min("doc_id"), F.max("doc_id")).first()
    if lo is None:  # empty corpus: an empty manifest extended by nothing
        empty = d.where(F.lit(False))
        return extend_shard_assign(_pack_manifest(empty), empty)
    cut = (int(lo) + int(hi)) // 2
    manifest = _pack_manifest(d.where(F.col("doc_id") <= cut))
    return extend_shard_assign(manifest, d.where(F.col("doc_id") > cut))


def extend_shard_assign(manifest: DataFrame, new_docs: DataFrame,
                        shard_bytes: int = SHARD_BYTES) -> DataFrame:
    """Incremental manifest maintenance: assign shards to NEW docs
    without touching (or reading all of) the existing manifest.

    Because assignment is a pure function of the per-source running
    sum (`mm_shard_assign`), extending the corpus only needs each
    source's TAIL offset — a |sources|-row aggregate of the existing
    manifest, broadcast onto the new docs' running sums.  Appending is
    O(new docs) + one tiny broadcast, not a recompute of the manifest;
    `tests/test_retrieval_shard_props.py` proves extend == full
    recompute.  Precondition (enforced): new doc_ids sort after every
    existing doc_id of their source, the same append-only contract the
    packing rule itself assumes.

    .. note:: **Error contract (changed in round 6).**  The
       append-only check is LAZY: it rides the returned plan as a
       `raise_error` column on both shard columns and fires at action
       time on the first violating row, surfacing as a Spark
       ``SparkRuntimeException`` (via Py4J) — NOT the eager
       ``ValueError`` earlier rounds raised at call time.  Callers
       that caught ``ValueError`` must catch the Spark exception at
       their first action instead.  A consumer whose projection prunes
       BOTH ``shard_id`` and ``shard_offset`` skips the check along
       with the work it guards — acceptable because an assignment the
       caller never reads cannot corrupt the manifest; validate
       eagerly yourself if you need the guarantee without reading.
    """
    tails = (manifest.groupBy("source")
             .agg(F.max("doc_id").alias("max_doc_id"),
                  F.sum("n_bytes").alias("tail_off")))
    w = (Window.partitionBy("source").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    sized = new_docs.select(
        "doc_id", "source",
        F.octet_length("text").cast("long").alias("n_bytes"))
    packed = (sized.join(F.broadcast(tails), "source", "left")
              .withColumn("tail_off", F.coalesce("tail_off", F.lit(0)))
              .withColumn("start_off",
                          (F.sum("n_bytes").over(w) - F.col("n_bytes")
                           + F.col("tail_off")).cast("long")))
    # The contract check rides the returned plan (raise_error fires
    # at action time on the first violating row) instead of an eager
    # isEmpty() probe — the probe executed the whole broadcast-join +
    # window pipeline once for the check and again when the manifest
    # was consumed, doubling the O(new docs) cost per call.  It is
    # attached to BOTH derived columns, so any consumer that reads an
    # assignment (the manifest's entire point) trips it; a projection
    # that prunes both shard columns (e.g. bare doc_id counts) skips
    # the check along with the work it guards — lazy-check semantics,
    # documented here on purpose.  Surfaces as a Spark
    # SparkRuntimeException (raise_error), not ValueError.
    violated = (F.col("max_doc_id").isNotNull()
                & (F.col("doc_id") <= F.col("max_doc_id")))
    err = F.raise_error(F.concat(
        F.lit("append-only contract violated: new doc_id "),
        F.col("doc_id").cast("string"),
        F.lit(" not after the existing tail of source "),
        F.col("source")))
    shard_id = F.when(violated, err).otherwise(
        F.expr(f"start_off div {shard_bytes}"))
    shard_offset = F.when(violated, err).otherwise(
        F.col("start_off") % shard_bytes)
    return packed.select(
        "doc_id", "source", "n_bytes",
        shard_id.alias("shard_id"),
        shard_offset.alias("shard_offset"))
