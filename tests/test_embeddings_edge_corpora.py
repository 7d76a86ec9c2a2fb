"""Adversarial-corpus parity for the embedding-similarity family —
the vector twin of the documents/events edge corpora.

The generated embeddings are well-behaved gaussian-ish vectors; the
cross-engine risks live in what they never contain: the ZERO vector
(cosine's denominator), vectors that quantize to all-zeros, exact
duplicates, exact negations (cosine -1), one huge component, NULL
labels, and a NULL embedding row.  Every similarity query must still
hash-match its DuckDB oracle here.

The corpus keeps the real sf0.001 table and rewrites only the tail
(vec_id >= 489) plus one query vector, so the seed rows — IVF/k-means
vec_id 10..73, PQ codebook vec_id 10..137 — and the query set keep
their structure (a NULL embedding inside the seed ranges is a
different contract: IVF handles the gap sparsely, PQ raises).
"""
from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

import pytest

from old_original_java_little_horse_spark.registry import all_queries
from old_original_java_little_horse_spark.sources.parquet import TABLES

from .conftest import SF_SMOKE
from .oracle_compare import compare

DIM = 64

QUERIES = [
    "sim_topk_bruteforce", "sim_lsh_bucketed_ann",
    "sim_label_blocked_neardup", "sim_neardup_topk",
    "sim_ivf_ann", "sim_dup_clusters", "sim_kmeans_assign",
    "sim_pq_adc_topk", "sim_semantic_decontaminate",
    "sim_label_centroids",
]


@pytest.fixture(scope="module")
def edge_sf_dir(spark):
    import numpy as np
    import pandas as pd

    workdir = Path(tempfile.mkdtemp(prefix="edge-embeddings-"))
    try:
        for t in TABLES:
            src = Path(SF_SMOKE) / f"{t}.parquet"
            if t != "embeddings" and src.exists():
                shutil.copy(src, workdir / f"{t}.parquet")
        df = pd.read_parquet(Path(SF_SMOKE) / "embeddings.parquet")
        df = df.sort_values("vec_id").reset_index(drop=True)

        def setvec(vid, vec, label=None):
            i = df.index[df.vec_id == vid][0]
            df.at[i, "embedding"] = np.asarray(vec, dtype=np.float32)
            if label is not None:
                df.at[i, "label"] = label

        base = np.asarray(df.loc[df.vec_id == 493, "embedding"].iloc[0],
                          dtype=np.float32)
        setvec(9, [0.0] * DIM)                   # zero QUERY vector
        setvec(490, [0.0] * DIM)                 # zero corpus vector
        setvec(491, [0.0004] * DIM)              # quantizes to all-zeros
        setvec(492, base)                        # exact duplicate of 493
        df.loc[df.vec_id == 492, "label"] = int(
            df.loc[df.vec_id == 493, "label"].iloc[0])
        setvec(496, -base)                       # exact negation (cos -1)
        # One dominant component, inside EVERY consumer's quantization
        # domain (semantic-decontaminate squares dots, so |x| must stay
        # ~O(10) — see quantized()'s contract note).
        big = [0.001] * DIM
        big[7] = 10.0
        setvec(498, big)
        setvec(499, [0.5] * DIM)                 # constant vector
        # TWO NULL-label vectors with IDENTICAL embeddings: they share
        # every LSH bucket and verify at cosine 1.0, but a NULL label
        # must match NOTHING (join semantics) — a window formulation
        # that groups the NULL partition would pair them (the masked
        # r11 sim_neardup_topk bug; one NULL row alone can't catch it).
        setvec(494, base)
        setvec(495, base)
        df.loc[df.vec_id == 495, "label"] = None
        df.loc[df.vec_id == 494, "label"] = None
        df["label"] = df["label"].astype("Int64")
        emb = df["embedding"].astype(object)
        emb.loc[df.index[df.vec_id == 489][0]] = None
        df["embedding"] = emb
        df.to_parquet(workdir / "embeddings.parquet")
        yield str(workdir)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


@pytest.mark.parametrize("name", QUERIES)
def test_embeddings_edge_parity(spark, edge_sf_dir, name):
    specs = all_queries()
    res = compare(spark, edge_sf_dir, name, specs[name])
    assert res["ok"], res


def test_corpus_exercises_what_it_claims(spark, edge_sf_dir):
    import pyspark.sql.functions as F

    from old_original_java_little_horse_spark.sources.parquet import load_table

    e = load_table(spark, edge_sf_dir, "embeddings")
    rows = {r["vec_id"]: r for r in e.where(
        F.col("vec_id").isin(9, 489, 490, 492, 493, 494)).collect()}
    assert all(x == 0.0 for x in rows[9]["embedding"])
    assert rows[489]["embedding"] is None
    assert all(x == 0.0 for x in rows[490]["embedding"])
    assert list(rows[492]["embedding"]) == list(rows[493]["embedding"])
    assert rows[494]["label"] is None
