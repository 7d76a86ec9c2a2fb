"""BPE padded-replace semantics vs exact Sennrich greedy.

A single boundary-padded `replace` consumes the shared separator, so
a run of ≥4 repeats of a winning pair's symbols would merge
alternating occurrences instead of strictly left-to-right.  These
tests prove the caveat is vacuous on the test corpora: the full
trainer trace and every word's final segmentation coincide with a
pure-Python exact-greedy implementation (and a synthetic adversarial
word shows where they would NOT — documenting the boundary)."""

from __future__ import annotations

from collections import Counter

import pandas as pd

from old_original_java_little_horse_spark.functions.corpus import (
    BPE_ENC_ROUNDS,
    BPE_ROUNDS,
    t_bpe_encode,
    t_bpe_merges,
)
from old_original_java_little_horse_spark.sources.parquet import load_table

from .conftest import SF_SMOKE


def _vocab(sf_dir: str) -> dict[tuple, int]:
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    c: Counter = Counter()
    for text in docs["text"]:
        for w in str(text).lower().split(" "):
            if w and w.isascii() and w.isalpha() and w == w.lower():
                c[tuple(w)] += 1
    return dict(c)


def _merge_exact(seq, a, b):
    """Sennrich's strict left-to-right non-overlapping application."""
    out, i = [], 0
    while i < len(seq):
        if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(seq[i])
            i += 1
    return tuple(out)


def _train_exact(vocab, rounds):
    v = {w: tuple(w) for w in vocab}
    trace = []
    for _ in range(rounds):
        c: Counter = Counter()
        for w, seq in v.items():
            n = vocab[w]
            for i in range(len(seq) - 1):
                c[(seq[i], seq[i + 1])] += n
        (a, b), cnt = min(c.items(),
                          key=lambda kv: (-kv[1], kv[0][0] + " " + kv[0][1]))
        trace.append((a + " " + b, cnt))
        v = {w: _merge_exact(seq, a, b) for w, seq in v.items()}
    return trace, v


def test_trainer_trace_is_exact_greedy(spark):
    vocab = _vocab(SF_SMOKE)
    expect, _ = _train_exact(vocab, BPE_ROUNDS)
    got = sorted((r["round"], r["pair"], r["cnt"])
                 for r in t_bpe_merges(spark, SF_SMOKE).collect())
    assert got == [(i + 1, p, c) for i, (p, c) in enumerate(expect)]


def test_encoder_counts_are_exact_greedy(spark):
    vocab = _vocab(SF_SMOKE)
    _, segmented = _train_exact(vocab, BPE_ENC_ROUNDS)
    tok = {"".join(w): len(seq) for w, seq in segmented.items()}

    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet",
                           columns=["doc_id", "text"])
    expect = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        words = [w for w in str(text).lower().split(" ") if "".join(w) in tok]
        if words:
            expect[int(doc_id)] = (len(words), sum(tok[w] for w in words))
    got = {int(r["doc_id"]): (r["n_words"], r["n_tokens"])
           for r in t_bpe_encode(spark, SF_SMOKE).collect()}
    assert got == expect


def test_padded_replace_divergence_boundary():
    """The documented caveat, made concrete: on 'aaaa' with merge
    (a, a), exact greedy yields [aa, aa] but a single padded replace
    leaves [aa, a, a] — the reason the docstrings scope their claim
    to corpora without ≥4 same-symbol runs (pinned above)."""
    exact = _merge_exact(tuple("aaaa"), "a", "a")
    assert exact == ("aa", "aa")
    padded = (" " + " ".join("aaaa") + " ").replace(" a a ", " aa ").strip()
    assert padded.split(" ") == ["aa", "a", "a"]
