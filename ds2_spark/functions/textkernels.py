"""Pure-NumPy text kernels shared by the Spark pandas-UDF stages and
the test oracles.

Everything here is deterministic (no RNG at inference, fixed training
seed) and vectorized: strings become byte arrays, n-grams become
sliding windows, hashing is a polynomial rolling hash in uint64 —
no per-character Python in the hot loop.

These replace the reference's GPU model stages with deterministic
equivalents, per BASELINE.json north_rule:
  - langid  ≙ fastText language ID      (hashed byte-n-gram multinomial NB)
  - ppl     ≙ KN-smoothed LM perplexity (absolute-discount byte-trigram LM)
  - embed   ≙ BGE sentence embedding    (hashed n-gram TF, L2-normalized;
              reference: score_curation/docta/core/preprocess.py:33-84)
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from .corpus import LANGS, training_text

HASH_MULT = np.uint64(1000003)
LANGID_BUCKETS = 1 << 15
PPL_BUCKETS = 1 << 18
EMBED_DIM_DEFAULT = 128


def _byte_ngram_hashes(data: np.ndarray, n: int) -> np.ndarray:
    """Polynomial hashes of all n-grams of a uint8 byte array (uint64,
    wrapping overflow — deterministic everywhere)."""
    if len(data) < n:
        return np.empty(0, dtype=np.uint64)
    win = np.lib.stride_tricks.sliding_window_view(data, n).astype(np.uint64)
    pows = HASH_MULT ** np.arange(n - 1, -1, -1, dtype=np.uint64)
    return (win * pows).sum(axis=1, dtype=np.uint64)


def ngram_buckets(text: str, ns: tuple[int, ...], buckets: int) -> np.ndarray:
    """Bucket ids of all byte n-grams (for every n in ns) of `text`."""
    data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    hs = [_byte_ngram_hashes(data, n) + np.uint64(0x9E3779B9 * n) for n in ns]
    all_h = np.concatenate(hs) if hs else np.empty(0, dtype=np.uint64)
    return (all_h % np.uint64(buckets)).astype(np.int64)


# ---------------------------------------------------------------- langid

@lru_cache(maxsize=1)
def langid_model() -> tuple[np.ndarray, tuple[str, ...]]:
    """Train a multinomial-NB language classifier over hashed byte
    1/2/3-grams of the embedded corpora. Returns (log-prob matrix of
    shape [n_langs, LANGID_BUCKETS], langs)."""
    counts = np.ones((len(LANGS), LANGID_BUCKETS), dtype=np.float64)  # +1 smoothing
    for li, lang in enumerate(LANGS):
        for sent in training_text(lang):
            b = ngram_buckets(sent, (1, 2, 3), LANGID_BUCKETS)
            np.add.at(counts[li], b, 1.0)
    logp = np.log(counts / counts.sum(axis=1, keepdims=True))
    return logp.astype(np.float32), LANGS


def langid_scores(texts: "list[str] | np.ndarray") -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-text (lang_index, margin, top_logp_per_char).

    margin = (top1 − top2) mean log-prob per n-gram — the calibrated
    confidence signal used by the keep/drop rules.
    """
    logp, _ = langid_model()
    n = len(texts)
    idx = np.zeros(n, dtype=np.int64)
    margin = np.zeros(n, dtype=np.float64)
    top = np.full(n, -99.0, dtype=np.float64)
    for i, t in enumerate(texts):
        if not t:
            continue
        b = ngram_buckets(t, (1, 2, 3), LANGID_BUCKETS)
        if len(b) == 0:
            continue
        scores = logp[:, b].sum(axis=1) / len(b)
        order = np.argsort(scores)
        idx[i] = order[-1]
        margin[i] = scores[order[-1]] - scores[order[-2]]
        top[i] = scores[order[-1]]
    return idx, margin, top


# ------------------------------------------------------------ perplexity

@lru_cache(maxsize=1)
def ppl_model() -> tuple[np.ndarray, np.ndarray, float]:
    """Absolute-discount (Kneser-Ney-style) byte-trigram LM over the
    union of all language corpora.

    Hash-table form: for trigram t with context c (its leading bigram),
      p(t3 | c) = max(cnt3[t]-D, 0)/cnt2[c] + (D * distinct3[c]/cnt2[c]) * pb(t3)
    where pb is the unigram backoff distribution. Stored as dense
    bucket arrays (collisions are deterministic and shared by the
    oracle, so parity holds).
    Returns (cnt3, cnt2, and the discount D).
    """
    cnt3 = np.zeros(PPL_BUCKETS, dtype=np.float64)
    cnt2 = np.zeros(PPL_BUCKETS, dtype=np.float64)
    for lang in LANGS:
        for sent in training_text(lang):
            b3 = ngram_buckets(sent, (3,), PPL_BUCKETS)
            b2 = ngram_buckets(sent, (2,), PPL_BUCKETS)
            np.add.at(cnt3, b3, 1.0)
            np.add.at(cnt2, b2, 1.0)
    return cnt3, cnt2, 0.75


def _trigram_context_buckets(text: str) -> tuple[np.ndarray, np.ndarray]:
    """(trigram bucket, leading-bigram bucket) for every trigram."""
    data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    if len(data) < 3:
        e = np.empty(0, dtype=np.int64)
        return e, e
    h3 = _byte_ngram_hashes(data, 3) + np.uint64(0x9E3779B9 * 3)
    h2 = _byte_ngram_hashes(data, 2)[:-1] + np.uint64(0x9E3779B9 * 2)
    return (
        (h3 % np.uint64(PPL_BUCKETS)).astype(np.int64),
        (h2 % np.uint64(PPL_BUCKETS)).astype(np.int64),
    )


def perplexities(texts: "list[str] | np.ndarray") -> np.ndarray:
    """Byte-level trigram perplexity per text (high = off-corpus).
    Texts with <3 bytes get the sentinel 1e4."""
    cnt3, cnt2, d = ppl_model()
    total3 = cnt3.sum()
    out = np.full(len(texts), 1e4, dtype=np.float64)
    uni_floor = 1.0 / PPL_BUCKETS
    for i, t in enumerate(texts):
        if not t:
            continue
        b3, b2 = _trigram_context_buckets(t)
        if len(b3) == 0:
            continue
        c3 = cnt3[b3]
        c2 = np.maximum(cnt2[b2], 1.0)
        pb = np.maximum(c3 / total3, uni_floor)  # crude backoff distribution
        p = np.maximum(c3 - d, 0.0) / c2 + d * pb ** 0.5  # discounted + backoff mass
        p = np.clip(p, 1e-8, 1.0)
        out[i] = float(np.exp(-np.log(p).mean()))
    return out


# ------------------------------------------------------------- embedding

def embed_texts(texts: "list[str] | np.ndarray", dim: int = EMBED_DIM_DEFAULT) -> np.ndarray:
    """Hashed byte-2/3-gram TF vectors, signed-hash folded to `dim`,
    L2-normalized — the deterministic stand-in for the reference's
    BGE sentence embeddings (preprocess.py:78-80 mean-pool+normalize).
    """
    out = np.zeros((len(texts), dim), dtype=np.float32)
    for i, t in enumerate(texts):
        if not t:
            continue
        b = ngram_buckets(t, (2, 3), 1 << 20)
        if len(b) == 0:
            continue
        sign = np.where((b >> 1) & 1 == 0, 1.0, -1.0)
        np.add.at(out[i], b % dim, sign.astype(np.float32))
    norms = np.linalg.norm(out, axis=1, keepdims=True)
    np.divide(out, norms, out=out, where=norms > 0)
    return out


# --------------------------------------------------------- quality stats

def quality_stats(texts: "list[str] | np.ndarray") -> dict[str, np.ndarray]:
    """Cheap per-text quality features (vectorizable ratios). These are
    also expressible in pure SQL — the Spark pipeline computes them with
    built-in functions; this NumPy twin exists for the oracle."""
    n = len(texts)
    n_chars = np.zeros(n, dtype=np.int64)
    n_tokens = np.zeros(n, dtype=np.int64)
    alpha_ratio = np.zeros(n, dtype=np.float64)
    digit_ratio = np.zeros(n, dtype=np.float64)
    for i, t in enumerate(texts):
        if not t:
            continue
        n_chars[i] = len(t)
        n_tokens[i] = len(t.split())
        total = max(len(t), 1)
        alpha_ratio[i] = sum(c.isalpha() for c in t) / total
        digit_ratio[i] = sum(c.isdigit() for c in t) / total
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "alpha_ratio": alpha_ratio,
        "digit_ratio": digit_ratio,
    }
