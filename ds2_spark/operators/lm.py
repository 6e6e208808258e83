"""Distributed n-gram LM training — the missing half of perplexity
scoring at corpus scale.

The built-in quality LM (functions/textkernels.ppl_model) is a
driver-built fixture; a real 100 TB pipeline trains its LM on a
trusted slice of the corpus itself (the CCNet/KenLM recipe: count
n-grams distributively, smooth, then score every document). Reference
scope note: UCSC-REAL/DS2 has no LM-training stage (its quality
signals come from LLM raters, LLM_scoring/get_rating.py); this module
is a beyond-reference capability of the same kind as dedup/decontam.

Two paths:

- `train_trigram_counts` / `counts_to_model` — the PRODUCTION path.
  Byte-trigram bucket counts in the EXACT hash space the scoring
  kernel (functions/textkernels.perplexities) reads, computed per
  Arrow batch as two dense NumPy histograms and emitted as nonzero
  (bucket, c3, c2) rows into a groupBy-sum. Map-side combine does the
  heavy lifting: each task emits at most `buckets` rows regardless of
  how many documents it read, so the shuffle is bounded by
  tasks x buckets, never by corpus size, and the final aggregate is
  at most `buckets` rows (2^18 default ~ a 4 MB model) — a bounded
  driver collect by construction. Trained on the fixture corpus it
  reproduces ppl_model()'s arrays exactly (pytest pins this), so
  `perplexities(texts, model=...)` scores bit-identically.

- `kn_word_trigrams` — the ORACLE-CHECKABLE path. Word-trigram
  Kneser-Ney probabilities over whitespace tokens: every step (split,
  explode, count, continuation counts, the KN formula) is expressible
  in ANSI SQL, so the contract query (q_lm_kn) cross-checks the
  smoothing math end to end against DuckDB — something the hashed
  byte-bucket path cannot do in SQL. Interpolated KN with absolute
  discount D:

      p(w3 | w1 w2) = max(c(w1w2w3) - D, 0) / c(w1w2*)
                      + D * n1+(w1w2*) / c(w1w2*) * pcont(w3)
      pcont(w3)     = n1+(* * w3) / |distinct trigram types|

  where c(w1w2*) is the trigram-context total, n1+(w1w2*) the number
  of distinct continuations of the context, and n1+(** w3) the number
  of distinct contexts w3 completes — the standard continuation
  probability (Kneser & Ney 1995; Chen & Goodman 1999).

Scale shape: the trigram explode is corpus-sized but flows straight
into a partial-aggregated groupBy (no join, no window); everything
after operates on the (vocabulary-sized, not corpus-sized) count
table. Skewed hot trigrams are absorbed by map-side combine — a
million repetitions of one trigram leave each task as one row.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textkernels import (
    PPL_BUCKETS,
    _batch_window_hashes,
    _byte_ngram_hashes,
    _concat_utf8,
)

__all__ = [
    "train_trigram_counts",
    "counts_to_model",
    "train_lm",
    "kn_word_trigrams",
]


def train_trigram_counts(
    docs: DataFrame, text_col: str = "text", buckets: int = PPL_BUCKETS
) -> DataFrame:
    """Byte-trigram/bigram bucket counts of a corpus, as a DataFrame
    (bucket long, c3 long, c2 long) with at most `buckets` rows.

    The per-batch kernel hashes windows with the SAME salted
    polynomial hash the scorer uses (_batch_window_hashes /
    ngram_buckets agree by construction), histograms them with
    np.bincount into two dense arrays, and emits only nonzero buckets.
    Window hashes never cross document boundaries (same guarantee the
    scoring kernel relies on)."""
    if not 0 < buckets <= (1 << 26):
        raise ValueError(f"buckets must be in (0, 2^26], got {buckets}")

    def _count(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            texts = pdf[text_col].tolist()
            data, starts, lens = _concat_utf8(texts)
            # bincount, not np.add.at: all increments are +1, so the
            # buffered histogram is bit-identical and ~10-30x faster —
            # this loop dominates the training stage at corpus scale
            c3 = np.zeros(buckets, dtype=np.int64)
            c2 = np.zeros(buckets, dtype=np.int64)
            h3, _tid3, _pos3 = _batch_window_hashes(data, starts, lens, 3)
            if len(h3):
                c3 += np.bincount(
                    (h3 % np.uint64(buckets)).astype(np.int64),
                    minlength=buckets,
                )
            h2, _tid2, _pos2 = _batch_window_hashes(data, starts, lens, 2)
            if len(h2):
                c2 += np.bincount(
                    (h2 % np.uint64(buckets)).astype(np.int64),
                    minlength=buckets,
                )
            nz = np.flatnonzero((c3 | c2) != 0)
            yield pd.DataFrame(
                {"bucket": nz, "c3": c3[nz], "c2": c2[nz]}
            )

    partial = docs.select(F.col(text_col).cast("string").alias(text_col)).mapInPandas(
        _count, schema="bucket long, c3 long, c2 long"
    )
    return partial.groupBy("bucket").agg(
        F.sum("c3").alias("c3"), F.sum("c2").alias("c2")
    )


def counts_to_model(
    counts: DataFrame, buckets: int = PPL_BUCKETS, discount: float = 0.75
) -> tuple[np.ndarray, np.ndarray, float]:
    """Collect a (bucket, c3, c2) count table into the dense
    (cnt3, cnt2, discount) triple `perplexities(texts, model=...)`
    scores with. The collect is bounded by `buckets` rows (<= 2^18
    by default) — model-sized, never corpus-sized."""
    pdf = counts.toPandas()
    if len(pdf) > buckets:
        raise ValueError(
            f"count table has {len(pdf)} rows > buckets={buckets}; "
            f"was it trained with a different bucket count?"
        )
    cnt3 = np.zeros(buckets, dtype=np.float64)
    cnt2 = np.zeros(buckets, dtype=np.float64)
    idx = pdf["bucket"].to_numpy()
    # the row-count check alone cannot catch a table trained in a
    # DIFFERENT hash space: counts folded mod 2^10 fit easily in 2^18
    # arrays but score garbage (wrong space, silent), and a sparse
    # table from a larger space would IndexError below. Both directions
    # refuse here — but a SMALLER space whose indices happen to fit is
    # detectable only by the caller keeping (counts, buckets) paired;
    # prefer train_lm(), which never separates them.
    if len(idx) and int(idx.max()) >= buckets:
        raise ValueError(
            f"count table has bucket id {int(idx.max())} >= "
            f"buckets={buckets}; it was trained in a different "
            f"(larger) hash space"
        )
    cnt3[idx] = pdf["c3"].to_numpy().astype(np.float64)
    cnt2[idx] = pdf["c2"].to_numpy().astype(np.float64)
    if cnt3.sum() <= 0:
        # every text <3 bytes, or an empty corpus: scoring with this
        # model would be 0/0 per trigram — refuse at the earliest point
        raise ValueError(
            "counts_to_model: corpus produced zero trigrams; "
            "cannot train an LM from it"
        )
    return cnt3, cnt2, float(discount)


def train_lm(
    docs: DataFrame,
    text_col: str = "text",
    buckets: int = PPL_BUCKETS,
    discount: float = 0.75,
) -> tuple[np.ndarray, np.ndarray, float]:
    """One-call distributed train: counts -> dense model triple."""
    return counts_to_model(
        train_trigram_counts(docs, text_col, buckets), buckets, discount
    )


def kn_word_trigrams(
    docs: DataFrame,
    text_col: str = "text",
    discount: float = 0.75,
    top_n: int = 50,
) -> DataFrame:
    """Interpolated Kneser-Ney probabilities of a corpus's word
    trigrams; returns the top_n by (p_kn DESC, trigram ASC) as
    (w1, w2, w3, c3, p_kn) with p_kn rounded to 6 dp BEFORE the rank
    (round-before-rank kills cross-engine ulp drift — repo convention).

    Tokens are non-empty whitespace splits of the raw text (no case
    folding — both engines see identical tokens). The split class is
    the EXPLICIT ASCII set [ \\t\\n\\x0b\\f\\r], not bare \\s+: Java
    regex \\s includes \\x0B but RE2's (DuckDB's) does not, and
    Python's str.split() adds unicode whitespace — the same
    cross-engine trap scrub.py:17 and bpe.py document. NULL texts and
    texts with <3 tokens contribute nothing.

    Plan: ONE corpus-sized explode into a partially-aggregated
    groupBy(w1,w2,w3); every later step (context totals, distinct
    continuations, continuation counts, the KN arithmetic) reads the
    vocabulary-sized count table, so corpus text is scanned exactly
    once and nothing vocabulary-sized ever shuffles more than once."""
    toks = F.filter(
        F.split(F.coalesce(text_col, F.lit("")), "[ \t\n\x0b\f\r]+"),
        lambda t: t != "",
    )
    tri = (
        docs.select(toks.alias("toks"))
        .where(F.size("toks") >= 3)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(toks) - 3), "
                    "i -> struct(toks[i] AS w1, toks[i+1] AS w2, toks[i+2] AS w3))"
                )
            ).alias("t")
        )
        .select("t.w1", "t.w2", "t.w3")
    )
    # four consumers (ctx, cont, types, the final join) read c3 —
    # without a cut point Catalyst re-runs the corpus-sized explode +
    # count PER CONSUMER (the re-explode trap tfidf.py:55 documents).
    # A LAZY localCheckpoint materializes the vocabulary-sized count
    # table on first use; every consumer then reads the cached blocks.
    c3 = (
        tri.groupBy("w1", "w2", "w3")
        .agg(F.count("*").alias("c3"))
        .localCheckpoint(eager=False)
    )
    # context table: total count + distinct continuations per (w1,w2)
    ctx = c3.groupBy("w1", "w2").agg(
        F.sum("c3").alias("c2"), F.count("*").alias("n1p_ctx")
    )
    # continuation counts: in how many distinct contexts does w3 appear
    cont = c3.groupBy("w3").agg(F.count("*").alias("n1p_w3"))
    # total distinct trigram types (1-row broadcast)
    types = c3.agg(F.count("*").alias("n_types"))
    d = F.lit(float(discount))
    return (
        c3.join(ctx, ["w1", "w2"])
        .join(cont, "w3")
        .crossJoin(F.broadcast(types))
        .select(
            "w1",
            "w2",
            "w3",
            "c3",
            F.round(
                (F.greatest(F.col("c3") - d, F.lit(0.0)) / F.col("c2"))
                + (d * F.col("n1p_ctx") / F.col("c2"))
                * (F.col("n1p_w3") / F.col("n_types")),
                6,
            ).alias("p_kn"),
        )
        .orderBy(F.desc("p_kn"), "w1", "w2", "w3")
        .limit(top_n)
    )
