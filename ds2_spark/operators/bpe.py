"""Byte-pair-encoding tokenizer: distributed pair-count training +
cached vectorized encoding, with SQL-replayable merge semantics.

Token COUNTS drive every budget decision a training-data pipeline
makes (sequence packing, mixture weights, per-source token quotas,
price-of-corpus estimates), and a real learned subword vocabulary is
what produces them — the repo's `token_count_col` regex is a cheap
proxy. This module implements BPE (Sennrich et al. 2016) with two
deliberate, documented deviations that make every step exactly
replayable by the DuckDB contract oracle:

* pair counting is OVERLAPPING (`zip(sym, sym[1:])` — Sennrich's
  reference `get_stats` does the same);
* a chosen merge is applied as ONE left-to-right non-overlapping
  pass over each word, and encoding applies the merge table in rank
  order, one such pass per merge. On the bracketed encoding
  `␞c1␟␞c2␟…␞cn␟` (START marker U+001E before and END marker
  U+001F after every symbol) this is exactly SQL
  `replace(enc, ␞l␟␞r␟, ␞lr␟)` — scanning resumes after each
  replacement — so both engines walk bit-identical states. The
  START marker is load-bearing: a trailing-marker-only encoding
  (`c1␟c2␟…`) admits MID-SYMBOL matches — with symbols (ca, b) the
  pattern `a␟b␟` matches inside `ca␟b␟`, merging across a symbol
  boundary the engine never would. With both markers a match must
  begin at a ␞, i.e. at a symbol start, and l/r must each span a
  whole symbol (symbols contain no marker chars — enforced by the
  encode-time refusal below), so every match is exactly an
  adjacent symbol pair. (Sennrich's encoder loops until fixpoint;
  for merges learned BY this trainer the single rank-ordered pass
  is self-consistent: training state after j rounds == encoding
  with the first j merges, pinned by test.)

Word splitting matches the JVM side byte-for-byte: the kernel
splits on the explicit class [ \\t\\n\\x0b\\f\\r] — Java's ASCII
`\\s` — not pandas' default Unicode whitespace, so a U+00A0 inside
a transcript is (part of) a word in the trainer, the encoder, and
the oracle alike.

Spark shape at 10^12 rows: training's distributed half is one
word-frequency groupBy (map-side combined, key space = vocabulary,
Zipf-bounded); the merge loop runs driver-side over the top-N word
list — bounded state, the same collect_pool discipline as
plans/curation.py. Encoding is a mapInPandas kernel whose unit of
work is the UNIQUE word, not the row: each partition memoizes
word -> tokens (the standard tokenizer word-cache, cf. HuggingFace
tokenizers), so per-batch cost is O(unique words), which Zipf makes
a tiny fraction of row count. The transcript payload never
shuffles; output is fixed-width stats + a 64-bit token-stream hash.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark.sql import types as T

from ..functions.text import WS_SPLIT

SEP = "\x1f"    # unit separator: END marker after each symbol
START = "\x1e"  # record separator: START marker before each symbol


def word_frequencies(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, cnt): corpus-wide occurrence counts — whitespace split,
    empties dropped (the corpus-wide convention)."""
    return (
        docs.select(
            F.explode(
                F.filter(
                    F.split(F.col(text_col), WS_SPLIT),
                    lambda x: x != F.lit(""),
                )
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def merge_pass(symbols: list[str], left: str, right: str) -> list[str]:
    """One left-to-right non-overlapping merge pass — the Python twin
    of `replace(enc, ␞l␟␞r␟, ␞lr␟)` on the bracketed encoding."""
    out: list[str] = []
    i = 0
    n = len(symbols)
    while i < n:
        if i + 1 < n and symbols[i] == left and symbols[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return out


def train_bpe(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 10,
    max_words: int = 500,
) -> list[tuple[str, str, int]]:
    """Learn `n_merges` merges from the corpus; returns
    [(left, right, pair_count_at_selection), ...] in rank order.

    The distributed step is the word-frequency groupBy; the merge
    loop runs on the top-`max_words` (cnt DESC, word ASC — a total
    order both engines replay) collected driver-side. Ties between
    candidate pairs break by (count DESC, left ASC, right ASC)."""
    top = (
        word_frequencies(docs, text_col)
        .orderBy(F.desc("cnt"), F.asc("word"))
        .limit(max_words)
        .collect()
    )
    vocab: list[tuple[list[str], int]] = [
        (list(r["word"]), int(r["cnt"])) for r in top
    ]
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for sym, cnt in vocab:
            for a, b in zip(sym, sym[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + cnt
        if not counts:
            break
        (left, right), best = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        merges.append((left, right, best))
        vocab = [(merge_pass(s, left, right), c) for s, c in vocab]
    return merges


def encode_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Tokenize one word: merges in rank order, one pass each."""
    symbols = list(word)
    for left, right in merges:
        symbols = merge_pass(symbols, left, right)
    return symbols


_OUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_tokens", T.LongType()),
        T.StructField("n_singles", T.LongType()),
        T.StructField("token_hash", T.StringType()),
    ]
)


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc token stats under a fixed merge table:

      (doc_id, n_tokens, n_singles, token_hash)

    n_singles counts 1-char tokens (unmerged residue — a vocabulary
    coverage signal); token_hash is the 64-bit md5 prefix of the
    space-joined token stream, pinning the exact tokenization.
    Unit of work is the unique word (partition-lifetime memo)."""
    pairs = [(left, right) for left, right, *_ in merges]

    def _encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        # (tok_str, n_tokens, n_singles) per unique word, memoized
        # for the partition's lifetime
        cache: dict[str, tuple[str, int, int]] = {}

        def tok(word: str) -> tuple[str, int, int]:
            got = cache.get(word)
            if got is None:
                toks = encode_word(word, pairs)
                got = cache[word] = (
                    " ".join(toks),
                    len(toks),
                    sum(1 for t in toks if len(t) == 1),
                )
            return got

        for pdf in batches:
            # NULL text tokenizes as empty (0 tokens, empty-stream
            # hash) rather than crashing the batch — hostile-input
            # policy matching the span-dedup NULL passthrough
            texts = pdf[text_col].fillna("")
            if texts.str.contains(SEP).any() or texts.str.contains(
                START
            ).any():
                raise ValueError(
                    "bpe_encode: text contains a reserved marker "
                    "(U+001E/U+001F)"
                )
            # Java-ASCII \s, NOT pandas/Python Unicode whitespace —
            # keeps the word population identical to the Spark-side
            # trainer and the RE2/DuckDB oracle (module docstring)
            words = texts.str.findall(r"[^ \t\n\x0b\f\r]+")
            lens = words.str.len().to_numpy()
            owner = np.repeat(np.arange(len(pdf)), lens)
            flat = pd.Series(
                np.concatenate([np.asarray(w, dtype=object) for w in words])
                if len(pdf) and lens.sum()
                else np.array([], dtype=object)
            )
            for w in pd.unique(flat):
                tok(w)
            enc = flat.map(cache)
            n_tok = np.zeros(len(pdf), dtype=np.int64)
            n_single = np.zeros(len(pdf), dtype=np.int64)
            np.add.at(n_tok, owner, enc.str[1].to_numpy(dtype=np.int64)
                      if len(flat) else 0)
            np.add.at(n_single, owner, enc.str[2].to_numpy(dtype=np.int64)
                      if len(flat) else 0)
            streams = (
                enc.str[0].groupby(owner).agg(" ".join)
                .reindex(range(len(pdf)), fill_value="")
                if len(flat)
                else pd.Series([""] * len(pdf))
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64").to_numpy(),
                    "n_tokens": n_tok,
                    "n_singles": n_single,
                    "token_hash": [
                        hashlib.md5(s.encode()).hexdigest()[:16]
                        for s in streams
                    ],
                }
            )

    return docs.select(
        F.col(id_col), F.col(text_col)
    ).mapInPandas(_encode, schema=_OUT_SCHEMA)
