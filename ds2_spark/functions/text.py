"""Transcript-level Spark stages: language-ID, perplexity, embedding,
quality features, token counts, fingerprints.

Design rules (BASELINE.json input_hint: "no per-row Python"):
  - anything expressible with built-in pyspark.sql.functions is a
    column expression (JVM, whole-stage codegen);
  - the three model kernels (langid / ppl / embed) are Arrow-batched
    pandas UDFs over NumPy kernels in textkernels.py — model tables
    are trained once per executor (lru_cache) and reused across
    batches, the PySpark analog of the reference's per-GPU model load
    (LLM_scoring/scoring.py:149-160).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import textkernels as tk

# Explicit ASCII character classes shared by every engine (NOTES #76):
# Java's \s is [ \t\n\x0B\f\r] but RE2's (DuckDB) lacks \x0B, and
# Python's re adds Unicode whitespace; Java's \p{P} is Unicode
# punctuation-category (excludes $+<=>^`|~) while POSIX [:punct:] is
# the full ASCII graphic-non-alnum set. Spelling the sets out as hex
# ranges makes Spark, DuckDB, and any NumPy twin tokenize identically
# on EVERY input, not just fixture-safe text. Both Java regex and RE2
# interpret \xhh inside a class.
WS_CLASS = r"[ \t\n\x0b\f\r]"
WS_SPLIT = r"[ \t\n\x0b\f\r]+"
NON_WS_CLASS = r"[^ \t\n\x0b\f\r]"
# POSIX punct: 0x21-0x2f 0x3a-0x40 0x5b-0x60 0x7b-0x7e (== [:punct:]).
PUNCT_RANGES = r"\x21-\x2f\x3a-\x40\x5b-\x60\x7b-\x7e"
WS_OR_PUNCT_SPLIT = r"[ \t\n\x0b\f\r" + PUNCT_RANGES + "]+"

_LANGID_SCHEMA = T.StructType(
    [
        T.StructField("lang", T.StringType()),
        T.StructField("lang_margin", T.DoubleType()),
        T.StructField("lang_logp", T.DoubleType()),
    ]
)


@F.pandas_udf(_LANGID_SCHEMA)
def langid_udf(texts: pd.Series) -> pd.DataFrame:
    """fastText-style language ID (hashed byte-n-gram NB)."""
    vals = texts.fillna("").tolist()
    idx, margin, top = tk.langid_scores(vals)
    _, langs = tk.langid_model()
    return pd.DataFrame(
        {
            "lang": [langs[i] for i in idx],
            "lang_margin": margin,
            "lang_logp": top,
        }
    )


@F.pandas_udf(T.DoubleType())
def ppl_udf(texts: pd.Series) -> pd.Series:
    """KN-style (absolute-discount) byte-trigram perplexity."""
    return pd.Series(tk.perplexities(texts.fillna("").tolist()))


@F.pandas_udf(T.StringType())
def nfc_udf(texts: pd.Series) -> pd.Series:
    """Unicode NFC normalization (UAX #15) — the standard first step
    of any multilingual text ingest: composes 'e'+U+0301 into U+00E9
    so dedup keys, token counts, scrub regexes, and LM hashes see ONE
    canonical byte form instead of visually-identical variants.
    NULL passes through (stage contract: never invent text).
    Verified cross-implementation: the contract oracle
    (q_nfc_normalize) compares this (CPython unicodedata, i.e. the
    UCD reference tables) against DuckDB's utf8proc nfc_normalize —
    two independent implementations of the same published algorithm."""
    import unicodedata

    return texts.map(
        lambda t: t if t is None else unicodedata.normalize("NFC", t)
    )


def ppl_udf_with_model(model_bc):
    """ppl_udf scoring with a TRAINED model (operators/lm.train_lm)
    instead of the built-in fixture LM. `model_bc` is a
    `sc.broadcast((cnt3, cnt2, discount))` — broadcast, not a plain
    closure, so the ~4 MB dense arrays ship once per executor rather
    than inside every serialized task. Trained on the fixture corpus
    this scores bit-identically to `ppl_udf` (pinned in
    tests/test_lm.py), so swapping models never changes the stage
    shape — only the arrays the same kernel reads."""

    @F.pandas_udf(T.DoubleType())
    def _ppl(texts: pd.Series) -> pd.Series:
        return pd.Series(
            tk.perplexities(texts.fillna("").tolist(), model=model_bc.value)
        )

    return _ppl


def embed_udf(dim: int = tk.EMBED_DIM_DEFAULT):
    """Hashed n-gram sentence embedding (array<float>, L2-normalized) —
    the deterministic analog of the reference's BGE encoder stage
    (docta/core/preprocess.py:33-84)."""

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def _embed(texts: pd.Series) -> pd.Series:
        mat = tk.embed_texts(texts.fillna("").tolist(), dim=dim)
        return pd.Series(list(mat))

    return _embed


# ----------------------------------------------------- built-in features

def with_quality_features(df: DataFrame, text_col: str = "transcript") -> DataFrame:
    """Pure column-expression quality features (no Python):
    n_chars, n_tokens, alpha/digit/space/punct ratios, upper ratio."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    trimmed = F.trim(t)
    n = F.length(t)
    safe_n = F.greatest(n, F.lit(1)).cast("double")

    def _ratio(non_class_pattern: str) -> Column:
        # strip everything NOT in the class; what's left over n = ratio
        return F.length(F.regexp_replace(t, non_class_pattern, "")) / safe_n

    return (
        df.withColumn("n_chars", F.length(trimmed))
        .withColumn(
            "n_tokens",
            # count NON-EMPTY pieces: Java's split drops trailing empty
            # strings but DuckDB's regexp_split_to_array keeps them, so a
            # bare size(split(..)) diverges on text ending in whitespace
            # that trim() doesn't strip (trim = spaces only). Filtering
            # empties makes the count engine-independent by construction.
            F.size(F.filter(F.split(trimmed, WS_SPLIT), lambda x: x != F.lit(""))),
        )
        .withColumn("alpha_ratio", _ratio(r"[^\p{L}]"))
        .withColumn("digit_ratio", _ratio(r"[^0-9]"))
        .withColumn("space_ratio", _ratio(NON_WS_CLASS))
        .withColumn("punct_ratio", _ratio(r"[^\p{P}]"))
    )


def token_count_col(text_col: str = "transcript") -> Column:
    """Whitespace+punctuation token count (BPE-ish regex split)."""
    t = F.trim(F.coalesce(F.col(text_col), F.lit("")))
    # non-empty pieces only — see n_tokens comment in with_quality_features
    # (text ending in punctuation would otherwise count a phantom token in
    # DuckDB but not in Java).
    return F.size(F.filter(F.split(t, WS_OR_PUNCT_SPLIT), lambda x: x != F.lit("")))


def fingerprint_col(text_col: str = "transcript") -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase text
    (exact-dup key; identical function exists in DuckDB for the oracle)."""
    norm = F.lower(F.regexp_replace(F.trim(F.coalesce(F.col(text_col), F.lit(""))), WS_SPLIT, " "))
    return F.md5(norm)
