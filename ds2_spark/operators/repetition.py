"""Gopher/C4-style intra-document repetition features.

Web-scale quality filtering drops documents whose content is mostly
self-repetition — boilerplate navigation lines repeated per page,
scraper loops emitting the same sentence, SEO keyword stuffing. The
standard signals (Rae et al. 2021 "Scaling Language Models" §A1.1,
the Gopher rules; also C4's line-dedup heuristics) are fractions of
duplicate lines and the character mass of the most frequent word
n-gram. Reference analog: DS2 reaches the same goal with LLM quality
ratings (LLM_scoring/); these are the classic heuristic pre-filters
that run BEFORE any model-based scorer at 10^12-doc scale.

Everything here is JVM-side column expressions over explode +
groupBy — the distributed word-count shape. Per-key partial
aggregation (map-side combine) keeps the (doc_id, line/gram) shuffles
proportional to the number of DISTINCT lines/grams per partition, and
the final per-doc aggregate shuffles doc_id only. No Python in the
hot path; the whole plan is whole-stage-codegen'd.

Exact semantics (mirrored verbatim by the DuckDB contract oracle):

- lines  = trim each piece of split(text, '\\n'), drop empties.
- words  = split(text, '\\s+'), drop empties.
- 2grams = words[i] + ' ' + words[i+1] (empty when < 2 words).
- dup_line_frac      = occurrences beyond the first of each distinct
                       line / total line count (0 when no lines).
- dup_line_char_frac = sum (cnt-1)*len(line) / sum cnt*len(line)
                       over distinct lines (char mass of occurrences
                       2..k; 0 when no line chars).
- top_2gram_char_frac = max(cnt * len(gram)) / len(text)
                       (0 when no grams or empty text).
- rep_keep = dup_line_frac <= 0.30 AND dup_line_char_frac <= 0.20
             AND top_2gram_char_frac <= 0.20  (Gopher thresholds).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import WS_SPLIT

GOPHER_MAX_DUP_LINE_FRAC = 0.30
GOPHER_MAX_DUP_LINE_CHAR_FRAC = 0.20
GOPHER_MAX_TOP_2GRAM_CHAR_FRAC = 0.20


def _nonempty_pieces(text: Column, sep_regex: str, do_trim: bool) -> Column:
    pieces = F.split(text, sep_regex)
    if do_trim:
        pieces = F.transform(pieces, F.trim)
    return F.filter(pieces, lambda x: x != F.lit(""))


def repetition_features(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_dup_line_frac: float = GOPHER_MAX_DUP_LINE_FRAC,
    max_dup_line_char_frac: float = GOPHER_MAX_DUP_LINE_CHAR_FRAC,
    max_top_2gram_char_frac: float = GOPHER_MAX_TOP_2GRAM_CHAR_FRAC,
) -> DataFrame:
    """Per-document repetition features + Gopher keep/drop verdict.

    Output: (id_col, n_lines, dup_line_frac, dup_line_char_frac,
    top_2gram_char_frac, rep_keep). See module docstring for the
    exact definitions. Three aggregation trees (lines, 2-grams, base
    doc lengths) joined on id — each is a plain explode/groupBy whose
    map-side combine bounds the shuffle by distinct keys, so the plan
    survives both long documents (many grams, combined locally) and
    many documents (doc_id hash-partitioned; no hot key because every
    doc contributes its own keys).
    """
    base = df.select(
        F.col(id_col), F.length(F.col(text_col)).alias("_text_len")
    )

    # --- line family: one explode, per-(doc,line) counts, per-doc sums
    lines = (
        df.select(
            F.col(id_col),
            F.explode(
                _nonempty_pieces(F.col(text_col), "\n", do_trim=True)
            ).alias("_line"),
        )
        .groupBy(id_col, "_line")
        .agg(F.count("*").alias("_cnt"))
        .groupBy(id_col)
        .agg(
            F.sum("_cnt").alias("_n_lines"),
            F.sum(F.col("_cnt") - 1).alias("_n_dup_lines"),
            F.sum((F.col("_cnt") - 1) * F.length("_line")).alias("_dup_chars"),
            F.sum(F.col("_cnt") * F.length("_line")).alias("_line_chars"),
        )
    )

    # --- 2-gram family. sequence(1, n) with n < 1 would DESCEND in
    # Spark (sequence picks step -1), so short docs get an explicit
    # empty array instead of a guarded sequence.
    words = _nonempty_pieces(F.col(text_col), WS_SPLIT, do_trim=False)
    grams_arr = F.when(
        F.size(F.col("_words")) >= 2,
        F.expr(
            "transform(sequence(1, size(_words) - 1), "
            "i -> concat(element_at(_words, i), ' ', element_at(_words, i + 1)))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = (
        df.select(F.col(id_col), words.alias("_words"))
        .select(F.col(id_col), F.explode(grams_arr).alias("_g"))
        .groupBy(id_col, "_g")
        .agg(F.count("*").alias("_cnt"))
        .groupBy(id_col)
        .agg(F.max(F.col("_cnt") * F.length("_g")).alias("_top_gram_chars"))
    )

    zero = F.lit(0).cast("long")
    feat = (
        base.join(lines, id_col, "left")
        .join(grams, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("_n_lines", zero).alias("n_lines"),
            _safe_frac(F.coalesce("_n_dup_lines", zero), F.col("_n_lines")).alias(
                "dup_line_frac"
            ),
            _safe_frac(F.coalesce("_dup_chars", zero), F.col("_line_chars")).alias(
                "dup_line_char_frac"
            ),
            _safe_frac(
                F.coalesce("_top_gram_chars", zero), F.col("_text_len")
            ).alias("top_2gram_char_frac"),
        )
    )
    return feat.withColumn(
        "rep_keep",
        (
            (F.col("dup_line_frac") <= max_dup_line_frac)
            & (F.col("dup_line_char_frac") <= max_dup_line_char_frac)
            & (F.col("top_2gram_char_frac") <= max_top_2gram_char_frac)
        ).cast("int"),
    )


def _safe_frac(num: Column, den: Column) -> Column:
    return F.when(
        den.isNull() | (den == 0), F.lit(0.0)
    ).otherwise(num.cast("double") / den.cast("double"))
