"""Character-level information signals for quality filtering.

CCNet/RefinedWeb-style heuristics: natural language sits in a band of
character entropy (~3.5-4.5 bits for English); binary junk, base64
blobs, and mojibake run high, keyboard mashing and repeated filler
run low, and a poor zlib ratio flags machine-generated or duplicated
filler that n-gram rules miss. DS2's analog is model-based quality
scoring (LLM_scoring/); these are the cheap pre-filters that run
first at 10^12-doc scale.

- char_entropy: Shannon entropy (bits/char) of the character
  distribution. Pure JVM: explode chars -> two-level groupBy, the
  char-granularity word-count shape; map-side combine bounds the
  (doc, char) shuffle by |charset| per partition, so the wire cost is
  ~alphabet-sized per doc regardless of text length. Rounded to 6 dp
  (the per-class -p*log2(p) terms are summed in engine-dependent
  order; last-ulp differences die at 6 dp).
- compression_ratio: len(zlib(text)) / len(text) via an Arrow-batched
  pandas UDF (zlib releases the GIL per call; no SQL twin exists, so
  this surface is pytest-verified against direct zlib rather than
  oracle-checked).
"""

from __future__ import annotations

import zlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def char_entropy(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id_col, n_chars, entropy_bits) per document; empty/NULL text
    scores 0 bits over 0 chars."""
    # the empty-token filter guards the empty-string edge: Spark's
    # split("", "") yields [""] while DuckDB's yields [] — dropping ""
    # tokens makes both engines agree that an empty doc has 0 chars
    counts = (
        df.select(
            F.col(id_col),
            F.explode(
                F.filter(
                    F.split(F.col(text_col), ""), lambda x: x != F.lit("")
                )
            ).alias("_ch"),
        )
        .groupBy(id_col, "_ch")
        .agg(F.count("*").alias("_cnt"))
        # counts feeds two consumers (totals + the entropy sum) and
        # Catalyst does not dedupe common subplans — materialize the
        # alphabet-bounded table once instead of re-exploding chars
        .localCheckpoint(eager=False)
    )
    # entropy needs the doc total inside every per-class term, so
    # compute n first and join it back onto the class counts (both
    # sides are already hash-partitioned by id after their aggs)
    n_per = counts.groupBy(id_col).agg(F.sum("_cnt").alias("n_chars"))
    ent = (
        counts.join(n_per, id_col)
        .groupBy(id_col, "n_chars")
        .agg(
            F.round(
                -F.sum(
                    (F.col("_cnt") / F.col("n_chars"))
                    * F.log2(F.col("_cnt") / F.col("n_chars"))
                ),
                6,
            ).alias("entropy_bits")
        )
    )
    base = df.select(F.col(id_col)).distinct()
    return base.join(ent, id_col, "left").select(
        id_col,
        F.coalesce("n_chars", F.lit(0)).alias("n_chars"),
        F.coalesce("entropy_bits", F.lit(0.0)).alias("entropy_bits"),
    )


@pandas_udf("double")
def compression_ratio_udf(texts: pd.Series) -> pd.Series:
    """len(zlib.compress(utf8)) / len(utf8); 1.0 for empty/NULL text
    (nothing to compress = no evidence of redundancy)."""
    out = []
    for t in texts:
        if t is None or len(t) == 0:
            out.append(1.0)
            continue
        raw = t.encode("utf-8")
        out.append(len(zlib.compress(raw, 6)) / len(raw))
    return pd.Series(out, dtype="float64")
