"""Exact substring-span deduplication: remove duplicated k-token
spans from all but one copy, corpus-wide.

The missing granularity between the repo's document-level dedup
(exact md5 / MinHash / SimHash — whole docs) and decontamination
(corpus vs a small external benchmark): boilerplate, licence
headers, and quoted passages repeat *inside otherwise-unique
documents*, and training on them measurably hurts LMs (Lee et al.
2021, "Deduplicating Training Data Makes Language Models Better" —
their ExactSubstr variant; Dolma's paragraph-level dedup is the
same idea at paragraph granularity). Reference analog: DS2 scores
and filters whole samples (LLM_scoring/data_process.py); span-level
scrubbing is the complementary hygiene step a 10^12-clip transcript
corpus needs, because near-identical boilerplate inflates both
perplexity-based quality scores and n-gram diversity estimates.

Semantics (token-level, mirrored exactly by the contract oracle):

* words = whitespace-split, empties dropped (the corpus-wide
  convention of operators/decontam.py).
* every k-token window (1-based start positions 1..m-k+1) is keyed
  by the first 16 hex chars of md5 of the space-joined gram.
* a key occurring in >= 2 *distinct* docs is duplicated; the doc
  with the smallest doc_id is the OWNER and keeps its copy
  (keep-first, as in Lee et al.); every other occurrence marks the
  token interval [pos, pos+k-1] for removal.
* per doc, marked intervals that overlap or touch (next start <=
  current end + 1) merge into maximal spans; the rewrite drops all
  tokens inside any span and space-joins the survivors.

Spark shape at 10^12 rows: the only wide op is the groupBy on the
16-hex gram key — ids + fixed-width keys, the transcript payload
never shuffles (grams are hashed where they are read, the rewrite
joins the bounded spans array back to the doc scan by doc_id).
Interval merge is a window over (doc_id, start) — one shuffle on
doc_id, partition-local after that. At extreme scale the key
groupBy supports the standard refinement (a Bloom/count prefilter
so singleton grams — the vast majority — never shuffle; see
functions/sketches.py), which changes constants, not shape.
Everything below is JVM expression / window code — zero Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import WS_SPLIT


def _tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return df.select(
        F.col(id_col),
        F.filter(
            F.split(F.col(text_col), WS_SPLIT), lambda x: x != F.lit("")
        ).alias("_w"),
    )


def gram_positions(
    df: DataFrame, id_col: str, text_col: str, k: int
) -> DataFrame:
    """(id, pos, key): every k-token window with its 64-bit md5
    prefix key. Docs shorter than k tokens emit nothing (guarded —
    sequence(1, m) descends for m < 1, NOTES #37)."""
    # md5 lives OUTSIDE the transform lambda: expressions inside
    # higher-order functions are interpreted, post-explode projections
    # are whole-stage codegen (NOTES #8) — same (id, pos, key) output
    grams = F.when(
        F.size("_w") >= k,
        F.expr(
            f"transform(sequence(1, size(_w) - {k - 1}), "
            f"i -> struct(i as pos, array_join(slice(_w, i, {k}), ' ') as g))"
        ),
    ).otherwise(F.expr("array()").cast("array<struct<pos:int,g:string>>"))
    return (
        _tokens(df, id_col, text_col)
        .select(F.col(id_col), F.explode(grams).alias("_g"))
        .select(
            id_col,
            F.col("_g.pos").alias("pos"),
            F.substring(F.md5("_g.g"), 1, 16).alias("key"),
        )
    )


def dedup_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
) -> DataFrame:
    """Corpus-wide span dedup. Returns one row per input doc:

      (id_col, n_tokens, n_spans, tokens_removed, dedup_text)

    n_spans counts maximal merged spans (0 for untouched docs and
    for each duplicated key's owner), tokens_removed their total
    token mass, dedup_text the space-joined surviving tokens (the
    full original token join when nothing was removed). NULL text
    passes through as NULL tokens/text with zero span counts —
    hostile rows neither crash nor silently drop."""
    # the gram index feeds TWO consumers (dup census + span marks);
    # Catalyst does not dedupe common subplans, so materialize it once
    # (lazy localCheckpoint — the containment_pairs/BM25 discipline)
    # instead of re-exploding + re-hashing the corpus per branch
    g = gram_positions(docs, id_col, text_col, k).localCheckpoint(
        eager=False
    )

    # duplicated keys with their keep-first owner: ids-only shuffle.
    # ">= 2 distinct ids" is exactly "min(id) != max(id)" — min/max
    # are plain map-side-combining aggregates where count_distinct
    # pays an Expand + second shuffle for the same boolean
    dup = (
        g.groupBy("key")
        .agg(
            F.min(id_col).alias("_owner"),
            F.max(id_col).alias("_mx"),
        )
        .filter(F.col("_owner") != F.col("_mx"))
        .select("key", "_owner")
    )

    marked = (
        g.join(dup, "key")
        .filter(F.col(id_col) != F.col("_owner"))
        .select(
            id_col,
            F.col("pos").alias("s"),
            (F.col("pos") + F.lit(k - 1)).alias("e"),
        )
    )

    # gaps-and-islands: a new span starts where this interval leaves
    # a gap of at least one kept token after everything before it.
    w_order = Window.partitionBy(id_col).orderBy("s")
    run_max = F.max("e").over(
        w_order.rowsBetween(Window.unboundedPreceding, -1)
    )
    spans = (
        marked.withColumn(
            "_brk",
            (F.col("s") > F.coalesce(run_max, F.lit(-1)) + 1).cast("int"),
        )
        .withColumn("_iid", F.sum("_brk").over(w_order))
        .groupBy(id_col, "_iid")
        .agg(F.min("s").alias("s"), F.max("e").alias("e"))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_spans"),
            F.sum(F.col("e") - F.col("s") + 1).alias("tokens_removed"),
            F.sort_array(F.collect_list(F.struct("s", "e"))).alias("_spans"),
        )
    )

    toks = _tokens(docs, id_col, text_col)
    joined = toks.join(spans, id_col, "left")
    kept = F.when(
        F.col("n_spans").isNull(), F.col("_w")
    ).otherwise(
        F.expr(
            "transform("
            "  filter("
            "    transform(_w, (x, j) -> struct(x as t, j + 1 as p)),"
            "    s -> !exists(_spans, iv -> s.p >= iv.s and s.p <= iv.e)"
            "  ), s -> s.t)"
        )
    )
    return joined.select(
        F.col(id_col),
        F.size("_w").cast("long").alias("n_tokens"),
        F.coalesce(F.col("n_spans"), F.lit(0)).cast("long").alias("n_spans"),
        F.coalesce(F.col("tokens_removed"), F.lit(0))
        .cast("long")
        .alias("tokens_removed"),
        F.array_join(kept, " ").alias("dedup_text"),
    )


def dedup_spans_incremental(
    delta: DataFrame,
    base: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
) -> DataFrame:
    """Incremental span dedup: scrub a DELTA batch against a FROZEN
    base corpus — the shape a growing corpus actually runs (full
    corpus-wide re-dedup per ingest is O(corpus), this is O(delta)).

    A delta span is removed iff its k-gram key exists ANYWHERE in the
    base (the base is immutable and always the owner — matching the
    batch operator's keep-first rule under "base ids < delta ids");
    delta-vs-delta duplicates are deliberately NOT considered (they
    belong to the next full-corpus pass, exactly like incremental
    curation defers re-calibration — plans/incremental.py). Same
    output schema as `dedup_spans`.

    Scale shape: the base side reduces to DISTINCT gram keys — a
    16-hex-per-gram relation buildable once and reusable across
    ingests (persist or write it as the index table); the delta side
    explodes, joins on the key (ids-only), and rewrites exactly as
    the batch operator does. The base TEXT is never read again."""
    base_keys = (
        gram_positions(base, id_col, text_col, k).select("key").distinct()
    )
    g = gram_positions(delta, id_col, text_col, k)
    marked = g.join(base_keys, "key").select(
        id_col,
        F.col("pos").alias("s"),
        (F.col("pos") + F.lit(k - 1)).alias("e"),
    )

    w_order = Window.partitionBy(id_col).orderBy("s")
    run_max = F.max("e").over(
        w_order.rowsBetween(Window.unboundedPreceding, -1)
    )
    spans = (
        marked.withColumn(
            "_brk",
            (F.col("s") > F.coalesce(run_max, F.lit(-1)) + 1).cast("int"),
        )
        .withColumn("_iid", F.sum("_brk").over(w_order))
        .groupBy(id_col, "_iid")
        .agg(F.min("s").alias("s"), F.max("e").alias("e"))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_spans"),
            F.sum(F.col("e") - F.col("s") + 1).alias("tokens_removed"),
            F.sort_array(F.collect_list(F.struct("s", "e"))).alias("_spans"),
        )
    )

    toks = _tokens(delta, id_col, text_col)
    joined = toks.join(spans, id_col, "left")
    kept = F.when(
        F.col("n_spans").isNull(), F.col("_w")
    ).otherwise(
        F.expr(
            "transform("
            "  filter("
            "    transform(_w, (x, j) -> struct(x as t, j + 1 as p)),"
            "    s -> !exists(_spans, iv -> s.p >= iv.s and s.p <= iv.e)"
            "  ), s -> s.t)"
        )
    )
    return joined.select(
        F.col(id_col),
        F.size("_w").cast("long").alias("n_tokens"),
        F.coalesce(F.col("n_spans"), F.lit(0)).cast("long").alias("n_spans"),
        F.coalesce(F.col("tokens_removed"), F.lit(0))
        .cast("long")
        .alias("tokens_removed"),
        F.array_join(kept, " ").alias("dedup_text"),
    )
