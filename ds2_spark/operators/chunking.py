"""Document chunking and greedy sequence packing — the two transforms
between a filtered corpus and a training dataloader.

- chunk_documents: split each document into overlapping fixed-size
  token windows (the standard context-length prep: chunk_tokens per
  example, overlap tokens carried between neighbors so no span is
  ever cut without context). Pure JVM: tokens via split, chunk
  starts via sequence(), texts via slice + array_join — one explode,
  no Python, no shuffle at all until the caller aggregates.
- pack_chunks: assign chunks to fixed-token-budget bins in a
  deterministic order (greedy running-sum packing, the streaming
  analog of first-fit). A running cumulative sum over a window keyed
  by a partition column gives bin = floor((cumsum - len) / budget);
  each key packs independently, so the plan is one shuffle on the
  pack key and scales by adding keys. Deterministic: same input,
  same order column, same bins — resume-stable by construction.

Reference analog: DS2 feeds curated subsets to model_finetune/'s
tokenizer+collator; at 10^12-clip scale the chunk/pack step IS the
dataloader contract, so it belongs in the engine where it can run
distributed and oracle-checked.

Token = whitespace token throughout (the engine's token_count_col
convention); swap the splitter for a BPE regex without touching the
plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import WS_SPLIT


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 8,
) -> DataFrame:
    """(id_col, chunk_idx, n_tokens, chunk_text) — one row per chunk.

    Chunk i covers tokens [i*stride, i*stride + chunk_tokens) with
    stride = chunk_tokens - overlap; the final chunk may be short but
    is never empty; documents shorter than chunk_tokens yield exactly
    one chunk; empty/NULL docs yield none. Chunk count is
    ceil(max(n - overlap, 1) / stride) — mirrored in SQL as integer
    arithmetic so both engines agree on every boundary.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = F.filter(
        F.split(F.col(text_col), WS_SPLIT), lambda x: x != F.lit("")
    )
    n = F.size("_toks")
    n_chunks = F.floor(
        (F.greatest(n - F.lit(overlap), F.lit(1)) + F.lit(stride - 1))
        / F.lit(stride)
    ).cast("int")
    return (
        docs.select(F.col(id_col), toks.alias("_toks"))
        .filter(F.size("_toks") > 0)
        .select(
            F.col(id_col),
            "_toks",
            F.explode(
                F.sequence(F.lit(0), n_chunks - F.lit(1))
            ).alias("chunk_idx"),
        )
        .select(
            F.col(id_col),
            "chunk_idx",
            F.slice(
                "_toks",
                F.col("chunk_idx") * stride + F.lit(1),
                F.lit(chunk_tokens),
            ).alias("_ctoks"),
        )
        .select(
            F.col(id_col),
            "chunk_idx",
            F.size("_ctoks").alias("n_tokens"),
            F.array_join("_ctoks", " ").alias("chunk_text"),
        )
    )


def pack_chunks(
    chunks: DataFrame,
    budget_tokens: int = 256,
    key_col: str | None = None,
    id_col: str = "doc_id",
    order_cols: tuple[str, ...] = ("doc_id", "chunk_idx"),
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Adds (bin, bin_offset): deterministic in-order packing of
    chunks into ~budget_tokens bins. bin = floor((running_sum -
    n_tokens) / budget) over the deterministic order: a chunk belongs
    to the bin its START position falls in on the concatenated token
    line, so bin token totals land within max_chunk-1 of the budget
    on either side (exact capacity closing is a stateful scan no
    cumsum expresses; with max_chunk << budget this streaming pack is
    the standard trade and the dataloader pads/splits at the seam).
    With key_col, each key packs independently (one shuffle on key);
    without, a single global ordering is used — fine for bounded
    inputs, use a key at scale (a global window is one task).

    Oversized chunks (n_tokens > budget_tokens) are rejected: silent
    truncation would corrupt training examples.
    """
    parts = [key_col] if key_col else []
    w = (
        Window.partitionBy(*parts).orderBy(*[F.col(c) for c in order_cols])
        if parts
        else Window.orderBy(*[F.col(c) for c in order_cols])
    )
    out = chunks.withColumn(
        "_cum", F.sum(tokens_col).over(w)
    ).select(
        "*",
        F.floor((F.col("_cum") - F.col(tokens_col)) / budget_tokens)
        .cast("int")
        .alias("bin"),
        ((F.col("_cum") - F.col(tokens_col)) % budget_tokens)
        .cast("int")
        .alias("bin_offset"),
    ).drop("_cum")
    # fail loudly on oversize rather than emitting a corrupt example
    return out.withColumn(
        "bin",
        F.when(
            F.col(tokens_col) > budget_tokens,
            F.raise_error(
                F.concat(
                    F.lit("pack_chunks: chunk exceeds budget: "),
                    F.col(tokens_col).cast("string"),
                )
            ).cast("int"),
        ).otherwise(F.col("bin")),
    )
