"""Benchmark decontamination: drop training documents that contain
any word n-gram from a held-out evaluation set.

The standard LLM-pipeline step (GPT-3 appendix C / The Pile: 13-gram
overlap removal) that none of the dedup operators cover: dedup
compares the corpus against ITSELF; decontamination compares it
against a small external benchmark. Reference analog: DS2 curates by
per-sample quality scores (LLM_scoring/); leakage removal is the
complementary hygiene step any 10^12-clip training corpus needs
before the quality filter's keep/drop verdict is trusted.

Spark shape — the benchmark side is tiny by nature (benchmarks are
thousands of documents, the corpus is trillions), so its distinct
n-gram keys BROADCAST: the corpus-side explode never shuffles, each
partition probes the broadcast hash set locally, and the only
wide op is the distinct/count per contaminated doc_id (ids only,
already tiny). Keys are the first 16 hex chars of md5(gram) — 64
bits, birthday-safe for benchmark-scale key sets, engine-portable
(identical strings in Spark, DuckDB, Python), and they cap key width
for long n-grams.

Normalization (mirrored by the contract oracle): words = lowercased
split on whitespace, empties dropped; an n-gram is n consecutive
words joined by single spaces. A document with fewer than n words
has no n-grams and can never be contaminated.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import WS_SPLIT


def _words(text: Column) -> Column:
    return F.filter(
        F.split(F.lower(text), WS_SPLIT), lambda x: x != F.lit("")
    )


def ngram_keys(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """(id, key) for every distinct word n-gram of every document.
    sequence(1, m) with m < 1 would descend (Spark picks step -1), so
    short docs get an explicit empty array.

    Dedup happens MAP-SIDE via array_distinct on the gram array (all
    of one doc's grams live in that one array, and ids differ across
    docs, so rows are globally unique with no shuffle) — the former
    post-explode `.distinct()` paid a full (id, key) exchange for the
    same result (guide §2.4: remove shuffles outright). Dedup is by
    gram STRING rather than by 64-bit key: indistinguishable unless
    one doc holds two different n-grams with colliding md5 prefixes
    (and arguably the more faithful reading of "distinct n-grams")."""
    grams = F.when(
        F.size(F.col("_w")) >= n,
        F.array_distinct(
            F.expr(
                f"transform(sequence(1, size(_w) - {n - 1}), "
                f"i -> array_join(slice(_w, i, {n}), ' '))"
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        df.select(F.col(id_col), _words(F.col(text_col)).alias("_w"))
        .select(F.col(id_col), F.explode(grams).alias("_g"))
        .select(F.col(id_col), F.substring(F.md5("_g"), 1, 16).alias("key"))
    )


def contamination_report(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str | None = None,
    bench_text_col: str | None = None,
    n: int = 13,
) -> DataFrame:
    """(id_col, n_hits) for every training doc sharing >= 1 word
    n-gram with the benchmark; n_hits = distinct shared n-grams.
    Benchmark keys broadcast; corpus grams never shuffle."""
    bench_keys = ngram_keys(
        benchmark,
        bench_id_col or id_col,
        bench_text_col or text_col,
        n,
    ).select("key").distinct()
    doc_keys = ngram_keys(docs, id_col, text_col, n)
    return (
        doc_keys.join(F.broadcast(bench_keys), "key")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hits"))
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
    **kwargs,
) -> DataFrame:
    """Training corpus minus every document the report flags — one
    broadcast probe + one ids-only anti-join."""
    hits = contamination_report(
        docs, benchmark, id_col=id_col, text_col=text_col, n=n, **kwargs
    )
    return docs.join(hits.select(id_col), id_col, "left_anti")


def containment_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    threshold: float = 0.8,
    max_bucket: int = 200,
) -> DataFrame:
    """Asymmetric near-dup detection: (id_a, id_b, containment) where
    containment = |grams(A) ∩ grams(B)| / |grams(A)| >= threshold —
    doc A is (mostly) CONTAINED in doc B. Catches quotes, boilerplate
    wrappers, and sub-document copies that symmetric signatures
    (SimHash/MinHash estimate the Jaccard of the UNION) structurally
    miss: a 100-word doc fully quoted inside a 10'000-word doc has
    Jaccard ~0.01 but containment 1.0.

    Spark shape — same discipline as the LSH family: texts never
    pair; the (gram-key, id) explode is the only wide data, pairs
    form per shared gram key (ids only), and hot keys (boilerplate
    grams shared by everything) are CAPPED at max_bucket members and
    dropped — a gram shared by thousands of docs identifies nothing.
    The |A ∩ B| count then aggregates ids-only pairs and one join
    brings in |grams(A)| for the ratio. Both directions are emitted
    (containment is asymmetric); id_a == id_b is excluded.

    Capping is DISCLOSED recall loss exactly like LSH max_bucket:
    pairs sharing only ultra-common grams are not reported. Exact
    oracle: the contract twin recomputes with the same cap.
    """
    # the gram index feeds four consumers (sizes, bucket census, both
    # join sides); Catalyst does not dedupe common subplans, so
    # materialize it once (lazy localCheckpoint — same pattern as the
    # BM25 term index) instead of re-exploding the corpus per branch
    keys = ngram_keys(docs, id_col, text_col, n).localCheckpoint(eager=False)
    sizes = keys.groupBy(id_col).agg(F.count("*").alias("_n_grams"))
    bucket_ok = (
        keys.groupBy("key")
        .agg(F.count("*").alias("_b"))
        .where(F.col("_b") <= max_bucket)
        .select("key")
    )
    k = keys.join(bucket_ok, "key")
    a = k.select(F.col("key"), F.col(id_col).alias("id_a"))
    b = k.select(F.col("key"), F.col(id_col).alias("id_b"))
    shared = (
        a.join(b, "key")
        .where(F.col("id_a") != F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("_shared"))
    )
    return (
        shared.join(
            sizes.select(F.col(id_col).alias("id_a"), "_n_grams"), "id_a"
        )
        .select(
            "id_a",
            "id_b",
            F.round(F.col("_shared") / F.col("_n_grams"), 6).alias(
                "containment"
            ),
        )
        .where(F.col("containment") >= threshold)
    )


def _bloom_positions(key: Column, k: int, m_bits: int) -> Column:
    """k bit positions for a 16-hex gram key: 5-hex (20-bit) slices of
    md5(key) reduced mod m_bits. String-derived like the HLL sketch
    (functions/sketches.py) — no 64-bit numeric conversion, replayable
    in any SQL engine. Duplicate positions within one key collapse
    (membership needs every DISTINCT position present)."""
    if not 1 <= k <= 6:
        raise ValueError("k must be in 1..6 (32 md5 hex chars / 5)")
    h = F.md5(key)
    return F.array_distinct(
        F.array(
            *[
                (
                    F.conv(F.substring(h, 1 + 5 * i, 5), 16, 10).cast("long")
                    % m_bits
                ).cast("int")
                for i in range(k)
            ]
        )
    )


def bloom_contamination_report(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str | None = None,
    bench_text_col: str | None = None,
    n: int = 13,
    k: int = 3,
    m_bits: int = 1 << 20,
) -> DataFrame:
    """Bloom-filter variant of `contamination_report` — the scale path
    when even the benchmark's distinct n-gram KEY set is too wide to
    broadcast comfortably: what broadcasts instead is the set of
    distinct BIT POSITIONS (at most min(k*n_keys, m_bits) ints — a
    2^20-bit filter is 4 MB dense, and this relational emulation stays
    proportional to occupancy). A corpus gram is flagged iff ALL its k
    positions are set, so output is a SUPERSET of the exact report:
    false positives at rate ~(k*n_keys/m_bits)^k (pick m_bits for the
    benchmark size), never false negatives — the right direction for
    decontamination, where a flagged doc gets re-checked or dropped
    cheaply. Output: (id, n_flagged_grams) per possibly-contaminated
    doc.

    Exactly replayable cross-engine (contract query
    q_bloom_decontaminate): positions are md5 string arithmetic, the
    all-k test is a relational join + count, no actual bitset state."""
    bench_keys = ngram_keys(
        benchmark, bench_id_col or id_col, bench_text_col or text_col, n
    ).select("key").distinct()
    bloom = (
        bench_keys.select(
            F.explode(_bloom_positions(F.col("key"), k, m_bits)).alias("pos")
        )
        .distinct()
    )
    doc_keys = ngram_keys(docs, id_col, text_col, n)
    # one md5 + k conv evaluations per gram: the positions array is a
    # materialized column below the Generate, so explode and size()
    # both read it instead of each re-deriving it (the former select
    # computed _bloom_positions twice per gram)
    probe = (
        doc_keys.withColumn(
            "_pos", _bloom_positions(F.col("key"), k, m_bits)
        )
        .select(
            id_col,
            "key",
            F.explode("_pos").alias("pos"),
            F.size("_pos").alias("npos"),
        )
    )
    flagged = (
        probe.join(F.broadcast(bloom), "pos")
        .groupBy(id_col, "key", "npos")
        .agg(F.count("*").alias("hits"))
        .filter(F.col("hits") == F.col("npos"))
    )
    return flagged.groupBy(id_col).agg(
        F.count("*").alias("n_flagged_grams")
    )
