"""Per-document TF-IDF keyword extraction.

The classic corpus-statistics operator the quality/dedup family
doesn't cover: term scores that depend on GLOBAL document frequency,
so the plan has to move corpus-wide aggregates, not per-row features.
Used in a training-data pipeline for keyword tagging, topic
balancing, and cheap relevance features.

Spark shape at the 10^12-doc design point:
- tf: explode words -> groupBy (doc, word) count. Map-side combine
  bounds the shuffle by distinct words per partition.
- df: distinct (doc, word) -> groupBy word. The word dictionary is
  Zipf-long but each key is (word, count) — a few GB at web scale,
  far too big to broadcast, so tf joins df with a plain shuffle on
  word (both sides already hash-partitioned by word after their
  aggs; Catalyst reuses the partitioning).
- top-k per doc: window row_number over (score desc, word asc) —
  deterministic under ties — shuffling ids+words+scores only.

Smoothed idf = ln((N + 1) / (df + 1)) + 1 (sklearn's smooth_idf
formula, strictly positive so every term keeps a defined score).
Scores are rounded to 6 dp at the boundary: Spark's Math.log and
another engine's libm may disagree in the last ulp, and the rounding
makes the operator's output engine-portable (the contract oracle
recomputes it in DuckDB to the same 6 dp).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import WS_SPLIT


def tfidf_top_terms(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Top-k terms per document by smoothed TF-IDF.

    Output: (id_col, term, tf, df, score, rank), rank 1..k per doc,
    ties broken by term ascending.
    """
    words = docs.select(
        F.col(id_col),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), WS_SPLIT),
                lambda x: x != F.lit(""),
            )
        ).alias("term"),
    )
    # tf feeds both the df census and the scored join; materialize it
    # once (lazy localCheckpoint) instead of re-exploding the corpus
    # per consumer — same pattern as bm25_topk's term index below
    tf = (
        words.groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=False)
    )
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.select(id_col).distinct().count()
    scored = tf.join(df_, "term").select(
        F.col(id_col),
        "term",
        "tf",
        "df",
        F.round(
            F.col("tf")
            * (F.log((F.lit(n_docs) + 1.0) / (F.col("df") + 1.0)) + 1.0),
            6,
        ).alias("score"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 top-k retrieval of documents for a small query set.

    Output: (query_id, doc_id, score, rank), rank 1..k per query by
    (score desc, doc_id asc). Lucene's positive smoothed idf:
    ln((N - df + 0.5) / (df + 0.5) + 1); term weight
    idf * tf / (tf + k1 * (1 - b + b * dl/avgdl)); repeated query
    terms count once (standard bag-of-unique-terms query model).

    Spark shape: the query side is tiny by nature (a query workload,
    not a table), so its distinct (query_id, term) pairs BROADCAST
    onto the corpus term index — the corpus-side tf table shuffles
    only on its own aggregations, and the scored join emits
    (query, doc) partial weights that one groupBy reduces. N, df,
    dl, and the corpus length total are exact integers, so the one
    fixed double expression matches any engine bit-for-bit after the
    6-dp rounding applied BEFORE ranking (same discipline as
    tfidf_top_terms).
    """
    words = lambda c: F.filter(  # noqa: E731
        F.split(F.lower(c), WS_SPLIT), lambda x: x != F.lit("")
    )
    doc_terms = docs.select(
        F.col(id_col), F.explode(words(F.col(text_col))).alias("term")
    )
    # the term index (tf) feeds three consumers (dl, df, the scored
    # join); Catalyst does not dedupe common subplans, so without
    # materialization the corpus would be scanned+exploded once per
    # consumer. A LAZY localCheckpoint computes the index on first
    # use and every other branch reads the materialized blocks —
    # corpus crosses the wire once, like every other index operator
    # here. (On a real cluster, write the index to a table and query
    # it many times; this bounds the one-shot path.)
    tf = (
        doc_terms.groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=False)
    )
    # doc length from the tf aggregate, not a second corpus explode:
    # sum(tf) per doc == token count
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))

    n_docs = docs.select(id_col).distinct().count()
    total_len = dl.agg(F.sum("dl")).collect()[0][0] or 0
    # exact-integer inputs; the double division happens once, in the
    # same form, in every engine
    avgdl = F.lit(float(total_len)) / F.lit(float(max(n_docs, 1)))

    q_terms = queries.select(
        F.col(query_id_col),
        F.explode(words(F.col(query_text_col))).alias("term"),
    ).distinct()

    idf = F.log(
        (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    weight = idf * F.col("tf") / (
        F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / avgdl)
    )
    scored = (
        tf.join(F.broadcast(q_terms), "term")
        .join(dl, id_col)
        .join(F.broadcast(df_.join(F.broadcast(q_terms.select("term").distinct()), "term")), "term")
        .groupBy(query_id_col, id_col)
        .agg(F.round(F.sum(weight), 6).alias("score"))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
