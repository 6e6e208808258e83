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
                F.split(F.lower(F.col(text_col)), r"\s+"),
                lambda x: x != F.lit(""),
            )
        ).alias("term"),
    )
    tf = words.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
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
