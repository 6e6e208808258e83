"""Blocked fuzzy matching (record linkage) on short text keys.

Near-identical titles/names with small edit distances are the classic
record-linkage problem: an all-pairs Levenshtein over 10^12 rows is
O(n^2) and dead on arrival. The standard scale shape is BLOCKING:
rows only pair within a cheap equality block (here: first character +
coarse length bucket), then the exact edit-distance verify runs on
candidates only. Two strings within edit distance d differ in length
by at most d, so a length bucket of width >= d+1 with adjacent-bucket
probing loses nothing; with same-bucket-only pairing the recall loss
is bounded and DISCLOSED (same contract as the LSH max_bucket caps).

Spark shape: the block key is a pure column expression; pairs form by
a self-equi-join on the block key with ids+keys only (the corpus
never crosses the wire twice); `levenshtein` is a JVM built-in with
the same integer semantics in DuckDB, so the contract twin is exact.
Hot blocks are capped like every other candidate generator here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def blocked_fuzzy_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    key_col: str = "title",
    max_dist: int = 3,
    length_bucket: int = 4,
    max_block: int = 500,
) -> DataFrame:
    """(id_a, id_b, dist) for id_a < id_b with levenshtein(key_a,
    key_b) <= max_dist, candidates restricted to the same (first
    char, floor(len/length_bucket)) block. length_bucket should be
    > max_dist so near-misses mostly share a bucket; pairs whose keys
    straddle a bucket or first-char boundary are the disclosed recall
    loss. Blocks larger than max_block are dropped whole (a block
    that holds half the corpus is a degenerate key, not a signal)."""
    keyed = df.select(
        F.col(id_col).alias("_id"),
        F.col(key_col).alias("_k"),
        F.concat_ws(
            "|",
            F.substring(F.col(key_col), 1, 1),
            F.floor(F.length(key_col) / length_bucket).cast("string"),
        ).alias("_blk"),
    ).where(F.length("_k") > 0)
    # three consumers (block census + both join sides): materialize
    # the narrow keyed projection once rather than re-scanning
    keyed = keyed.localCheckpoint(eager=False)
    ok = (
        keyed.groupBy("_blk")
        .agg(F.count("*").alias("_n"))
        .where(F.col("_n") <= max_block)
        .select("_blk")
    )
    k = keyed.join(ok, "_blk")
    a = k.select("_blk", F.col("_id").alias("id_a"), F.col("_k").alias("_ka"))
    b = k.select("_blk", F.col("_id").alias("id_b"), F.col("_k").alias("_kb"))
    return (
        a.join(b, "_blk")
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.levenshtein("_ka", "_kb").alias("dist"),
        )
        .where(F.col("dist") <= max_dist)
    )
