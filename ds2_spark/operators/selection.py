"""Diversity-aware dual-sort subset selection (operator K7).

Reference: subset_generation.py:43-76 — walk score buckets 5→0; if the
whole bucket fits in the remaining budget take it all, otherwise take
the remainder ranked by long-tail score descending. Ties broken by
clip_id ascending (the reference relies on np.argsort stability —
SURVEY.md §7.3 'Selection tie-breaking').

Spark shape: the 6 bucket sizes are a tiny driver-side aggregate; the
per-bucket take becomes one window rank + a broadcast-joined budget —
a single shuffle by score bucket, no driver loop over rows, valid at
any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import NUM_CLASSES


def bucket_budgets(sizes: dict[int, int], budget: int) -> dict[int, int]:
    """Greedy bucket fill 5→0: returns per-score take counts."""
    remaining = budget
    take: dict[int, int] = {}
    for score in range(NUM_CLASSES - 1, -1, -1):
        size = sizes.get(score, 0)
        t = min(size, max(remaining, 0))
        take[score] = t
        remaining -= t
    return take


def select_subset(
    scored: DataFrame,
    budget: int,
    score_col: str = "final_score",
    lt_col: str = "lt_score",
) -> DataFrame:
    """Input: one row per candidate clip with its curated score and
    long-tail score. Output: input + `selected` boolean + `sel_rank`.
    Exactly min(budget, N) rows have selected=true."""
    sizes = {
        int(r[score_col]): int(r["n"])
        for r in scored.groupBy(score_col).agg(F.count("*").alias("n")).collect()
    }
    budgets = bucket_budgets(sizes, budget)
    spark = scored.sparkSession
    bdf = spark.createDataFrame(
        [(s, t) for s, t in budgets.items()], [score_col, "bucket_take"]
    )
    w = Window.partitionBy(score_col).orderBy(F.desc(lt_col), F.asc("clip_id"))
    return (
        scored.withColumn("sel_rank", F.row_number().over(w))
        .join(F.broadcast(bdf), score_col)
        .withColumn("selected", F.col("sel_rank") <= F.col("bucket_take"))
        .drop("bucket_take")
    )
