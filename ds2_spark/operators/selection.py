"""Diversity-aware dual-sort subset selection (operator K7).

Reference: subset_generation.py:43-76 — walk score buckets 5→0; if the
whole bucket fits in the remaining budget take it all, otherwise take
the remainder ranked by long-tail score descending. Ties broken by
clip_id ascending (the reference relies on np.argsort stability —
SURVEY.md §7.3 'Selection tie-breaking').

Spark shape (scale-safe): ranking within a score bucket must NOT be a
window partitioned by the 6-value score column — at the 10^12-row
design point that is a single task sorting ~N/6 rows. Instead the
rank decomposes exactly:

  sel_rank(row) = (# rows in the bucket with lt > row.lt)   [cum_before]
                + rank among the row's own (score, lt) ties by clip_id

because lt_score is quantized (the long-tail sigmoid rounds to 4dp →
≤10001 distinct values; get_lr_score.py:48-50 analog), the per-bucket
value histogram is a tiny aggregate: cum_before comes from a
driver-side cumulative sum over ≤6×10001 histogram rows broadcast
back, and the tie rank is a window over (score, lt) — many small
partitions, never one giant sort. One shuffle total, every task
bounded by the largest tie group.

A non-quantized lt column would blow the histogram, so the operator
guards on distinct-pair count and falls back to the plain
bucket-window ranking (correct, but only for bounded inputs — the
fallback is the round-1 implementation).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import NUM_CLASSES

# ceiling on distinct (score, lt) pairs for the histogram path; 4dp
# sigmoid lt gives ≤ 6 * 10001 — two orders of magnitude of headroom
MAX_HIST_PAIRS = 1_000_000


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


def _lt_sort_key(v):
    """Driver-side mirror of Spark's F.desc(lt) ordering so the
    histogram path ranks exactly like the window fallback: NaN sorts
    above every number, NULL sorts last (desc_nulls_last default)."""
    if v is None:
        return (0, 0.0)
    if isinstance(v, float) and math.isnan(v):
        return (2, 0.0)
    return (1, float(v))


def _rank_via_histogram(
    scored: DataFrame, hist_rows, budgets: dict[int, int], score_col: str, lt_col: str
) -> DataFrame:
    """sel_rank = cum_before(score, lt) + tie rank by clip_id; the
    per-score bucket_take rides the same broadcast join (one small
    join instead of two)."""
    spark = scored.sparkSession
    by_score: dict = {}
    for r in hist_rows:
        by_score.setdefault(r[score_col], []).append((r[lt_col], int(r["n_ties"])))
    cum_rows = []
    for s, vals in by_score.items():
        vals.sort(key=lambda x: _lt_sort_key(x[0]), reverse=True)
        cum = 0
        take = int(budgets.get(int(s), 0)) if s is not None else 0
        for lt, n in vals:
            cum_rows.append((s, lt, cum, take))
            cum += n
    cum_df = spark.createDataFrame(
        cum_rows,
        f"{score_col} int, {lt_col} double, _cum_before long, bucket_take int",
    )
    # eqNullSafe on lt: NULL lt rows must rank (last), not vanish —
    # the window fallback keeps them, so the histogram path must too.
    # (Spark joins already treat NaN = NaN as true.)
    sc = scored.alias("sc")
    cm = cum_df.alias("cm")
    cond = (F.col(f"sc.{score_col}") == F.col(f"cm.{score_col}")) & F.col(
        f"sc.{lt_col}"
    ).eqNullSafe(F.col(f"cm.{lt_col}"))
    tie_w = Window.partitionBy(f"sc.{score_col}", f"sc.{lt_col}").orderBy(
        F.asc("clip_id")
    )
    return (
        sc.join(F.broadcast(cm), cond)
        .withColumn(
            "sel_rank",
            (F.col("_cum_before") + F.row_number().over(tie_w)).cast("int"),
        )
        .select("sc.*", "sel_rank", "bucket_take")
    )


def select_subset(
    scored: DataFrame,
    budget: int,
    score_col: str = "final_score",
    lt_col: str = "lt_score",
) -> DataFrame:
    """Input: one row per candidate clip with its curated score and
    long-tail score. Output: input + `sel_rank` + `selected` boolean.
    Exactly min(budget, N) rows have selected=true."""
    hist = (
        scored.groupBy(score_col, lt_col)
        .agg(F.count("*").alias("n_ties"))
        .limit(MAX_HIST_PAIRS + 1)
        .collect()
    )
    hist_ok = len(hist) <= MAX_HIST_PAIRS
    if hist_ok:
        sizes: dict[int, int] = {}
        for r in hist:
            if r[score_col] is None:  # null-score rows never selectable
                continue
            s = int(r[score_col])
            sizes[s] = sizes.get(s, 0) + int(r["n_ties"])
    else:
        # truncated histogram can't give exact sizes — re-aggregate
        sizes = {
            int(r[score_col]): int(r["n"])
            for r in scored.groupBy(score_col).agg(F.count("*").alias("n")).collect()
        }
    budgets = bucket_budgets(sizes, budget)

    if hist_ok:
        ranked = _rank_via_histogram(scored, hist, budgets, score_col, lt_col)
    else:
        # unquantized lt: bounded-input fallback (single sort per bucket)
        spark = scored.sparkSession
        bdf = spark.createDataFrame(
            [(s, t) for s, t in budgets.items()], f"{score_col} int, bucket_take int"
        )
        w = Window.partitionBy(score_col).orderBy(F.desc(lt_col), F.asc("clip_id"))
        ranked = scored.withColumn("sel_rank", F.row_number().over(w)).join(
            F.broadcast(bdf), score_col
        )

    return ranked.withColumn(
        "selected", F.col("sel_rank") <= F.col("bucket_take")
    ).drop("bucket_take")
