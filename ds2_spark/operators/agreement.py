"""Inter-rater agreement statistics (Cohen's kappa per rater pair).

DS2's premise is that LLM raters are NOISY — its whole curation stack
(score-error detection via rating transition matrices,
`score_curation/` in the reference; see docta/core/hoc.py for the
consensus estimator this package reimplements in operators/hoc.py)
exists because per-rater quality scores disagree. Before spending a
calibration pass, a pipeline operator wants the cheap diagnostic
every annotation shop runs first: pairwise chance-corrected agreement
between raters. A rater whose kappa against every peer is low is the
one whose transition matrix the calibration must fix (or whose
ratings get down-weighted).

Cohen's kappa for raters (a, b) over items both rated:

    po = agree / n                      (observed agreement)
    pe = sum_l row_l * col_l / n^2      (chance agreement from marginals)
    kappa = (po - pe) / (1 - pe)
          = (agree * n - pe_num) / (n * n - pe_num)   [exact integers]

where pe_num = sum_l (#items a rated l) * (#items b rated l).

Cross-engine exactness: every aggregate is an int64 count; po and
kappa are each ONE IEEE-754 division of two exact integers, which is
bit-identical in every engine (the priority-sampling recipe, NOTES.md
#49) — no rounding grid needed.

Spark shape at 10^12 items: the only big shuffle is the item-keyed
self-join (co-partitioned hash join on item_id); everything after is
a groupBy on (rater_a, rater_b, label_a, label_b) whose cardinality
is R^2 * L^2 — map-side combine collapses each partition to at most
that many rows, so the second shuffle is tiny regardless of item
count. R (raters) and L (label levels) are small constants. No
window over items, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pairwise_rater_agreement(
    scores: DataFrame,
    item_col: str = "clip_id",
    rater_col: str = "rater",
    label_col: str = "label",
) -> DataFrame:
    """Cohen's kappa for every unordered rater pair.

    Input: one row per (item, rater) with a discrete label (ties the
    reference's 1..5 LLM ratings; any orderable label type works).
    Duplicate (item, rater) rows are rejected upstream concerns — the
    self-join would multiply them; callers dedup first if unsure.

    Output, one row per pair (rater_a < rater_b):
      n_items   items rated by both
      n_agree   items with identical labels
      pe_num    sum_l row_l * col_l  (chance-agreement numerator)
      po        n_agree / n_items
      kappa     (n_agree*n - pe_num) / (n*n - pe_num); NULL when the
                denominator is 0 (pe == 1: both raters constant —
                kappa is undefined there, surfacing it as NULL beats
                inventing a value)
    """
    a = scores.select(
        F.col(item_col).alias("_item"),
        F.col(rater_col).alias("rater_a"),
        F.col(label_col).alias("la"),
    )
    b = scores.select(
        F.col(item_col).alias("_item"),
        F.col(rater_col).alias("rater_b"),
        F.col(label_col).alias("lb"),
    )
    # one co-partitioned join on the item key, then ONLY tiny keys shuffle
    joint = a.join(b, "_item").where(F.col("rater_a") < F.col("rater_b"))
    conf = joint.groupBy("rater_a", "rater_b", "la", "lb").agg(
        F.count("*").alias("c")
    )
    # marginals from the confusion matrix (R^2*L^2 rows — broadcast-size)
    row_m = conf.groupBy("rater_a", "rater_b", "la").agg(
        F.sum("c").alias("row_c")
    )
    col_m = conf.groupBy("rater_a", "rater_b", "lb").agg(
        F.sum("c").alias("col_c")
    )
    # both marginal frames descend from `conf`, so bare column refs
    # would resolve to the SAME attribute (a trivially-true predicate);
    # explicit aliases force a real equi-join
    pe = (
        row_m.alias("rm")
        .join(
            col_m.alias("cm"),
            (F.col("rm.rater_a") == F.col("cm.rater_a"))
            & (F.col("rm.rater_b") == F.col("cm.rater_b"))
            & (F.col("rm.la") == F.col("cm.lb")),
        )
        .select(
            F.col("rm.rater_a").alias("rater_a"),
            F.col("rm.rater_b").alias("rater_b"),
            "row_c",
            "col_c",
        )
        .groupBy("rater_a", "rater_b")
        .agg(F.sum(F.col("row_c") * F.col("col_c")).alias("pe_num"))
    )
    tot = conf.groupBy("rater_a", "rater_b").agg(
        F.sum("c").alias("n_items"),
        F.sum(F.when(F.col("la") == F.col("lb"), F.col("c")).otherwise(0)).alias(
            "n_agree"
        ),
    )
    # LEFT join + coalesce 0: raters with DISJOINT label sets have no
    # matching (la == lb) marginal row, so an inner join would drop
    # the pair entirely — and that pair (pe_num 0, kappa 0, po 0) is
    # exactly the disagrees-with-every-peer case this diagnostic
    # exists to surface.
    out = tot.join(pe, ["rater_a", "rater_b"], "left").withColumn(
        "pe_num", F.coalesce(F.col("pe_num"), F.lit(0))
    )
    n = F.col("n_items")
    # the exact-integer kappa form overflows int64 when n_items
    # exceeds sqrt(2^63) — fail LOUDLY there (the repo's
    # capacity-enforced policy) instead of wrapping to garbage; at
    # that co-rated count the caller should sample pairs anyway
    n_guarded = F.when(
        n <= F.lit(3_037_000_499), n
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("pairwise_rater_agreement: n_items overflows the "
                      "exact int64 kappa form for pair ("),
                F.col("rater_a"), F.lit(", "), F.col("rater_b"),
                F.lit(") — sample items below 3.03e9 per pair"),
            )
        ).cast("long")
    )
    denom = n_guarded * n_guarded - F.col("pe_num")
    return out.select(
        "rater_a",
        "rater_b",
        "n_items",
        "n_agree",
        "pe_num",
        (F.col("n_agree") / n).alias("po"),
        F.when(
            denom != 0, (F.col("n_agree") * n - F.col("pe_num")) / denom
        ).alias("kappa"),
    )
