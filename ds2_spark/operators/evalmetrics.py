"""Pipeline-evaluation metrics: ranking AUC, calibration bins, WER.

A quality-filter pipeline is only as good as its score: DS2's whole
premise (reference: score_curation/ — detect score errors, calibrate,
re-select) assumes someone can MEASURE whether the curated score
separates keep from drop better than the raw one. These are the three
measurements a production curation loop runs after every calibration
pass, built shuffle-lean:

- `auc_by_group`: tie-aware Mann-Whitney AUC of a score against a
  binary label, per group. The classic formulation ranks every row
  (global sort); here rows collapse to DISTINCT (group, score) first,
  so the window that assigns average ranks runs over at most
  |groups| x |score quantization| rows — for the 0..100 integer
  scores this pipeline emits, that is <= 101 rows per group no matter
  how many clips exist. Arithmetic stays in integers until a single
  final division (2*rank-sum form), so the engine and any SQL twin
  agree bit-for-bit.
- `calibration_bins`: a reliability diagram + Brier decomposition
  over an integer-quantized probability column. One map-side-combined
  groupBy; every per-bin statistic is a ratio of exact integer sums
  ((p - scale*y)^2 stays integral), divided once at the end.
- `wer_pairs`: token-level word error rate between transcript pairs
  (ASR-version comparison / near-dup adjudication). The DP is the
  textbook Wagner-Fischer but row-vectorized in NumPy inside one
  Arrow batch iterator: the within-row left-neighbor dependency
  cur[j] = min(..., cur[j-1]+1) is resolved in closed form via
  cur = minimum.accumulate(tmp - arange) + arange, so the only Python
  loop is over the SHORTER side's tokens. Pair generation is the
  caller's job (blocked/capped, same contract as operators/fuzzy.py);
  this operator never forms pairs itself.

Scale notes: auc/calibration shuffle only pre-aggregated (group,
score) cells; wer_pairs ships token arrays for candidate pairs only
(bytes/audio never enter). None of the three collects to the driver.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def auc_by_group(
    df: DataFrame,
    group_col: str,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Tie-aware AUC (= Mann-Whitney U / (n_pos*n_neg)) per group.

    `score_col` must be discrete (integers or an already-quantized
    float); with a continuous score, quantize first — the rank window
    below runs over DISTINCT scores per group, which is exactly what
    makes this scalable, and ties are then handled by average ranks
    (the +0.5*P(score_pos == score_neg) convention, matching
    sklearn.metrics.roc_auc_score).

    Derivation: with rows at distinct score s carrying (cnt, pos) and
    cum = #rows strictly below s, every row at s has average rank
    cum + (cnt+1)/2, so 2*R_pos = sum(pos * (2*cum + cnt + 1)) stays
    integral and AUC = (2*R_pos - n_pos*(n_pos+1)) / (2*n_pos*n_neg)
    needs one float division. Groups with no positives or no
    negatives return NULL (AUC undefined).
    """
    g, s = F.col(group_col), F.col(score_col)
    cells = df.groupBy(g.alias("_g"), s.alias("_s")).agg(
        F.count(F.lit(1)).alias("_cnt"),
        F.sum(F.col(label_col).cast("long")).alias("_pos"),
    )
    w = (
        Window.partitionBy("_g")
        .orderBy("_s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = cells.withColumn(
        "_cum", F.coalesce(F.sum("_cnt").over(w), F.lit(0).cast("long"))
    )
    agg = ranked.groupBy("_g").agg(
        F.sum(
            F.col("_pos") * (2 * F.col("_cum") + F.col("_cnt") + 1)
        ).alias("_r2"),
        F.sum("_pos").alias("n_pos"),
        F.sum(F.col("_cnt") - F.col("_pos")).alias("n_neg"),
    )
    auc = F.when(
        (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
        (F.col("_r2") - F.col("n_pos") * (F.col("n_pos") + 1))
        / (2.0 * F.col("n_pos") * F.col("n_neg")),
    )
    return agg.select(
        F.col("_g").alias(group_col), "n_pos", "n_neg", auc.alias("auc")
    )


def calibration_bins(
    df: DataFrame,
    p_col: str,
    label_col: str,
    n_bins: int = 10,
    scale: int = 100,
) -> DataFrame:
    """Reliability-diagram bins over an integer-quantized probability.

    `p_col` holds p*scale as an integer in [0, scale] (this pipeline's
    scores are 0..100). Per bin: n, mean predicted probability,
    empirical positive rate, the bin's summed Brier contribution, and
    the absolute calibration gap |frac_pos - mean_pred|. Everything
    is a ratio of exact integer sums — (p - scale*y)^2 is integral —
    so two engines computing this agree to the bit. One aggregation,
    map-side combinable; no windows, no second pass.
    """
    p = F.col(p_col).cast("long")
    y = F.col(label_col).cast("long")
    bin_ = F.least(
        F.floor(p * n_bins / (scale + 1)).cast("int"), F.lit(n_bins - 1)
    )
    agg = (
        df.select(
            bin_.alias("bin"),
            p.alias("_p"),
            y.alias("_y"),
            ((p - scale * y) * (p - scale * y)).alias("_sq"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_p").alias("_sp"),
            F.sum("_y").alias("_sy"),
            F.sum("_sq").alias("_ssq"),
        )
    )
    fs = float(scale)
    return agg.select(
        "bin",
        "n",
        (F.col("_sp") / (fs * F.col("n"))).alias("mean_pred"),
        (F.col("_sy") / F.col("n").cast("double")).alias("frac_pos"),
        (F.col("_ssq") / F.lit(fs * fs)).alias("brier_sum"),
        (
            F.abs(fs * F.col("_sy") - F.col("_sp")) / (fs * F.col("n"))
        ).alias("gap"),
    )


_WER_SCHEMA = T.StructType(
    [
        T.StructField("id_a", T.LongType()),
        T.StructField("id_b", T.LongType()),
        T.StructField("n_ref", T.IntegerType()),
        T.StructField("n_hyp", T.IntegerType()),
        T.StructField("dist", T.IntegerType()),
        T.StructField("wer", T.DoubleType()),
    ]
)


def _lev_tokens(a: np.ndarray, b: np.ndarray) -> int:
    """Levenshtein over token-id arrays, row-vectorized.

    One Python iteration per token of `a` (the shorter side after the
    caller's swap); within a row the insert dependency
    cur[j] = min(tmp[j], cur[j-1]+1) has the closed form
    cur = minimum.accumulate(tmp - j) + j, so each row is pure NumPy.
    """
    m = b.shape[0]
    prev = np.arange(m + 1, dtype=np.int64)
    jj = np.arange(1, m + 1, dtype=np.int64)
    for i, x in enumerate(a, 1):
        sub = prev[:-1] + (b != x)
        tmp = np.minimum(prev[1:] + 1, sub)
        cur = np.empty(m + 1, dtype=np.int64)
        cur[0] = i
        u = np.minimum.accumulate(
            np.minimum(tmp, np.int64(i) + jj) - jj
        )
        cur[1:] = u + jj
        prev = cur
    return int(prev[-1])


def wer_pairs(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    tokens_a: str = "tokens_a",
    tokens_b: str = "tokens_b",
) -> DataFrame:
    """Token-level WER for candidate transcript pairs.

    Input: one row per candidate pair carrying both token arrays
    (produce them JVM-side with split/lower; generate candidates with
    a blocked/capped strategy — fingerprint buckets, fuzzy blocks —
    never all-pairs). Output: (id_a, id_b, n_ref, n_hyp, dist, wer)
    where wer = dist / n_ref and n_ref counts `tokens_a` (reference).
    Pairs with an empty reference get NULL wer (division undefined);
    dist is still exact. Token identity is EXACT string equality —
    factorize to ids per batch, compare ids.
    """
    cols = [id_a, id_b, tokens_a, tokens_b]

    def compute(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n = len(pdf)
            out = {
                "id_a": pdf[id_a].astype("int64"),
                "id_b": pdf[id_b].astype("int64"),
                "n_ref": np.zeros(n, dtype=np.int32),
                "n_hyp": np.zeros(n, dtype=np.int32),
                "dist": np.zeros(n, dtype=np.int32),
            }
            for k in range(n):
                ta = pdf[tokens_a].iloc[k]
                tb = pdf[tokens_b].iloc[k]
                ta = [] if ta is None else list(ta)
                tb = [] if tb is None else list(tb)
                codes, _ = pd.factorize(
                    np.asarray(ta + tb, dtype=object)
                )
                a = codes[: len(ta)]
                b = codes[len(ta):]
                if a.shape[0] > b.shape[0]:
                    a, b = b, a
                out["n_ref"][k] = len(ta)
                out["n_hyp"][k] = len(tb)
                out["dist"][k] = _lev_tokens(a, b)
            res = pd.DataFrame(out)
            res["wer"] = np.where(
                res["n_ref"] > 0,
                res["dist"] / res["n_ref"],
                np.nan,
            )
            res.loc[res["n_ref"] == 0, "wer"] = None
            yield res

    return pairs.select(*cols).mapInPandas(compute, schema=_WER_SCHEMA)


def threshold_sweep(
    df: DataFrame,
    score_col: str,
    label_col: str,
    thresholds: list[int],
    group_col: str | None = None,
) -> DataFrame:
    """Keep/drop confusion matrix + precision/recall/F1 per threshold.

    The measurement behind this pipeline's own acceptance gate
    (BASELINE north rule: keep/drop F1 >= 0.99 vs reference labels):
    sweep the keep rule `score >= t` over candidate thresholds and
    report, per threshold (and optional group), the exact confusion
    counts and the three derived ratios. This is how an operator picks
    the production threshold after each DS2-style recalibration pass
    (reference: score_curation/ re-selects on the curated score).

    Scale shape: rows first collapse to DISTINCT (group, score) cells
    with (cnt, pos) — ONE map-side-combined groupBy, so the frame that
    meets the thresholds has at most |groups| x |score quantization|
    rows no matter how many clips exist (<= 101 per group for this
    pipeline's 0..100 integer scores). The broadcast threshold list
    then fans each cell out |T| ways and a second groupBy sums
    conditionally — never a pass over raw rows per threshold. All
    counts stay integral; precision/recall/F1 are each ONE division of
    exact integers (F1 via the 2tp/(2tp+fp+fn) form, no intermediate
    rounding), so a SQL twin agrees bit-for-bit. Degenerate cases
    yield NULL: precision when nothing is kept, recall when there are
    no positives, F1 when both are zero.
    """
    if not thresholds:
        raise ValueError("thresholds must be a non-empty list")
    s = F.col(score_col)
    keys = ([F.col(group_col).alias("_g")] if group_col else []) + [
        s.alias("_s")
    ]
    cells = df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("_cnt"),
        F.sum(F.col(label_col).cast("long")).alias("_pos"),
    )
    spark = df.sparkSession
    th = spark.createDataFrame(
        [(int(t),) for t in sorted(set(thresholds))], "t int"
    )
    crossed = cells.join(F.broadcast(th))
    kept = (F.col("_s") >= F.col("t")).cast("long")
    gcols = (["_g"] if group_col else []) + ["t"]
    agg = crossed.groupBy(*gcols).agg(
        F.sum(kept * F.col("_pos")).alias("tp"),
        F.sum(kept * (F.col("_cnt") - F.col("_pos"))).alias("fp"),
        F.sum((1 - kept) * F.col("_pos")).alias("fn"),
        F.sum((1 - kept) * (F.col("_cnt") - F.col("_pos"))).alias("tn"),
    )
    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")
    out = ([F.col("_g").alias(group_col)] if group_col else []) + [
        "t",
        "tp",
        "fp",
        "fn",
        "tn",
        F.when(tp + fp > 0, tp / (tp + fp).cast("double")).alias(
            "precision"
        ),
        F.when(tp + fn > 0, tp / (tp + fn).cast("double")).alias(
            "recall"
        ),
        F.when(
            2 * tp + fp + fn > 0,
            (2 * tp) / (2 * tp + fp + fn).cast("double"),
        ).alias("f1"),
    ]
    return agg.select(*out)
