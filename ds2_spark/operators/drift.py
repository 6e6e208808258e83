"""Distribution-drift report between two corpus snapshots.

A production curation loop recalibrates (operators/hoc.py, votes.py)
and re-selects on a cadence; the question between runs is "did the
corpus move?" — scores drifting after an upstream ASR change, the
language mix shifting as a new crawl lands, durations collapsing when
an ingest bug truncates clips. This operator compares the SAME
bucketed feature across two snapshots and emits the three standard
measurements side by side:

- PSI (population stability index), the industry drift score with its
  conventional action thresholds (<0.1 stable, 0.1–0.25 watch,
  >0.25 act);
- chi-square statistic against the pooled expectation (the classical
  homogeneity test);
- total-variation distance, reported EXACTLY: with Laplace-smoothed
  counts, p_i - q_i is a rational with the fixed denominator
  (n_a + s·B)(n_b + s·B), so TV = Σ|num_i| / (2·den) is one integer
  sum and ONE division — bit-identical in any engine.

PSI/chi² involve ln and nested float ops, so their per-bucket terms
are rounded to 6 dp at the boundary (the tfidf.py/bm25 discipline:
two libms may disagree in the last ulp) and then quantized to e6
integers before summing — integer sums are order-free, so the
SNAPSHOT-LEVEL totals are reproducible across engines and partition
layouts (NOTES #13 pattern).

Scale shape: each snapshot collapses to per-bucket counts with one
map-side-combined groupBy (the only pass over raw rows); everything
after runs on the |buckets|-row frame, where the unpartitioned
windows this module uses are O(buckets), never O(rows). Laplace
smoothing (`smoothing` pseudo-count, default 1) keeps empty buckets
finite; B counts buckets observed in EITHER snapshot, so both sides
share one bucket universe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def drift_buckets(
    df_a: DataFrame,
    df_b: DataFrame,
    bucket_col: str,
    smoothing: int = 1,
) -> DataFrame:
    """Per-bucket drift table: counts, smoothed rates (6 dp), and the
    e6-quantized PSI / chi-square contributions. One groupBy per
    snapshot; the join and windows run over the bucket universe only.
    """
    if smoothing < 1:
        raise ValueError("smoothing must be a positive integer")
    ca = df_a.groupBy(F.col(bucket_col).alias("bucket")).agg(
        F.count(F.lit(1)).alias("cnt_a")
    )
    cb = df_b.groupBy(F.col(bucket_col).alias("bucket")).agg(
        F.count(F.lit(1)).alias("cnt_b")
    )
    cells = (
        ca.join(cb, "bucket", "full_outer")
        .select(
            "bucket",
            F.coalesce("cnt_a", F.lit(0)).alias("cnt_a"),
            F.coalesce("cnt_b", F.lit(0)).alias("cnt_b"),
        )
    )
    w = Window.partitionBy()  # O(buckets) frame, documented above
    s = F.lit(int(smoothing))
    cells = cells.select(
        "bucket",
        "cnt_a",
        "cnt_b",
        (F.sum("cnt_a").over(w)).alias("_na"),
        (F.sum("cnt_b").over(w)).alias("_nb"),
        (F.count(F.lit(1)).over(w)).alias("_nbuckets"),
    )
    num_a = F.col("cnt_a") + s
    num_b = F.col("cnt_b") + s
    den_a = F.col("_na") + s * F.col("_nbuckets")
    den_b = F.col("_nb") + s * F.col("_nbuckets")
    p = num_a / den_a.cast("double")
    q = num_b / den_b.cast("double")
    psi_term = (p - q) * F.log(p / q)
    # pooled-expectation chi-square on the RAW (unsmoothed) counts;
    # expected counts are positive whenever a bucket is observed
    tot = (F.col("cnt_a") + F.col("cnt_b")).cast("double")
    ea = F.col("_na") * tot / (F.col("_na") + F.col("_nb")).cast("double")
    eb = F.col("_nb") * tot / (F.col("_na") + F.col("_nb")).cast("double")
    chi_term = F.when(
        (ea > 0) & (eb > 0),
        (F.col("cnt_a") - ea) * (F.col("cnt_a") - ea) / ea
        + (F.col("cnt_b") - eb) * (F.col("cnt_b") - eb) / eb,
    )  # NULL when a snapshot is empty, never NaN/Inf
    # exact TV numerator over the shared denominator den_a*den_b.
    # decimal(38,0), NOT long: at the 10^12-row design point
    # num*den ~ 10^24 and int64 arithmetic would overflow SILENTLY
    # (Spark wraps longs outside ANSI mode); 128-bit decimal keeps
    # the integer exact (DuckDB twin: HUGEINT)
    d = "decimal(38,0)"
    tv_num = F.abs(
        num_a.cast(d) * den_b.cast(d) - num_b.cast(d) * den_a.cast(d)
    )
    return cells.select(
        "bucket",
        "cnt_a",
        "cnt_b",
        F.round(p, 6).alias("rate_a"),
        F.round(q, 6).alias("rate_b"),
        F.round(psi_term * 1e6, 0).cast("long").alias("psi_term_e6"),
        F.round(chi_term * 1e6, 0).cast("long").alias("chi2_term_e6"),
        tv_num.alias("tv_num"),
        (den_a.cast(d) * den_b.cast(d)).alias("tv_den"),
    )


def drift_summary(
    df_a: DataFrame,
    df_b: DataFrame,
    bucket_col: str,
    smoothing: int = 1,
) -> DataFrame:
    """One-row snapshot comparison: n_a, n_b, bucket count, PSI,
    chi-square, and exact total-variation distance. Integer sums of
    the quantized terms make the totals order-free; TV is exact
    (one division of exact integers)."""
    cells = drift_buckets(df_a, df_b, bucket_col, smoothing)
    return cells.select(
        F.sum(F.col("cnt_a")).alias("n_a"),
        F.sum(F.col("cnt_b")).alias("n_b"),
        F.count(F.lit(1)).alias("n_buckets"),
        (F.sum("psi_term_e6") / F.lit(1e6)).alias("psi"),
        (F.sum("chi2_term_e6") / F.lit(1e6)).alias("chi2"),
        # numerator and denominator are 128-bit-exact integers; each
        # converts to double once (round-to-nearest in any engine)
        # and ONE division follows — reproducible bit-for-bit.
        # first("tv_den") is safe: den_a*den_b depends only on the
        # snapshot totals, so it is constant across buckets.
        (
            F.sum("tv_num").cast("double")
            / (2.0 * F.first("tv_den").cast("double"))
        ).alias("tv_distance"),
    )
