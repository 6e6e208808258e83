"""Grouped EXACT percentiles via value-histogram decomposition — the
10^12-row scale path for quantized value domains.

Why this exists: Spark's exact ``percentile()`` aggregate holds a
per-group map of (value -> count) inside ONE aggregation buffer on one
reducer, then sorts it there. At the design point (10^12 clips, a few
hot groups) the hot group's buffer lands on a single task — correct,
but the group is a straggler and the buffer is memory-bounded by the
group's distinct-value count on one executor. ``approx_percentile``
fixes the memory but gives up exactness.

This operator computes the SAME linearly-interpolated exact percentile
(np.percentile / DuckDB ``quantile_cont`` / Spark ``percentile()``
semantics) as a composition of built-in relational ops that never
materializes a per-group buffer:

  1. ``groupBy(group, value).count()``          -- map-side combinable;
     cluster-wide state = distinct (group, value) pairs, spread over
     ALL reducers by the pair hash (a hot group with many distinct
     values is spread, not concentrated).
  2. cumulative count over value within group   -- a window over the
     HISTOGRAM rows (one row per distinct pair, not per input row).
  3. for each requested p: target rank h = (n-1)*p sits between the
     values owning indices floor(h) and ceil(h); pick both by range
     predicate on the cumulative counts and interpolate.

Precondition: the value domain per group must be bounded (quantized
scores, durations in ms, ratings...). Like selection.py's
histogram-rank decomposition, the operator guards on the total
histogram size and refuses loudly rather than silently OOM a window —
the caller either quantizes (``F.round(v, 4)``) or falls back to
``percentile()``.

The same decomposition with ``grouping sets``/rollup input works
unchanged since the group columns are opaque here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Ceiling on SUM over groups of distinct values per group. The window in
# step 2 partitions by group, so the per-task bound is the largest
# single group's distinct-value count; the total bound keeps the whole
# histogram small enough that even a degenerate single-group input fits
# one task comfortably (1e6 rows * ~32B ≈ 32 MB).
MAX_HIST_ROWS = 1_000_000

_RESERVED = ("_v", "_c", "_lo", "_hi", "_n", "n")


def grouped_percentile_hist(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    ps: list[float],
    *,
    max_hist_rows: int = MAX_HIST_ROWS,
    check_cardinality: bool = True,
) -> DataFrame:
    """Exact interpolated percentiles per group without per-group buffers.

    Returns one row per group — including groups whose values are all
    NULL (their percentiles are NULL), matching ``groupBy().agg(
    percentile(...))`` — with columns ``p<percent>`` (p=0.9 -> ``p90``,
    0.25 -> ``p25``; the label is round(p*100) with an ``_<4dp>``
    disambiguator when p*100 is not integral) plus ``n`` (the group's
    NON-NULL value count — the population the percentile ranks over).

    ``check_cardinality`` pre-counts distinct (group, value) pairs and
    raises when it exceeds ``max_hist_rows`` — the explicit refusal
    beats a silent giant window. The histogram is persisted first so
    the main query reuses it instead of re-running the input scan +
    shuffle. Pass False when the caller already knows the domain is
    quantized (saves the pre-count job and the cache).
    """
    if not ps:
        raise ValueError("ps must be non-empty")
    for p in ps:
        if not (0.0 <= p <= 1.0):
            raise ValueError(f"percentile out of range: {p}")
    for c in (*group_cols, value_col):
        if c in _RESERVED:
            raise ValueError(
                f"column name {c!r} collides with a reserved internal/"
                f"output name {_RESERVED}; rename it first"
            )
    out_cols: list[str] = []
    for p in ps:
        pct = p * 100.0
        label = f"p{int(round(pct))}" if abs(pct - round(pct)) < 1e-12 else (
            "p" + f"{pct:.4f}".replace(".", "_")
        )
        if label in out_cols:
            raise ValueError(f"duplicate percentile label {label}")
        if label in group_cols:
            raise ValueError(f"group column {label!r} collides with an output label")
        out_cols.append(label)

    gcols = [F.col(c) for c in group_cols]
    v = F.col(value_col)

    # NULL values participate in the groupBy (so all-NULL groups stay in
    # the output) but never in ranks: the NULL histogram row gets an
    # empty rank range below, and _n counts non-NULL rows only.
    hist = df.groupBy(*gcols, v.alias("_v")).agg(F.count("*").alias("_c"))
    if check_cardinality:
        hist = hist.persist()
        n_pairs = hist.count()
        if n_pairs > max_hist_rows:
            hist.unpersist()
            raise ValueError(
                f"histogram would hold {n_pairs} (group, value) pairs "
                f"> max_hist_rows={max_hist_rows}; quantize {value_col!r} "
                "(e.g. F.round(v, 4)) or use percentile()/approx_percentile"
            )

    # _v ASC with NULLs first (Spark default) => the conditional cumsum
    # gives the NULL row _lo == _hi == 0, an empty rank range no index
    # can match — exactly "excluded from ranking".
    c_nn = F.when(F.col("_v").isNotNull(), F.col("_c")).otherwise(F.lit(0))
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(F.asc_nulls_first("_v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy(*group_cols)
    cum = hist.select(
        *group_cols,
        "_v",
        F.sum(c_nn).over(w).alias("_hi"),  # rank range [_hi - _c, _hi)
        (F.sum(c_nn).over(w) - c_nn).alias("_lo"),
        F.sum(c_nn).over(wn).alias("_n"),
    )

    # For each p: h = (n-1)*p; the value owning sorted index i is the
    # histogram row with _lo <= i < _hi. floor(h) and ceil(h) each match
    # exactly one row per group (none when _n == 0 -> NULL percentile),
    # so a conditional max() pulls both out in one group-by pass over
    # the (tiny) histogram; the interpolation
    #   x_fl + frac * (x_cl - x_fl)        (np.percentile's lerp order)
    # is a plain projection afterwards.
    aggs = [F.max("_n").alias("n")]
    proj = [*group_cols, "n"]
    for p, label in zip(ps, out_cols):
        h = (F.col("_n") - 1).cast("double") * F.lit(float(p))
        fl = F.floor(h).cast("bigint")
        cl = F.ceil(h).cast("bigint")
        aggs.append(
            F.max(
                F.when((F.col("_lo") <= fl) & (fl < F.col("_hi")), F.col("_v"))
            ).alias(f"_fl_{label}")
        )
        aggs.append(
            F.max(
                F.when((F.col("_lo") <= cl) & (cl < F.col("_hi")), F.col("_v"))
            ).alias(f"_cl_{label}")
        )
    agged = cum.groupBy(*group_cols).agg(*aggs)
    for p, label in zip(ps, out_cols):
        h = (F.col("n") - 1).cast("double") * F.lit(float(p))
        frac = h - F.floor(h)
        x_fl = F.col(f"_fl_{label}").cast("double")
        x_cl = F.col(f"_cl_{label}").cast("double")
        agged = agged.withColumn(label, x_fl + frac * (x_cl - x_fl))
        proj.append(label)
    return agged.select(*proj)
