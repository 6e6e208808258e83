"""Deterministic stratified sampling / corpus mixing.

Training-data pipelines resample sources to a target mixture (e.g.
up-weight books, down-weight crawl). Spark's ``sampleBy`` is
RNG-based — results change with partitioning and seed plumbing, and
can never be verified cross-engine. This operator instead derives a
uniform-looking bucket in [0, den) from a cryptographic hash of the
row's id and keeps the row iff ``bucket < rate * den``:

  bucket(id) = int(md5(id)[:12 hex], 16) % den

Properties that matter at 100 TB:
  * embarrassingly parallel — a pure column expression (md5 + conv +
    pmod), no shuffle, no RNG state, whole-stage codegen end-to-end;
  * deterministic and engine-portable — DuckDB computes the identical
    bucket (NOTES.md #7 hashing recipe), so the contract query is
    hash-verified exactly;
  * stable under repartition/resume — membership depends only on the
    id, so a re-run or a resumed shard keeps exactly the same rows
    (the lineage/resume property the S3 manifest scan relies on);
  * per-stratum rates are exact in expectation with md5 uniformity;
    48 hash bits -> rate quantization error < 2^-47.

``rates`` maps stratum value -> keep fraction; strata absent from the
map use ``default_rate``. Rates are snapped to integer thresholds
over ``den`` so the comparison is integer-exact in every engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_bucket(id_col: Column, den: int = 1_000_000) -> Column:
    """Deterministic uniform bucket in [0, den): first 48 bits of
    md5(id) mod den. Engine-portable (DuckDB twin in the oracle)."""
    h = F.conv(F.substring(F.md5(id_col.cast("string")), 1, 12), 16, 10)
    return F.pmod(h.cast("long"), F.lit(den))


def stratified_sample(
    df: DataFrame,
    stratum: str,
    id_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    den: int = 1_000_000,
) -> DataFrame:
    """Keep each row iff its hash bucket falls below its stratum's
    integer threshold floor(rate * den). No shuffle; pure projection
    + filter (pushed to the scan where the source allows)."""
    thr = F.lit(int(default_rate * den))
    for k, r in sorted(rates.items()):
        thr = F.when(F.col(stratum) == k, F.lit(int(r * den))).otherwise(thr)
    return df.where(hash_bucket(F.col(id_col), den) < thr)


def mixture_weights(
    df: DataFrame, stratum: str, target: dict[str, float]
) -> dict[str, float]:
    """Turn a TARGET mixture (stratum -> fraction of the output) into
    per-stratum keep rates against the observed counts, scaled so the
    largest required rate is 1.0 (pure downsampling — no row is
    duplicated). Driver-side result is one tiny aggregate row per
    stratum; the returned dict feeds ``stratified_sample``."""
    counts = {
        r[stratum]: r["n"]
        for r in df.groupBy(stratum).agg(F.count("*").alias("n")).collect()
    }
    # rate_s ∝ target_s / count_s; normalize so max rate == 1.0
    raw = {
        s: (target.get(s, 0.0) / counts[s]) if counts.get(s) else 0.0
        for s in counts
    }
    top = max(raw.values()) if raw else 1.0
    return {s: (v / top if top > 0 else 0.0) for s, v in raw.items()}


def temperature_rates(
    df: DataFrame,
    stratum: str,
    alpha: float = 0.3,
    target_frac: float = 0.5,
) -> dict[str, float]:
    """mT5/XLM-R-style temperature mixing: sampling probability per
    stratum p_s ∝ n_s^alpha (alpha < 1 up-weights tail languages /
    sources, alpha = 1 is proportional, alpha = 0 is uniform), scaled
    to an expected output of target_frac * N rows, capped at rate 1
    (pure downsampling). Driver-side cost is one tiny per-stratum
    count row — the same bound as mixture_weights; membership itself
    stays the shuffle-free hash_bucket filter.

    Rates are rounded to 6 dp so the integer thresholds
    floor(rate * den) match across engines despite pow() last-ulp
    differences (the same portability discipline as the 6-dp scores
    elsewhere)."""
    counts = {
        r[stratum]: r["n"]
        for r in df.groupBy(stratum).agg(F.count("*").alias("n")).collect()
    }
    n_total = sum(counts.values())
    if not n_total:
        return {}
    weights = {s: float(n) ** alpha for s, n in counts.items()}
    wsum = sum(weights.values())
    budget = target_frac * n_total
    return {
        s: round(min(1.0, budget * (weights[s] / wsum) / counts[s]), 6)
        for s in counts
    }


def temperature_sample(
    df: DataFrame,
    stratum: str,
    id_col: str,
    alpha: float = 0.3,
    target_frac: float = 0.5,
    den: int = 1_000_000,
) -> DataFrame:
    """stratified_sample driven by temperature_rates — the standard
    multilingual/source-balancing resample as one deterministic,
    shuffle-free filter."""
    rates = temperature_rates(df, stratum, alpha=alpha, target_frac=target_frac)
    return stratified_sample(df, stratum, id_col, rates, den=den)


def priority_sample(
    df: DataFrame,
    group: str,
    id_col: str,
    weight_col: str,
    k: int,
    den: int = 1_000_000,
) -> DataFrame:
    """Priority sampling (Duffield–Lund–Thorup, JACM 2007): a
    weight-aware fixed-size sample with an unbiased subset-sum
    estimator. Each row draws a deterministic uniform
    u(id) in [1, den] from md5(id) (same recipe as ``hash_bucket``),
    gets priority q = w / u, and the k highest-priority rows per
    group are kept. With tau = the (k+1)-th priority, the estimator
    est_w = max(w, tau) is unbiased for the group's total weight —
    the standard way to downsample a weighted corpus (cost-, token-
    or byte-weighted) while preserving aggregate estimates.

    Engine-portability: u is integer, w is integer, and q = w / u is
    ONE IEEE-754 double division of the same two integers in every
    engine — correctly rounded, hence bit-identical (unlike
    transcendental scoring, division needs no rounding grid). Ties in
    q are broken by id in both engines.

    Scale shape: one hash-partition shuffle on ``group`` + a window
    rank — identical to any top-k-per-group; no RNG state, no
    driver participation, resume-stable because u depends only on
    the id. At 10^12 rows with bounded k per group the output is
    groups x k rows; AQE handles group skew.
    """
    u = (
        F.pmod(
            F.conv(
                F.substring(F.md5(F.col(id_col).cast("string")), 1, 12), 16, 10
            ).cast("long"),
            F.lit(den),
        )
        + F.lit(1)
    ).alias("u")
    w = F.col(weight_col).cast("long")
    base = (
        df.where(w >= 1)
        .select(
            F.col(group),
            F.col(id_col),
            w.alias("w"),
            u,
        )
        .withColumn("pri", F.col("w").cast("double") / F.col("u").cast("double"))
    )
    win = Window.partitionBy(group).orderBy(F.desc("pri"), F.col(id_col))
    ranked = base.withColumn("rn", F.row_number().over(win))
    tau = Window.partitionBy(group)
    ranked = ranked.withColumn(
        "tau",
        F.coalesce(
            F.max(F.when(F.col("rn") == k + 1, F.col("pri"))).over(tau),
            F.lit(0.0),
        ),
    )
    return (
        ranked.where(F.col("rn") <= k)
        .select(
            group,
            id_col,
            "w",
            "u",
            "pri",
            "rn",
            F.greatest(F.col("w").cast("double"), F.col("tau")).alias("est_w"),
        )
    )


def token_budget_plan(
    doc_tokens: DataFrame,
    stratum: str,
    token_col: str,
    alpha: float = 0.5,
    token_budget: int = 60_000,
) -> list[tuple]:
    """Token-weighted mixture budgeting: given per-doc token counts
    (e.g. operators/bpe.bpe_encode output joined to its source), plan
    per-source sampling rates hitting a TOKEN budget — the form
    corpus mixing actually takes for LM training, where budgets are
    tokens, not documents (mT5/XLM-R balance by example count;
    Chinchilla-style planning needs tokens).

    Per stratum s with token mass t_s: weight ∝ t_s^alpha, rate =
    round(min(1, B * (w_s / Σw) / t_s), 6); the 6-dp grid then turns
    into an integer ppm threshold and expected_tokens = t_s *
    rate_ppm // 1e6 — both integer-exact, so the whole plan replays
    bit-identically in SQL (the temperature_rates discipline, applied
    to token mass). Returns rows
    (stratum, n_docs, n_tokens, rate_ppm, expected_tokens) sorted by
    stratum; driver-side cost is one per-stratum aggregate row (the
    collect_pool bound — strata are sources/languages, not docs).
    The rates feed `stratified_sample` unchanged: membership stays
    the shuffle-free md5-bucket filter."""
    import math

    agg = (
        doc_tokens.groupBy(stratum)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col(token_col)).alias("n_tokens"),
        )
        .collect()
    )
    stats = {r[stratum]: (int(r["n_docs"]), int(r["n_tokens"])) for r in agg}
    weights = {s: float(t) ** alpha for s, (_, t) in stats.items()}
    # sum in sorted-stratum order: collect() row order varies with
    # partitioning, and float addition order can move the last ulp —
    # a fixed order keeps the plan deterministic run-to-run (the 6-dp
    # grid then absorbs the remaining engine-internal-order ulp, as
    # in temperature_rates)
    wsum = sum(weights[s] for s in sorted(weights))
    out = []
    for s in sorted(stats):
        n_docs, toks = stats[s]
        if toks <= 0 or wsum <= 0:
            rate_ppm = 0
        else:
            rate = round(
                min(1.0, (token_budget * (weights[s] / wsum)) / toks), 6
            )
            rate_ppm = math.floor(rate * 1_000_000)
        out.append((s, n_docs, toks, rate_ppm, toks * rate_ppm // 1_000_000))
    return out
