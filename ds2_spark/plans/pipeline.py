"""The quality-filter pipeline over the clips table.

Stage layout (SURVEY.md §4.3):

  1. scan clips (column-pruned: transcript stages never read `bytes`)
  2. transcript features: built-in quality ratios + langid + ppl UDFs
     + regex scrub (all vectorized)
  3. audio sanity over (clip_id, bytes, ...) only — see operators/audio.py
  4. heuristic rule decisions with reason codes
  5. (calibration + diversity selection layered on by plans/curation)

Everything is a lazy DataFrame; Catalyst prunes/pushes down. Skew
control: an optional salted repartition spreads hot languages / long
transcripts before the UDF stages (north_rule requirement).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import PipelineConfig
from ..functions.scrub import scrub_col
from ..functions.text import (
    langid_udf,
    ppl_udf,
    ppl_udf_with_model,
    with_quality_features,
)


def salted_repartition(df: DataFrame, n: int, salt_buckets: int = 64) -> DataFrame:
    """Spread rows evenly regardless of key skew: repartition by a
    deterministic hash salt (pmod(hash(clip_id), S)) rather than by a
    hot natural key (SURVEY.md §4.2)."""
    return df.repartition(
        n, F.pmod(F.hash("clip_id"), F.lit(salt_buckets))
    )


def transcript_features(
    clips: DataFrame,
    cfg: PipelineConfig | None = None,
    keep_cols: tuple[str, ...] = (),
    ppl_model_bc=None,
) -> DataFrame:
    """Stage 2: per-clip transcript signals. Never touches `bytes`.
    `keep_cols` carries extra precomputed columns through the pruned
    projection (e.g. in-place audio sanity for the streaming plan).
    `ppl_model_bc` (a broadcast (cnt3, cnt2, discount) triple from
    operators/lm.train_lm) swaps the built-in fixture LM for one
    trained distributively on a trusted corpus slice — the CCNet
    recipe; the stage shape is identical, only the broadcast arrays
    the perplexity kernel reads change."""
    cfg = cfg or PipelineConfig()
    pruned = clips.select("clip_id", "transcript", "codec", "dur_ms", *keep_cols)
    lid = langid_udf(F.col("transcript"))
    ppl = (
        ppl_udf if ppl_model_bc is None else ppl_udf_with_model(ppl_model_bc)
    )
    return (
        with_quality_features(pruned)
        .withColumn("_lid", lid)
        .select("*", "_lid.lang", "_lid.lang_margin", "_lid.lang_logp")
        .drop("_lid")
        .withColumn("ppl", ppl(F.col("transcript")))
        .withColumn("transcript_scrubbed", scrub_col("transcript"))
    )


def rule_decisions(
    features: DataFrame,
    audio: DataFrame | None = None,
    cfg: PipelineConfig | None = None,
) -> DataFrame:
    """Stage 4: heuristic keep/drop with a first-failing reason code.

    reason ∈ {candidate, empty_transcript, bad_codec, dur_mismatch,
    rate_outlier, langid_fail, ppl_outlier}; `candidate` rows proceed
    to calibrated selection (which refines them to selected/low_score).

    rate_outlier (speech-rate alignment, fires only when cfg.quality
    wpm bounds are set — see QualityConfig): the transcript's
    words-per-minute implied by the clip duration falls outside
    [wpm_min, wpm_max], or the duration is NULL/non-positive so the
    rate is unverifiable. Exact integer cross-multiplication
    (n_tokens*60000 <> wpm*dur_ms) — no float division, so the
    decision replays bit-identically in any engine (contract query
    q_rule_decisions).
    """
    q = (cfg or PipelineConfig()).quality
    df = features
    if audio is not None:
        # audio output is (clip_id, metrics) — small relative to clips;
        # joined on the key, never shipping bytes through the shuffle.
        df = df.join(audio.select("clip_id", "pcm_ok", "dur_ok"), "clip_id", "left")
    else:
        # pcm_ok/dur_ok may already ride the frame in place (streaming
        # plan: audio_sanity_exprs, no stream-stream join); only
        # default them when genuinely absent
        for c in ("pcm_ok", "dur_ok"):
            if c not in df.columns:
                df = df.withColumn(c, F.lit(True))

    checks = [
        (F.col("n_chars") < q.min_transcript_chars, "empty_transcript"),
        (~F.col("codec").isin(*q.codec_whitelist), "bad_codec"),
        (~F.coalesce(F.col("dur_ok"), F.lit(False)), "dur_mismatch"),
    ]
    if q.wpm_min is not None or q.wpm_max is not None:
        toks60k = F.col("n_tokens").cast("long") * F.lit(60000)
        dur = F.col("dur_ms").cast("long")
        bad_rate = dur.isNull() | (dur <= 0)
        if q.wpm_min is not None:
            bad_rate = bad_rate | (toks60k < dur * F.lit(int(q.wpm_min)))
        if q.wpm_max is not None:
            bad_rate = bad_rate | (toks60k > dur * F.lit(int(q.wpm_max)))
        checks.append((bad_rate, "rate_outlier"))
    checks += [
        (
            (~F.col("lang").isin(*q.allowed_langs))
            | (F.col("lang_margin") < q.langid_margin_min),
            "langid_fail",
        ),
        (F.col("ppl") > q.ppl_max, "ppl_outlier"),
    ]
    reason = F.when(*checks[0])
    for cond, label in checks[1:]:
        reason = reason.when(cond, label)
    reason = reason.otherwise("candidate")
    return df.withColumn("reason", reason).withColumn(
        "keep_rules", F.col("reason") == "candidate"
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
    join_hint: str | None = None,
) -> DataFrame:
    """Skew-safe equi-join: the big side gets a deterministic salt in
    [0, salt_buckets), the small side is replicated salt_buckets times,
    and the join key widens to (key, salt) — so a hot key's rows spread
    over salt_buckets reducers instead of pinning one. Output is
    EXACTLY the plain join (the contract oracle is the salt-blind
    plain SQL join).

    Use when the small side is too big to broadcast but the big side's
    key distribution is skewed (AQE's skew-join split handles sort-
    merge skew at runtime; explicit salting also covers shuffle-hash
    joins, pinned partitioners, and engines/configs where AQE is off).
    The replication factor multiplies the small side's shuffle volume
    — keep salt_buckets near the hot key's needed split, not higher.

    Salt is a deterministic hash of the big row's columns (no RNG —
    resume-stable, NOTES.md #6). `how` is restricted to inner/left:
    under right/full, unmatched SMALL rows would surface once per salt
    replica (the replication is invisible only on the big side).
    join_hint (e.g. "merge", "shuffle_hash") is applied to the small
    side to steer the physical strategy; default lets Catalyst/AQE
    pick (it may still broadcast a tiny replica table, which is fine —
    the salt is then a no-op, not a wrong answer)."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left only")
    salt = F.pmod(
        F.hash(*[F.col(c) for c in big.columns]), F.lit(salt_buckets)
    )
    b = big.withColumn("_salt", salt)
    s = small.withColumn(
        "_salt",
        F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)])),
    )
    if join_hint:
        s = s.hint(join_hint)
    return b.join(s, on=[key, "_salt"], how=how).drop("_salt")


def salted_aggregate(
    df: DataFrame,
    key_cols: list[str],
    sum_cols: dict[str, str],
    salt_buckets: int = 16,
    salt_on: str | None = None,
) -> DataFrame:
    """Two-phase aggregation for skewed keys: groupBy(keys + salt)
    partial-aggregates, then groupBy(keys) merges the partials.

    A hot key that would land its entire row mass on one reducer is
    split across salt_buckets reducers in phase 1; phase 2 then moves
    at most |keys| x salt_buckets pre-aggregated rows regardless of
    row skew. The salt must be high-cardinality WITHIN a key or it
    splits nothing: pass an id-like column via `salt_on`; the default
    hashes every column of the row (deterministic, no RNG, so the
    plan stays resume-stable). Output is exactly plain
    groupBy(keys).sum(...). For simple sums Spark's own map-side
    combine already bounds the shuffle — the operator's value is the
    PATTERN (phase-1 key widening) that also rescues combiner-hostile
    aggregates (collect_list, exact distinct buffers, percentile
    state) where partial aggregation cannot shrink the hot key.

    sum_cols: {output_name: input_col}, summed exactly (use integer
    cents for money so the two-phase regroup is order-free)."""
    salt_src = (
        F.col(salt_on) if salt_on
        else F.hash(*[F.col(c) for c in df.columns])
    )
    phase1 = (
        df.withColumn("_salt", F.pmod(F.hash(salt_src), F.lit(salt_buckets)))
        .groupBy(*key_cols, "_salt")
        .agg(*[F.sum(src).alias(out) for out, src in sum_cols.items()])
    )
    return phase1.groupBy(*key_cols).agg(
        *[F.sum(out).alias(out) for out in sum_cols]
    )
