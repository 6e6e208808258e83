"""Cross-modal consistency QC for audio + transcript corpora.

The north-rule input is a PAIRED table — (bytes, transcript) per clip
— and pairing creates a failure class neither single-modality dedup
catches: the modalities disagree about what is a duplicate.

  * Identical AUDIO appearing with two different transcripts means at
    least one transcript is wrong (annotation inconsistency, ASR
    version skew, copy-paste errors). Training on both teaches the
    model two labels for one input.
  * One TRANSCRIPT appearing over several distinct audio payloads is
    the re-read / multi-take pattern — usually legitimate (TTS takes,
    re-recordings) but a sampling-bias signal worth surfacing before
    selection, since a hot transcript otherwise gets its weight
    multiplied by its take count.

`crossmodal_consistency` computes both directions in one job:
fingerprint the audio (integer-exact energy-delta fp,
operators/audio.audio_fingerprint) carrying an md5 transcript hash
through the same Arrow pass (`passthrough` — bytes are read once and
never rescanned or shuffled), then two small aggregates:

  by fp:      audio_dup_count, n_transcripts  -> transcript_conflict
  by t_hash:  text_dup_count,  n_audio        -> audio_variant

Scale shape at 10^12 clips: after the fingerprint pass only
(clip_id, fp, t_hash) ever shuffles — two groupBys on scalar keys
with map-side combine, then two joins of per-key counts back to the
scalar stream. No windows over the corpus, no collect, no bytes in
any exchange. NULL semantics: a NULL fp (undecodable/NULL payload)
joins no audio group (audio_dup_count 0, conflict 0 — refusing to
call garbage a duplicate); a NULL transcript likewise joins no text
group and does not count as a transcript "variant" of its audio
group (count(DISTINCT) ignores NULLs in both engines by ANSI rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .audio import audio_fingerprint


def crossmodal_consistency(
    clips: DataFrame,
    transcript_col: str = "transcript",
    frame_samples: int = 8,
    max_bits: int = 60,
) -> DataFrame:
    """Per-clip cross-modal duplicate-consistency report.

    Input: (clip_id, bytes, <transcript_col>). Output, one row per
    clip: fp, t_hash, audio_dup_count, n_transcripts,
    transcript_conflict, text_dup_count, n_audio, audio_variant.
    Counts are 0 (not NULL) for clips outside any group so the
    output is hash-comparable without NULL juggling.
    """
    with_hash = clips.select(
        "clip_id", "bytes", F.md5(F.col(transcript_col)).alias("t_hash")
    )
    fp = audio_fingerprint(
        with_hash,
        frame_samples=frame_samples,
        max_bits=max_bits,
        passthrough=("t_hash",),
    )
    # three consumers below (by_fp, by_text, the final join) — Catalyst
    # does NOT dedupe common subplans, so without materialization the
    # bytes scan + fingerprint pass would run three times (the BM25
    # lesson, NOTES.md #41). Lazy localCheckpoint: materialized at the
    # first action, scalars only (clip_id, fp, t_hash).
    fp = fp.localCheckpoint(eager=False)
    by_fp = (
        fp.where(F.col("fp").isNotNull())
        .groupBy("fp")
        .agg(
            F.count("*").alias("audio_dup_count"),
            F.countDistinct("t_hash").alias("n_transcripts"),
        )
    )
    by_text = (
        fp.where(F.col("t_hash").isNotNull())
        .groupBy("t_hash")
        .agg(
            F.count("*").alias("text_dup_count"),
            F.countDistinct("fp").alias("n_audio"),
        )
    )
    out = fp.join(by_fp, "fp", "left").join(by_text, "t_hash", "left")
    return out.select(
        "clip_id",
        "fp",
        "t_hash",
        F.coalesce(F.col("audio_dup_count"), F.lit(0)).alias("audio_dup_count"),
        F.coalesce(F.col("n_transcripts"), F.lit(0)).alias("n_transcripts"),
        (F.coalesce(F.col("n_transcripts"), F.lit(0)) > 1)
        .cast("int")
        .alias("transcript_conflict"),
        F.coalesce(F.col("text_dup_count"), F.lit(0)).alias("text_dup_count"),
        F.coalesce(F.col("n_audio"), F.lit(0)).alias("n_audio"),
        (F.coalesce(F.col("n_audio"), F.lit(0)) > 1)
        .cast("int")
        .alias("audio_variant"),
    )
