"""Incremental (delta-batch) curation: exactness of the split.

The load-bearing claim of plans/incremental.py is that under a FROZEN
calibration the per-row path is pure, so

    bootstrap(base) + incremental_update(delta)
 == one-pass apply_frozen(base ∪ delta) + the same global selection

EXACTLY (not approximately) — the checkpoint/parquet roundtrip, the
LWW snapshot merge, and the per-batch stage runs must all be invisible
in the decisions. Plus: idempotent redelivery, re-crawl LWW updates,
no base recompute, and the drift monitor's fire/no-fire behavior.
"""

import pytest
from pyspark.sql import functions as F

from ds2_spark.config import (
    HocConfig,
    PipelineConfig,
    QualityConfig,
    SelectionConfig,
    VoteConfig,
)
from ds2_spark.operators.audio import FIXTURE_PCM16_ALIASES
from ds2_spark.plans.curation import embed_candidates, make_rules_stage
from ds2_spark.plans.incremental import (
    DriftThresholds,
    apply_frozen,
    bootstrap_curation,
    compact_snapshot,
    drift_report,
    finalize_decisions,
    incremental_update,
    load_calibration,
    read_snapshot,
    recalibrate,
)
from ds2_spark.sources.lineage import read_lineage, read_metrics

SMALL = PipelineConfig(
    hoc=HocConfig(rounds=10, sample_size=500, adam_steps=600),
    vote=VoteConfig(epochs=12, k=5, sample_size=500),
    selection=SelectionConfig(budget_frac=0.10),
    quality=QualityConfig(pcm16_alias_codecs=FIXTURE_PCM16_ALIASES),
    embed_dim=64,
)
N_WAVES = 4


def _split(clips_df):
    """Deterministic ~2:1 base/delta split."""
    w = F.pmod(F.hash("clip_id"), F.lit(3))
    return clips_df.filter(w != 0), clips_df.filter(w == 0)


def _dec(df) -> list[tuple]:
    return sorted(
        (r["clip_id"], r["keep"], r["reason"], r["final_score"])
        for r in df.collect()
    )


@pytest.fixture(scope="module")
def boot(spark, clips_df, fixture_paths, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("inc_root"))
    scores = spark.read.parquet(fixture_paths["scores"])
    base, delta = _split(clips_df)
    result = bootstrap_curation(
        spark, base, scores, root, SMALL, rater="rater_a", n_waves=N_WAVES
    )
    return {"root": root, "scores": scores, "base": base, "delta": delta,
            "boot": result}


def test_incremental_story_exact(spark, clips_df, boot):
    root, scores = boot["root"], boot["scores"]
    base, delta = boot["base"], boot["delta"]

    # ---- batch 1: the delta, under the frozen model
    res1 = incremental_update(
        spark, delta, scores, root, batch_id=1, cfg=SMALL, n_waves=N_WAVES
    )
    inc_dec = _dec(res1["decisions"])
    assert {r[0] for r in inc_dec} == {
        r["clip_id"] for r in clips_df.select("clip_id").collect()
    }

    # ---- exactness vs the one-pass twin under the SAME frozen model
    twin_rows = apply_frozen(spark, clips_df, scores, root, SMALL)
    twin_dec_df, twin_budget = finalize_decisions(twin_rows, SMALL)
    assert _dec(twin_dec_df) == inc_dec
    assert twin_budget == res1["budget"]

    # ---- idempotent redelivery of batch 1: same decisions, no new
    # lineage rows, snapshot row count unchanged
    lin_before = read_lineage(spark, root).count()
    snap_before = read_snapshot(spark, root).count()
    res1b = incremental_update(
        spark, delta, scores, root, batch_id=1, cfg=SMALL, n_waves=N_WAVES
    )
    assert _dec(res1b["decisions"]) == inc_dec
    assert read_lineage(spark, root).count() == lin_before
    assert read_snapshot(spark, root).count() == snap_before

    # ---- no base recompute: batch-1 stages saw only delta rows
    lin = read_lineage(spark, root)
    b1_in = (
        lin.filter(F.col("stage") == "rules_b1")
        .agg(F.sum("input_rows").alias("n")).collect()[0]["n"]
    )
    assert b1_in == delta.count()
    b0_rows = lin.filter(F.col("stage").isin("rules_b0", "embed_b0")).count()
    assert b0_rows == 2 * N_WAVES  # untouched since bootstrap

    # ---- batch 2: a re-crawled clip (transcript now empty) — the
    # newer version must win in the merged snapshot
    victim = delta.select("clip_id").orderBy("clip_id").limit(1).collect()[0][
        "clip_id"
    ]
    recrawl = delta.filter(F.col("clip_id") == victim).withColumn(
        "transcript", F.lit("")
    )
    res2 = incremental_update(
        spark, recrawl, scores, root, batch_id=2, cfg=SMALL, n_waves=N_WAVES
    )
    snap = read_snapshot(spark, root)
    assert snap.count() == clips_df.count()  # still one row per clip
    vrow = snap.filter(F.col("clip_id") == victim).collect()[0]
    assert vrow["version"] == 2
    assert vrow["reason"] == "empty_transcript"
    d2 = {r[0]: r for r in _dec(res2["decisions"])}
    assert d2[victim][2] == "empty_transcript"

    # ---- compaction: one rewrite, decisions unchanged
    n = compact_snapshot(spark, root)
    assert n == clips_df.count()
    dec_after, _ = finalize_decisions(read_snapshot(spark, root), SMALL)
    assert _dec(dec_after) == _dec(res2["decisions"])

    # ---- recalibration: refit on the grown corpus WITHOUT re-running
    # the per-row UDF stages (stage outputs are joined back from the
    # per-batch checkpoints). Must equal a fresh bootstrap over the
    # corpus as it now stands (victim's transcript re-crawled empty).
    rec = recalibrate(spark, scores, root, batch_id=3, cfg=SMALL)
    assert rec["model_version"] == 1
    current_corpus = clips_df.withColumn(
        "transcript",
        F.when(F.col("clip_id") == victim, F.lit("")).otherwise(
            F.col("transcript")
        ),
    )
    fresh_root = root + "_fresh"
    fresh = bootstrap_curation(
        spark, current_corpus, scores, fresh_root, SMALL,
        rater="rater_a", n_waves=N_WAVES,
    )
    assert _dec(rec["decisions"]) == _dec(fresh["decisions"])
    assert rec["budget"] == fresh["budget"]
    # src_batch survives the re-score: every clip's stage rows are
    # still discoverable for a future second recalibration
    snap3 = read_snapshot(spark, root)
    assert snap3.filter(F.col("version") != 3).count() == 0
    assert snap3.filter(F.col("src_batch") > 2).count() == 0


def test_drift_monitor_fire_and_no_fire(spark, clips_df, fixture_paths, boot):
    root, scores = boot["root"], boot["scores"]
    frozen, _curated = load_calibration(spark, root)

    def _report(clips):
        rules = make_rules_stage(SMALL)(clips).persist()
        emb = embed_candidates(rules.filter(F.col("keep_rules")), SMALL)
        rep = drift_report(rules, emb, frozen, DriftThresholds())
        rules.unpersist()
        return rep

    # i.i.d. delta (same generator, hash split): no drift
    rep = _report(boot["delta"])
    assert rep["recalibrate"] == 0.0, rep
    assert rep["lang_tv"] < 0.15

    # single-language slice: the language mix collapses -> must fire
    truth = spark.read.parquet(fixture_paths["truth"])
    top_lang = (
        truth.groupBy("lang_true").count().orderBy(F.desc("count")).limit(1)
        .collect()[0]["lang_true"]
    )
    skewed = clips_df.join(
        truth.filter(F.col("lang_true") == top_lang).select("clip_id"),
        "clip_id",
        "left_semi",
    )
    rep2 = _report(skewed)
    assert rep2["lang_tv"] > 0.15, rep2
    assert rep2["recalibrate"] == 1.0

    # drift metrics from the batch-1 update landed in _metrics
    m = read_metrics(spark, root).filter(F.col("stage") == "drift")
    names = {r["metric"] for r in m.collect()}
    assert {"lang_tv", "centroid_cos_drop", "recalibrate"} <= names
