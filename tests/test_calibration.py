"""Engine-vs-oracle parity for the DS2 calibration chain (the
F1 >= 0.99 gate — required exact here)."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from ds2_spark.config import (
    HocConfig,
    PipelineConfig,
    QualityConfig,
    SelectionConfig,
    VoteConfig,
)
from ds2_spark.fixtures import make_t_true
from ds2_spark.operators.audio import FIXTURE_PCM16_ALIASES
from ds2_spark.operators.hoc import (
    consensus_counts,
    counts_to_tensors,
    estimate_t,
    solve_t,
    t_given_noisy,
)
from ds2_spark.operators.votes import vote_epochs
from ds2_spark.plans.curation import curation_pipeline

from .oracle import ds2_oracle

SMALL = PipelineConfig(
    hoc=HocConfig(rounds=10, sample_size=500, adam_steps=600),
    vote=VoteConfig(epochs=12, k=5, sample_size=500),
    selection=SelectionConfig(budget_frac=0.10),
    # fixture payloads are PCM16 under every codec tag (FIXTURES.md)
    quality=QualityConfig(pcm16_alias_codecs=FIXTURE_PCM16_ALIASES),
    embed_dim=64,
)


@pytest.fixture(scope="module")
def pool(fixture_paths):
    """Deterministic candidate pool straight from fixture parquet."""
    from ds2_spark.functions import textkernels as tk
    from .oracle.rules_oracle import rule_reasons

    reasons = rule_reasons(fixture_paths["clips"], SMALL)
    tbl = pq.read_table(fixture_paths["clips"], columns=["clip_id", "transcript"])
    texts = dict(zip(tbl.column("clip_id").to_pylist(), tbl.column("transcript").to_pylist()))
    ids = np.array(sorted(i for i, r in reasons.items() if r == "candidate"))
    emb = tk.embed_texts([texts[i] or "" for i in ids], dim=SMALL.embed_dim)
    sc = pq.read_table(fixture_paths["scores"]).to_pandas()
    sc = sc[sc.rater == "rater_a"].set_index("clip_id")["raw_score"]
    labels = sc.loc[ids].to_numpy().astype(np.int64)
    return emb, labels, ids


def test_consensus_counts_match_oracle(spark, pool):
    emb, labels, _ = pool
    rows = consensus_counts(spark, emb, labels, SMALL.hoc).collect()
    c3_engine = np.zeros((6, 6, 6))
    for r in rows:
        c3_engine[r["y0"], r["y1"], r["y2"]] = r["cnt"]
    c3_oracle = ds2_oracle.consensus_counts_oracle(emb, labels, SMALL.hoc)
    assert np.allclose(c3_engine, c3_oracle, atol=1e-12)


def test_solver_recovers_known_t():
    t_true = make_t_true()
    p = np.array([0.06, 0.15, 0.29, 0.29, 0.20, 0.01])
    pt = p[:, None] * t_true
    c1 = pt.sum(0)
    c2 = np.einsum("ji,jk->ik", pt, t_true)
    c3 = np.einsum("ji,jk,jl->ikl", pt, t_true, t_true)
    res = solve_t(c1, c2, c3, HocConfig(adam_steps=1500))
    assert np.abs(res.T - t_true).max() < 0.05
    assert np.abs(res.p_clean - p).max() < 0.02
    assert np.allclose(res.T.sum(axis=1), 1.0)  # row-stochastic property


def test_analytic_gradients_match_central_differences():
    """_loss_and_grads' closed-form backprop == central-difference FD
    on random logits (the r3→r4 solver change must not alter the
    optimization surface)."""
    from ds2_spark.operators.hoc import _forward_loss, _loss_and_grads

    rng = np.random.default_rng(11)
    t_true = make_t_true()
    p = np.array([0.06, 0.15, 0.29, 0.29, 0.20, 0.01])
    pt = p[:, None] * t_true
    c1 = pt.sum(0)
    c2 = np.einsum("ji,jk->ik", pt, t_true)
    c3 = np.einsum("ji,jk,jl->ikl", pt, t_true, t_true)
    a = rng.normal(0, 1.5, size=(6, 6))
    b = rng.normal(0, 1.0, size=6)
    loss, g_a, g_b = _loss_and_grads(a, b, c1, c2, c3)
    assert loss == pytest.approx(_forward_loss(a, b, c1, c2, c3))
    h = 1e-6
    for arr, g in ((a, g_a), (b, g_b)):
        flat, gflat = arr.ravel(), g.ravel()
        for j in range(flat.size):
            orig = flat[j]
            flat[j] = orig + h
            lp = _forward_loss(a, b, c1, c2, c3)
            flat[j] = orig - h
            lm = _forward_loss(a, b, c1, c2, c3)
            flat[j] = orig
            fd = (lp - lm) / (2 * h)
            assert gflat[j] == pytest.approx(fd, abs=1e-6, rel=1e-4)


def test_hoc_recovers_t_on_clusterable_data(spark):
    """End-to-end HOC on synthetic clusterable embeddings: neighbors
    share clean labels by construction, so T should be recovered."""
    rng = np.random.default_rng(3)
    t_true = make_t_true()
    n, k = 3000, 6
    clean = rng.integers(0, k, size=n)
    centers = rng.normal(0, 1, size=(k, 32)) * 4
    emb = centers[clean] + rng.normal(0, 0.3, size=(n, 32))
    cdf = np.cumsum(t_true, axis=1)
    noisy = (rng.random(n)[:, None] < cdf[clean]).argmax(axis=1)
    res = estimate_t(spark, emb, noisy, HocConfig(rounds=25, sample_size=3000, adam_steps=1200))
    assert np.abs(res.T - t_true).max() < 0.15


def test_votes_match_oracle(spark, pool):
    emb, labels, ids = pool
    noise_rates = np.full(6, 0.3)
    engine = vote_epochs(spark, emb, labels, ids, noise_rates, SMALL.vote)
    got = sorted(
        (r["epoch"], r["clip_id"], r["flagged"], r["suggested"])
        for r in engine.collect()
    )
    expected = sorted(ds2_oracle.votes_oracle(emb, labels, ids, noise_rates, SMALL.vote))
    assert got == expected


def test_full_pipeline_matches_oracle(spark, clips_df, fixture_paths):
    scores = spark.read.parquet(fixture_paths["scores"])
    result = curation_pipeline(spark, clips_df, scores, SMALL, rater="rater_a")
    engine = {
        r["clip_id"]: (r["keep"], r["reason"], r["final_score"])
        for r in result["decisions"].collect()
    }
    noise_rates = 1.0 - np.diag(t_given_noisy(result["hoc"]))
    oracle = ds2_oracle.curation_oracle(
        fixture_paths["clips"], fixture_paths["scores"], noise_rates, SMALL, "rater_a"
    )
    exp = oracle["decisions"]
    assert set(engine) == set(exp)
    mismatch = []
    for cid, (keep, reason, fs) in engine.items():
        ek, er, efs = exp[cid]
        if keep != ek or reason != er or (efs is not None and fs != efs):
            mismatch.append((cid, (keep, reason, fs), (ek, er, efs)))
    assert not mismatch, mismatch[:5]
    # keep/drop F1 vs oracle must be perfect
    n_keep = sum(1 for v in engine.values() if v[0])
    assert n_keep == oracle["budget"]


def test_full_pipeline_matches_oracle_pool_capped(spark, clips_df, fixture_paths):
    """Same full-chain parity with the kNN pool cap ACTIVE — the
    10^12-row operating mode, where votes/curation run on a bounded
    deterministic md5-gated pool and non-pool candidates keep raw
    scores but are lt-scored against the pool. The oracle replays pool
    MEMBERSHIP itself via hashlib (pool_oracle), so this also pins
    collect_pool's determinism: partition layout can't move the pool."""
    from dataclasses import replace

    cfg = replace(SMALL, knn_pool_max=300)
    scores = spark.read.parquet(fixture_paths["scores"])
    result = curation_pipeline(spark, clips_df, scores, cfg, rater="rater_a")
    engine = {
        r["clip_id"]: (r["keep"], r["reason"], r["final_score"])
        for r in result["decisions"].collect()
    }
    assert result["pool_size"] == 300  # the cap genuinely engaged
    noise_rates = 1.0 - np.diag(t_given_noisy(result["hoc"]))
    oracle = ds2_oracle.curation_oracle(
        fixture_paths["clips"], fixture_paths["scores"], noise_rates, cfg, "rater_a"
    )
    exp = oracle["decisions"]
    assert set(engine) == set(exp)
    mismatch = [
        (cid, engine[cid], exp[cid])
        for cid in engine
        if engine[cid][0] != exp[cid][0]
        or engine[cid][1] != exp[cid][1]
        or (exp[cid][2] is not None and engine[cid][2] != exp[cid][2])
    ]
    assert not mismatch, mismatch[:5]
    n_keep = sum(1 for v in engine.values() if v[0])
    assert n_keep == oracle["budget"]
    for df in result["_persisted"]:
        df.unpersist()


def test_full_pipeline_matches_oracle_missing_scores(
    spark, clips_df, fixture_paths, tmp_path
):
    """Parity when the rater NEVER SCORED some candidates — the
    operating mode the oracle used to assume away (it crashed on
    sc.loc[ids] / KeyError). Engine semantics under test: score-less
    pool members are masked out of HOC/votes (calibrate_rater's
    np.isin) but stay in the lt reference pool, and a score-less
    candidate's final_score coalesces to 0 (score_candidates)."""
    import pyarrow.parquet as pq

    sc = pq.read_table(fixture_paths["scores"]).to_pandas()
    # drop rater_a's rows for ~1/7 of clips (deterministic cut)
    drop = (sc.rater == "rater_a") & (
        sc.clip_id.str[-1].isin(list("07"))
    )
    assert drop.sum() > 10, "fixture must actually lose some scores"
    holey = tmp_path / "scores_holey.parquet"
    sc[~drop].to_parquet(holey, index=False)

    from dataclasses import replace

    cfg = replace(SMALL, knn_pool_max=300)
    scores = spark.read.parquet(str(holey))
    result = curation_pipeline(spark, clips_df, scores, cfg, rater="rater_a")
    engine = {
        r["clip_id"]: (r["keep"], r["reason"], r["final_score"])
        for r in result["decisions"].collect()
    }
    noise_rates = 1.0 - np.diag(t_given_noisy(result["hoc"]))
    oracle = ds2_oracle.curation_oracle(
        fixture_paths["clips"], str(holey), noise_rates, cfg, "rater_a"
    )
    exp = oracle["decisions"]
    assert set(engine) == set(exp)
    mismatch = [
        (cid, engine[cid], exp[cid])
        for cid in engine
        if engine[cid][0] != exp[cid][0]
        or engine[cid][1] != exp[cid][1]
        or (exp[cid][2] is not None and engine[cid][2] != exp[cid][2])
    ]
    assert not mismatch, mismatch[:5]
    n_keep = sum(1 for v in engine.values() if v[0])
    assert n_keep == oracle["budget"]
    for df in result["_persisted"]:
        df.unpersist()


def test_selection_monotone_in_budget(spark, clips_df, fixture_paths):
    from pyspark.sql import functions as F

    from ds2_spark.operators.selection import select_subset

    scores = spark.read.parquet(fixture_paths["scores"]).filter(
        F.col("rater") == "rater_a"
    )
    scored = scores.select(
        "clip_id",
        F.col("raw_score").cast("int").alias("final_score"),
        (F.pmod(F.hash("clip_id"), F.lit(1000)) / 1000.0).alias("lt_score"),
    )
    small = {
        r["clip_id"]
        for r in select_subset(scored, 50).filter("selected").collect()
    }
    big = {
        r["clip_id"]
        for r in select_subset(scored, 120).filter("selected").collect()
    }
    assert len(small) == 50 and len(big) == 120
    assert small <= big  # monotonicity


# Reference-corpus score distributions (class histograms of the frozen
# raw_scores/*/output_scores.pt files, documented with counts in
# BASELINE.md "Frozen score distributions"). mistral's 487-of-300932
# class 5 is the stress case: scaled down it leaves classes with a
# handful of rows, exercising the per-class percentile thresholds and
# empty-sample paths that uniform synthetic scores never hit.
REF_SCORE_HISTS = {
    "gpt-4o-mini": {0: 18626, 1: 44401, 2: 86132, 3: 87975, 4: 59969, 5: 3829},
    "mistral-7b": {0: 2436, 1: 52908, 2: 60607, 3: 118313, 4: 66181, 5: 487},
}


def _labels_from_hist(hist: dict[int, int], n: int, rng) -> np.ndarray:
    total = sum(hist.values())
    counts = {c: max(round(n * v / total), 1) for c, v in hist.items()}
    # largest class absorbs the rounding drift
    big = max(counts, key=counts.get)
    counts[big] += n - sum(counts.values())
    labels = np.concatenate([np.full(k, c) for c, k in sorted(counts.items())])
    rng.shuffle(labels)
    return labels.astype(np.int64)


@pytest.mark.parametrize("model", sorted(REF_SCORE_HISTS))
def test_votes_exact_on_reference_score_distribution(spark, model):
    """Engine==oracle vote parity under the reference's real (skewed)
    class distributions at 1/60 scale — tiny classes (mistral class 5
    ≈ 10 rows of 6000) stress threshold percentiles per class."""
    rng = np.random.default_rng(7)
    n, dim = 6000, 32
    labels = _labels_from_hist(REF_SCORE_HISTS[model], n, rng)
    centers = rng.normal(0, 1, size=(6, dim)) * 3
    emb = (centers[labels] + rng.normal(0, 0.5, size=(n, dim))).astype(np.float32)
    ids = np.array([f"c{i:05d}" for i in range(n)])
    noise_rates = np.array([0.1, 0.2, 0.35, 0.3, 0.25, 0.9])  # incl. clip bounds
    cfg = VoteConfig(epochs=8, k=5, sample_size=2500)
    engine = vote_epochs(spark, emb, labels, ids, noise_rates, cfg)
    got = sorted(
        (r["epoch"], r["clip_id"], r["flagged"], r["suggested"])
        for r in engine.collect()
    )
    expected = sorted(ds2_oracle.votes_oracle(emb, labels, ids, noise_rates, cfg))
    assert got == expected
    # the rare class must actually appear in the votes (not silently dropped)
    assert 5 in {labels[int(cid[1:])] for _, cid, _, _ in got}


def test_full_pipeline_matches_oracle_alt_profile(spark, tmp_path_factory):
    """The same end-to-end keep/drop parity on a SECOND fixture
    profile — different seed, 3x longer clips, 3x slower speech
    (different duration/length/rate joint distribution, different
    language mix realization) — so the F1==1.0 result is not an
    artifact of the default profile's parameter corner."""
    from ds2_spark.fixtures import generate_all

    alt_dir = str(tmp_path_factory.mktemp("ds2_alt_profile"))
    paths = generate_all(
        alt_dir, n=500, seed=20260818,
        dur_median_ms=1500.0, dur_max_ms=6000, chars_per_sec=40.0,
    )
    clips = spark.read.parquet(paths["clips"])
    scores = spark.read.parquet(paths["scores"])
    result = curation_pipeline(spark, clips, scores, SMALL, rater="rater_a")
    engine = {
        r["clip_id"]: (r["keep"], r["reason"], r["final_score"])
        for r in result["decisions"].collect()
    }
    noise_rates = 1.0 - np.diag(t_given_noisy(result["hoc"]))
    oracle = ds2_oracle.curation_oracle(
        paths["clips"], paths["scores"], noise_rates, SMALL, "rater_a"
    )
    exp = oracle["decisions"]
    assert set(engine) == set(exp)
    mismatch = [
        (cid, engine[cid], exp[cid])
        for cid in engine
        if engine[cid][:2] != exp[cid][:2]
        or (exp[cid][2] is not None and engine[cid][2] != exp[cid][2])
    ]
    assert not mismatch, mismatch[:5]
    assert sum(1 for v in engine.values() if v[0]) == oracle["budget"]


def test_rater_agreement_report_on_fixture(spark, fixture_paths):
    """The pre-calibration kappa diagnostic over the 3-rater fixture:
    all raters share the same transition matrix (fixtures.py applies
    one T with different seeds), so the three pairwise kappas must be
    (a) well above chance — the clean signal shows through the noise
    — and (b) close to EACH OTHER; a NumPy replay pins one pair."""
    from collections import Counter

    from ds2_spark.plans.report import rater_agreement_report

    scores = spark.read.parquet(fixture_paths["scores"])
    rep = rater_agreement_report(scores).collect()
    assert [(r["rater_a"], r["rater_b"]) for r in rep] == [
        ("rater_a", "rater_b"),
        ("rater_a", "rater_c"),
        ("rater_b", "rater_c"),
    ]
    n = scores.where("rater = 'rater_a'").count()
    kappas = [r["kappa"] for r in rep]
    assert all(r["n_items"] == n for r in rep)
    assert all(k > 0.2 for k in kappas), kappas
    assert max(kappas) - min(kappas) < 0.2, kappas

    # independent replay of the (rater_a, rater_b) pair
    pdf = pq.read_table(fixture_paths["scores"]).to_pandas()
    a = pdf[pdf.rater == "rater_a"].set_index("clip_id")["raw_score"]
    b = pdf[pdf.rater == "rater_b"].set_index("clip_id")["raw_score"]
    pairs = [(int(a[i]), int(b[i])) for i in a.index]
    agree = sum(1 for x, y in pairs if x == y)
    row, col = Counter(x for x, _ in pairs), Counter(y for _, y in pairs)
    pe_num = sum(row[v] * col.get(v, 0) for v in row)
    m = len(pairs)
    want = (agree * m - pe_num) / (m * m - pe_num)
    r0 = rep[0]
    assert (r0["n_agree"], r0["pe_num"]) == (agree, pe_num)
    assert r0["kappa"] == want


def test_full_pipeline_matches_oracle_skew_profile(spark, tmp_path_factory):
    """End-to-end keep/drop parity on a SKEW-STRESSED profile — the
    north rule's named hazard: one hot language (92% en) and 10x the
    long-transcript tail (5% of clips at 50x length). Parity must
    hold because every pipeline stage is keyed by clip_id or salted,
    never by language; the companion assertion pins that the salted
    scatter actually balances this skew (max/mean partition load)."""
    from pyspark.sql import functions as F

    from ds2_spark.fixtures import generate_all
    from ds2_spark.plans.pipeline import salted_repartition

    skew_dir = str(tmp_path_factory.mktemp("ds2_skew_profile"))
    paths = generate_all(
        skew_dir, n=500, seed=20260819,
        lang_weights={"en": 0.92, "es": 0.02, "de": 0.02,
                      "fr": 0.02, "zh": 0.02},
        long_tail_frac=0.05,
    )
    clips = spark.read.parquet(paths["clips"])
    scores = spark.read.parquet(paths["scores"])

    # the skew is real: en dominates and the long tail is heavy
    truth = spark.read.parquet(paths["truth"])
    n_en = truth.filter("lang_true = 'en'").count()
    assert n_en > 0.85 * 500
    tail = clips.filter(F.length("transcript") > 2000).count()
    assert tail >= 10

    result = curation_pipeline(spark, clips, scores, SMALL, rater="rater_a")
    engine = {
        r["clip_id"]: (r["keep"], r["reason"], r["final_score"])
        for r in result["decisions"].collect()
    }
    noise_rates = 1.0 - np.diag(t_given_noisy(result["hoc"]))
    oracle = ds2_oracle.curation_oracle(
        paths["clips"], paths["scores"], noise_rates, SMALL, "rater_a"
    )
    exp = oracle["decisions"]
    assert set(engine) == set(exp)
    mismatch = [
        (cid, engine[cid], exp[cid])
        for cid in engine
        if engine[cid][:2] != exp[cid][:2]
        or (exp[cid][2] is not None and engine[cid][2] != exp[cid][2])
    ]
    assert not mismatch, mismatch[:5]
    assert sum(1 for v in engine.values() if v[0]) == oracle["budget"]

    # salted scatter vs the naive language-keyed scatter: the hot
    # language would put >= 85% of rows on one partition; the salt
    # must cut the max partition load to a small multiple of uniform
    # (not exactly uniform — 64 salt buckets over 8 partitions leave
    # binomial lumpiness at n=500)
    with_lang = clips.join(
        truth.select("clip_id", "lang_true"), "clip_id"
    )
    by_lang = (
        with_lang.repartition(8, "lang_true")
        .withColumn("p", F.spark_partition_id())
        .groupBy("p").count().collect()
    )
    salted = (
        salted_repartition(with_lang, 8)
        .withColumn("p", F.spark_partition_id())
        .groupBy("p").count().collect()
    )
    max_lang = max(r["count"] for r in by_lang)
    loads = [r["count"] for r in salted]
    assert max_lang >= n_en  # the hazard is real without salting
    assert len(loads) == 8
    assert max(loads) <= 2.0 * (sum(loads) / len(loads)), loads
    assert max(loads) < 0.4 * max_lang, (max(loads), max_lang)
