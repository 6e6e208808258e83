"""Deterministic stratified sampling: portability, stability, rates."""

import hashlib

import pytest

from pyspark.sql import functions as F

from ds2_spark.operators.sampling import (
    hash_bucket,
    mixture_weights,
    stratified_sample,
)


def _py_bucket(doc_id: int, den: int) -> int:
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:12], 16) % den


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"s{i % 4}") for i in range(2000)]
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_hash_bucket_matches_stdlib_md5(spark, docs):
    got = {
        r["doc_id"]: r["b"]
        for r in docs.select(
            "doc_id", hash_bucket(F.col("doc_id"), 1000).alias("b")
        ).collect()
    }
    for i in range(2000):
        assert got[i] == _py_bucket(i, 1000), i


def test_stratified_sample_exact_membership(spark, docs):
    rates = {"s0": 0.5, "s1": 0.1}
    kept = {
        r["doc_id"]
        for r in stratified_sample(
            docs, "source", "doc_id", rates, default_rate=0.02, den=1000
        ).collect()
    }
    for i in range(2000):
        thr = {"s0": 500, "s1": 100}.get(f"s{i % 4}", 20)
        assert (i in kept) == (_py_bucket(i, 1000) < thr), i


def test_membership_stable_under_repartition(spark, docs):
    rates = {"s0": 0.3}
    a = {
        r["doc_id"]
        for r in stratified_sample(docs, "source", "doc_id", rates).collect()
    }
    b = {
        r["doc_id"]
        for r in stratified_sample(
            docs.repartition(13, "source"), "source", "doc_id", rates
        ).collect()
    }
    assert a == b


def test_mixture_weights_hits_target_ratios(spark):
    # 1000 s0 + 3000 s1; target 50/50 -> s0 rate 1.0, s1 rate 1/3
    rows = [(i, "s0" if i < 1000 else "s1") for i in range(4000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    w = mixture_weights(df, "source", {"s0": 0.5, "s1": 0.5})
    assert w["s0"] == pytest.approx(1.0)
    assert w["s1"] == pytest.approx(1 / 3)
    kept = stratified_sample(df, "source", "doc_id", w, den=1_000_000)
    counts = {
        r["source"]: r["n"]
        for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    # md5 uniformity: expect ~1000 of each (binomial, sd ~26 for s1)
    assert counts["s0"] == 1000
    assert abs(counts["s1"] - 1000) < 120


def test_temperature_rates_and_sample(spark):
    """alpha<1 up-weights the tail; alpha=1 is exactly proportional
    (every rate == target_frac); membership equals a manual bucket
    filter with the recomputed thresholds."""
    from ds2_spark.operators.sampling import (
        hash_bucket,
        temperature_rates,
        temperature_sample,
    )

    rows = [(i, "big" if i < 800 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")

    r = temperature_rates(df, "source", alpha=0.3, target_frac=0.5)
    wb, ws = 800 ** 0.3, 200 ** 0.3
    assert r["big"] == round(500 * (wb / (wb + ws)) / 800, 6)
    assert r["small"] == round(500 * (ws / (wb + ws)) / 200, 6)
    assert r["small"] > r["big"]  # tail up-weighted

    r1 = temperature_rates(df, "source", alpha=1.0, target_frac=0.5)
    assert r1 == {"big": 0.5, "small": 0.5}  # proportional == flat

    kept = {
        x["doc_id"]
        for x in temperature_sample(
            df, "source", "doc_id", alpha=0.3, target_frac=0.5
        ).collect()
    }
    buckets = {
        x["doc_id"]: x["b"]
        for x in df.select(
            "doc_id", hash_bucket(F.col("doc_id")).alias("b")
        ).collect()
    }
    exp = {
        i: b
        for (i, src), b in zip(rows, [buckets[i] for i, _ in rows])
    }
    manual = {
        i
        for i, src in rows
        if buckets[i] < int(r["big" if src == "big" else "small"] * 1_000_000)
    }
    assert kept == manual


def test_priority_sample_matches_numpy_oracle(spark, docs):
    """Engine vs an independent NumPy/stdlib replay of DLT priority
    sampling: same u(id), same top-k membership, same tau and
    estimator; groups smaller than k keep everything with est_w == w."""
    import numpy as np

    from ds2_spark.operators.sampling import priority_sample

    weighted = docs.withColumn(
        "w_col", (F.col("doc_id") % 97 + 1).cast("long")
    )
    k = 25
    got = priority_sample(
        weighted, group="source", id_col="doc_id", weight_col="w_col", k=k
    ).collect()

    # independent replay
    rows = [(i, f"s{i % 4}", i % 97 + 1) for i in range(2000)]
    by_group: dict[str, list] = {}
    for i, g, w in rows:
        u = _py_bucket(i, 1_000_000) + 1
        by_group.setdefault(g, []).append((w / u, i, w, u))
    expect = {}
    for g, items in by_group.items():
        items.sort(key=lambda t: (-t[0], t[1]))
        tau = items[k][0] if len(items) > k else 0.0
        for rn, (pri, i, w, u) in enumerate(items[:k], start=1):
            expect[(g, i)] = (w, u, pri, rn, max(float(w), tau))

    assert len(got) == len(expect)
    for r in got:
        key = (r["source"], r["doc_id"])
        w, u, pri, rn, est = expect[key]
        assert (r["w"], r["u"], r["rn"]) == (w, u, rn), key
        assert r["pri"] == pri, key          # IEEE division, bit-exact
        assert r["est_w"] == est, key
        assert r["est_w"] >= r["w"]


def test_priority_sample_small_group_keeps_all(spark):
    from ds2_spark.operators.sampling import priority_sample

    df = spark.createDataFrame(
        [(i, "only", 10 * i + 1) for i in range(5)],
        "doc_id long, source string, w_col long",
    )
    got = priority_sample(
        df, group="source", id_col="doc_id", weight_col="w_col", k=20
    ).collect()
    assert len(got) == 5
    for r in got:
        assert r["est_w"] == float(r["w"])  # tau == 0 when |group| <= k


def test_token_budget_plan_matches_reference_and_caps(spark):
    """token_budget_plan vs a from-scratch float replay; a tiny
    stratum must CAP at rate 1.0 (ppm exactly 1000000) and a
    zero-token stratum must plan rate 0, not NaN."""
    import math

    from ds2_spark.operators.sampling import token_budget_plan

    rows = (
        [("big", i, 400) for i in range(50)]
        + [("mid", 100 + i, 250) for i in range(20)]
        + [("tiny", 200 + i, 30) for i in range(3)]
        + [("empty", 300 + i, 0) for i in range(2)]
    )
    df = spark.createDataFrame(rows, "source string, doc_id long, n_tokens long")
    plan = token_budget_plan(
        df, "source", "n_tokens", alpha=0.5, token_budget=8_000
    )

    # independent replay
    agg = {}
    for s, _, t in rows:
        n, tot = agg.get(s, (0, 0))
        agg[s] = (n + 1, tot + t)
    wsum = sum(t ** 0.5 for _, t in agg.values())
    exp = []
    for s in sorted(agg):
        n, t = agg[s]
        rate = round(min(1.0, (8_000 * (t ** 0.5 / wsum)) / t), 6) if t else 0.0
        ppm = math.floor(rate * 1_000_000)
        exp.append((s, n, t, ppm, t * ppm // 1_000_000))
    assert plan == exp

    got = {p[0]: p for p in plan}
    assert got["tiny"][3] == 1_000_000          # capped: keep all 90 tokens
    assert got["tiny"][4] == got["tiny"][2]
    assert got["empty"][3] == 0 and got["empty"][4] == 0
    assert 0 < got["big"][3] < 1_000_000        # genuinely downsampled
    # alpha<1 up-weights the small stratum: higher rate than the big one
    assert got["mid"][3] > got["big"][3]


def test_token_budget_rates_feed_stratified_sample(spark):
    """The planned ppm rates ARE stratified_sample thresholds: actual
    sampled token mass lands near expected_tokens (md5 buckets are
    uniform, so within a loose binomial band)."""
    from ds2_spark.operators.sampling import (
        stratified_sample,
        token_budget_plan,
    )

    rows = [
        (f"s{i % 4}", i, 50 + (i * 7) % 90) for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "source string, doc_id long, n_tokens long")
    plan = token_budget_plan(
        df, "source", "n_tokens", alpha=0.5, token_budget=60_000
    )
    rates = {s: ppm / 1_000_000 for s, _, _, ppm, _ in plan}
    kept = stratified_sample(df, "source", "doc_id", rates)
    kept_tok = {
        r["source"]: r["t"]
        for r in kept.groupBy("source").agg(F.sum("n_tokens").alias("t")).collect()
    }
    for s, _, _, _, expected in plan:
        assert abs(kept_tok[s] - expected) < 0.2 * expected + 500, (
            s, kept_tok[s], expected
        )
