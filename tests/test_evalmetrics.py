"""operators/evalmetrics vs independent NumPy/pandas oracles.

AUC is checked against a from-first-principles tie-aware rank
implementation (average ranks over the raw rows, not the engine's
distinct-score decomposition); WER against the naive O(n*m) Python
DP (the engine uses the accumulate-trick vectorized DP — a different
algorithm); calibration bins against plain pandas arithmetic.
"""

import numpy as np
import pandas as pd
import pytest

from ds2_spark.operators.evalmetrics import (
    threshold_sweep,
    _lev_tokens,
    auc_by_group,
    calibration_bins,
    wer_pairs,
)


def _auc_oracle(scores, labels):
    """Average-rank Mann-Whitney AUC over raw rows (ties averaged)."""
    s = np.asarray(scores, dtype=float)
    y = np.asarray(labels, dtype=int)
    n_pos, n_neg = int(y.sum()), int((1 - y).sum())
    if n_pos == 0 or n_neg == 0:
        return None
    order = np.argsort(s, kind="mergesort")
    ranks = np.empty(len(s), dtype=float)
    i = 0
    srt = s[order]
    while i < len(s):
        j = i
        while j < len(s) and srt[j] == srt[i]:
            j += 1
        ranks[order[i:j]] = (i + j + 1) / 2.0  # avg of ranks i+1..j
        i = j
    u = ranks[y == 1].sum() - n_pos * (n_pos + 1) / 2.0
    return u / (n_pos * n_neg)


def _naive_lev(a, b):
    prev = list(range(len(b) + 1))
    for i, x in enumerate(a, 1):
        cur = [i]
        for j, yy in enumerate(b, 1):
            cur.append(min(prev[j] + 1, prev[j - 1] + (x != yy), cur[-1] + 1))
        prev = cur
    return prev[-1]


def test_vectorized_lev_matches_naive_dp_fuzz():
    rng = np.random.default_rng(11)
    for _ in range(300):
        a = rng.integers(0, 5, size=rng.integers(0, 14))
        b = rng.integers(0, 5, size=rng.integers(0, 14))
        assert _lev_tokens(a.astype(np.int64), b.astype(np.int64)) == (
            _naive_lev(list(a), list(b))
        )


def test_auc_by_group_matches_rank_oracle(spark):
    rng = np.random.default_rng(3)
    rows = []
    for g in range(4):
        n = 200 + 50 * g
        scores = rng.integers(0, 20, size=n)  # heavy ties
        # correlate labels with scores so AUC is interior
        labels = (rng.integers(0, 25, size=n) < scores).astype(int)
        rows += [(g, int(s), int(y)) for s, y in zip(scores, labels)]
    # degenerate groups: all-positive and all-negative -> NULL auc
    rows += [(90, s, 1) for s in range(5)]
    rows += [(91, s, 0) for s in range(5)]
    df = spark.createDataFrame(rows, "g int, score int, label int")
    got = {
        r["g"]: r
        for r in auc_by_group(df, "g", "score", "label").collect()
    }
    pdf = pd.DataFrame(rows, columns=["g", "score", "label"])
    for g, grp in pdf.groupby("g"):
        want = _auc_oracle(grp["score"].values, grp["label"].values)
        have = got[g]["auc"]
        if want is None:
            assert have is None
        else:
            assert have == pytest.approx(want, abs=1e-12)
        assert got[g]["n_pos"] == int(grp["label"].sum())
        assert got[g]["n_neg"] == int((1 - grp["label"]).sum())


def test_auc_perfect_and_antiperfect(spark):
    rows = [(0, i, int(i >= 5)) for i in range(10)]
    rows += [(1, i, int(i < 5)) for i in range(10)]
    df = spark.createDataFrame(rows, "g int, score int, label int")
    got = {r["g"]: r["auc"] for r in auc_by_group(df, "g", "score", "label").collect()}
    assert got[0] == pytest.approx(1.0)
    assert got[1] == pytest.approx(0.0)


def test_calibration_bins_match_pandas(spark):
    rng = np.random.default_rng(5)
    p = rng.integers(0, 101, size=3000)
    y = (rng.integers(0, 101, size=3000) < p).astype(int)
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(p, y)], "p int, y int"
    )
    got = (
        calibration_bins(df, "p", "y", n_bins=10, scale=100)
        .toPandas()
        .set_index("bin")
        .sort_index()
    )
    pdf = pd.DataFrame({"p": p, "y": y})
    pdf["bin"] = np.minimum(pdf["p"] * 10 // 101, 9)
    for b, grp in pdf.groupby("bin"):
        row = got.loc[b]
        assert row["n"] == len(grp)
        assert row["mean_pred"] == pytest.approx(grp["p"].mean() / 100.0)
        assert row["frac_pos"] == pytest.approx(grp["y"].mean())
        want_brier = (((grp["p"] - 100 * grp["y"]) ** 2).sum()) / 10000.0
        assert row["brier_sum"] == pytest.approx(want_brier)
        assert row["gap"] == pytest.approx(
            abs(grp["y"].mean() - grp["p"].mean() / 100.0), abs=1e-12
        )
    # p=100 must land in the top bin, not an out-of-range bin 10
    assert set(got.index) <= set(range(10))


def test_wer_pairs_match_naive_dp(spark):
    rng = np.random.default_rng(9)
    vocab = [f"w{i}" for i in range(30)]
    rows = []
    for k in range(40):
        ta = [vocab[i] for i in rng.integers(0, 30, size=rng.integers(1, 25))]
        tb = [vocab[i] for i in rng.integers(0, 30, size=rng.integers(0, 25))]
        rows.append((k, 1000 + k, ta, tb))
    # empty reference -> NULL wer, exact dist still reported
    rows.append((98, 1098, [], ["a", "b"]))
    df = spark.createDataFrame(
        rows,
        "id_a long, id_b long, tokens_a array<string>, tokens_b array<string>",
    )
    got = {r["id_a"]: r for r in wer_pairs(df).collect()}
    for id_a, id_b, ta, tb in rows:
        want = _naive_lev(ta, tb)
        r = got[id_a]
        assert r["dist"] == want
        assert r["n_ref"] == len(ta) and r["n_hyp"] == len(tb)
        if ta:
            assert r["wer"] == pytest.approx(want / len(ta))
        else:
            assert r["wer"] is None


def _sweep_oracle(scores, labels, t):
    s = np.asarray(scores)
    y = np.asarray(labels)
    keep = s >= t
    tp = int((keep & (y == 1)).sum())
    fp = int((keep & (y == 0)).sum())
    fn = int((~keep & (y == 1)).sum())
    tn = int((~keep & (y == 0)).sum())
    prec = tp / (tp + fp) if tp + fp else None
    rec = tp / (tp + fn) if tp + fn else None
    f1 = 2 * tp / (2 * tp + fp + fn) if 2 * tp + fp + fn else None
    return tp, fp, fn, tn, prec, rec, f1


def test_threshold_sweep_matches_naive_oracle(spark):
    rng = np.random.default_rng(23)
    n = 600
    scores = rng.integers(0, 101, size=n)
    labels = (rng.integers(0, 100, size=n) < scores).astype(int)
    groups = rng.integers(0, 3, size=n)
    df = spark.createDataFrame(
        pd.DataFrame({"g": groups, "s": scores, "y": labels})
    )
    ts = [0, 25, 50, 75, 100]
    got = {
        (r["g"], r["t"]): r
        for r in threshold_sweep(df, "s", "y", ts, group_col="g").collect()
    }
    assert len(got) == 3 * len(ts)
    for g in range(3):
        m = groups == g
        for t in ts:
            tp, fp, fn, tn, prec, rec, f1 = _sweep_oracle(
                scores[m], labels[m], t
            )
            r = got[(g, t)]
            assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (tp, fp, fn, tn)
            for k, want in (("precision", prec), ("recall", rec), ("f1", f1)):
                if want is None:
                    assert r[k] is None
                else:
                    assert r[k] == pytest.approx(want, abs=0)


def test_threshold_sweep_degenerate_and_monotone(spark):
    # all-negative population: recall NULL everywhere; precision NULL
    # once the threshold keeps nothing
    df = spark.createDataFrame(
        [(10, 0), (20, 0), (30, 0)], "s int, y int"
    )
    rows = {r["t"]: r for r in
            threshold_sweep(df, "s", "y", [0, 50]).collect()}
    assert rows[0]["recall"] is None and rows[0]["precision"] == 0.0
    assert rows[50]["precision"] is None and rows[50]["f1"] is None
    # recall is non-increasing and kept-count non-increasing in t
    rng = np.random.default_rng(7)
    s = rng.integers(0, 101, size=400)
    y = (rng.integers(0, 100, size=400) < s).astype(int)
    df2 = spark.createDataFrame(pd.DataFrame({"s": s, "y": y}))
    ts = list(range(0, 101, 10))
    out = sorted(
        threshold_sweep(df2, "s", "y", ts).collect(),
        key=lambda r: r["t"],
    )
    recalls = [r["recall"] for r in out]
    keeps = [r["tp"] + r["fp"] for r in out]
    assert all(a >= b for a, b in zip(recalls, recalls[1:]))
    assert all(a >= b for a, b in zip(keeps, keeps[1:]))

    with pytest.raises(ValueError):
        threshold_sweep(df2, "s", "y", [])
