"""operators/drift vs a pure-Python replay.

The replay recomputes PSI / chi-square / TV from first principles on
collected counts (math.log, fractions for TV), so the engine's
window + quantized-integer-sum plan is checked against an
independent formulation.
"""

import math
from fractions import Fraction

import numpy as np
import pytest
from pyspark.sql import functions as F

from ds2_spark.operators.drift import drift_buckets, drift_summary


def _replay(counts_a, counts_b, smoothing=1):
    buckets = sorted(set(counts_a) | set(counts_b))
    na, nb, B = sum(counts_a.values()), sum(counts_b.values()), len(buckets)
    psi = chi2 = 0
    tv = Fraction(0)
    for k in buckets:
        ca, cb = counts_a.get(k, 0), counts_b.get(k, 0)
        p = (ca + smoothing) / (na + smoothing * B)
        q = (cb + smoothing) / (nb + smoothing * B)
        psi += round((p - q) * math.log(p / q) * 1e6)
        if na and nb:
            ea = na * (ca + cb) / (na + nb)
            eb = nb * (ca + cb) / (na + nb)
            chi2 += round(
                ((ca - ea) ** 2 / ea + (cb - eb) ** 2 / eb) * 1e6
            )
        tv += abs(
            Fraction(ca + smoothing, na + smoothing * B)
            - Fraction(cb + smoothing, nb + smoothing * B)
        )
    return psi / 1e6, chi2 / 1e6, tv / 2


def test_drift_matches_python_replay(spark):
    rng = np.random.default_rng(5)
    xa = rng.integers(0, 12, size=3000)
    xb = np.minimum(rng.integers(0, 12, size=2000) + rng.integers(0, 3, size=2000), 11)
    a = spark.createDataFrame([(int(v),) for v in xa], "b int")
    b = spark.createDataFrame([(int(v),) for v in xb], "b int")
    row = drift_summary(a, b, "b").collect()[0]
    ca = {k: int(v) for k, v in zip(*np.unique(xa, return_counts=True))}
    cb = {k: int(v) for k, v in zip(*np.unique(xb, return_counts=True))}
    psi, chi2, tv = _replay(ca, cb)
    assert row["n_a"] == 3000 and row["n_b"] == 2000
    assert row["psi"] == pytest.approx(psi, abs=2e-6)
    assert row["chi2"] == pytest.approx(chi2, abs=2e-6)
    assert float(row["tv_distance"]) == pytest.approx(float(tv), rel=1e-12)
    # per-bucket counts agree
    cells = {r["bucket"]: r for r in drift_buckets(a, b, "b").collect()}
    for k in set(ca) | set(cb):
        assert cells[k]["cnt_a"] == ca.get(k, 0)
        assert cells[k]["cnt_b"] == cb.get(k, 0)


def test_drift_self_zero_and_thresholds(spark):
    a = spark.range(5000).select((F.col("id") % 7).alias("b"))
    row = drift_summary(a, a, "b").collect()[0]
    assert row["psi"] == 0.0 and row["chi2"] == 0.0
    assert float(row["tv_distance"]) == 0.0
    # a real shift crosses the conventional 0.25 action threshold
    shifted = spark.range(5000).select(
        F.least(F.col("id") % 7 + 2, F.lit(6)).alias("b")
    )
    moved = drift_summary(a, shifted, "b").collect()[0]
    assert moved["psi"] > 0.25
    assert moved["chi2"] > 0.25
    assert float(moved["tv_distance"]) > 0.2

    with pytest.raises(ValueError):
        drift_buckets(a, a, "b", smoothing=0)
