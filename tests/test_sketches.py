"""HyperLogLog sketch: Spark registers vs a straight-Python twin,
estimate accuracy across regimes, and the shard-merge property that
makes the sketch usable for distributed cardinality planning."""

import hashlib

import pytest

from ds2_spark.functions.sketches import (
    HLL_M,
    hll_corrected,
    hll_estimate,
    hll_registers,
)


def _py_registers(values):
    regs = {}
    for v in values:
        h = hashlib.md5(str(v).encode()).hexdigest()
        b = int(h[:2], 16)
        s = h[2:17].lstrip("0")
        if not s:
            rho = 61
        else:
            d = int(s[0], 16)
            rho = 4 * (15 - len(s)) + (3 if d == 1 else 2 if d < 4 else 1 if d < 8 else 0) + 1
        regs[b] = max(regs.get(b, 0), rho)
    return regs


def test_registers_match_python_twin(spark):
    vals = [i * 7 % 2311 for i in range(5000)] + [None]
    df = spark.createDataFrame([(v,) for v in vals], "k int")
    got = {r["bucket"]: r["register"] for r in hll_registers(df, "k").collect()}
    assert got == _py_registers(v for v in vals if v is not None)


@pytest.mark.parametrize("n,tol", [(150, 0.15), (2311, 0.12), (20000, 0.12)])
def test_estimate_accuracy(spark, n, tol):
    df = spark.range(50000).selectExpr(f"id % {n} AS k")
    row = hll_estimate(hll_registers(df, "k")).first()
    est = hll_corrected(row["est_raw"], row["m_zero_registers"])
    assert abs(est / n - 1.0) < tol, (n, est)


def test_shard_merge_is_elementwise_max(spark):
    """Registers over the union equal the per-bucket max of shard
    registers — sketches computed independently per shard/engine merge
    exactly (the property exact countDistinct lacks)."""
    a = spark.range(0, 3000).selectExpr("id AS k")
    b = spark.range(2000, 7000).selectExpr("id AS k")
    u = a.union(b)
    ra = {r["bucket"]: r["register"] for r in hll_registers(a, "k").collect()}
    rb = {r["bucket"]: r["register"] for r in hll_registers(b, "k").collect()}
    ru = {r["bucket"]: r["register"] for r in hll_registers(u, "k").collect()}
    merged = {
        k: max(ra.get(k, 0), rb.get(k, 0)) for k in set(ra) | set(rb)
    }
    assert ru == merged


def test_linear_counting_small_range(spark):
    df = spark.range(40).selectExpr("id AS k")
    row = hll_estimate(hll_registers(df, "k")).first()
    assert row["m_zero_registers"] > 0
    est = hll_corrected(row["est_raw"], row["m_zero_registers"])
    assert abs(est / 40 - 1.0) < 0.2
    assert HLL_M == 256


def test_cms_never_underestimates_and_is_tight_for_heavy_keys(spark):
    """Count-min guarantees: est >= true for EVERY key (min over rows
    of counters that each contain the key's full count), and heavy
    hitters separate cleanly from the noise floor at sensible width.
    A deliberately narrow sketch (width < #keys) shows real collisions
    without breaking the lower bound."""
    from pyspark.sql import functions as F

    from ds2_spark.functions.sketches import cms_build, cms_estimate

    df = spark.range(30000).selectExpr(
        "CASE WHEN id % 10 < 8 THEN 'heavy' || (id % 2) "
        "ELSE 'tail' || (id % 499) END AS k"
    )
    truth = {r["k"]: r["c"] for r in df.groupBy("k").agg(
        F.count("*").alias("c")).collect()}

    for width in (256, 4096):
        sk = cms_build(df, "k", depth=4, width=width)
        probes = df.select("k").distinct()
        est = {r["k"]: r["est_count"] for r in cms_estimate(
            sk, probes, "k", depth=4, width=width).collect()}
        for key, t in truth.items():
            assert est[key] >= t, (width, key, t, est[key])
        # heavy keys dominate the estimate ranking at either width
        top2 = sorted(est, key=est.get, reverse=True)[:2]
        assert set(top2) == {"heavy0", "heavy1"}
    # roomy sketch: tail estimates are near-exact (few collisions)
    errs = [est[k] - truth[k] for k in truth if k.startswith("tail")]
    assert sum(e == 0 for e in errs) > len(errs) * 0.8


def test_cms_depth_bounds():
    import pytest as _pytest

    from ds2_spark.functions.sketches import cms_build

    with _pytest.raises(ValueError):
        cms_build(None, "k", depth=7)
