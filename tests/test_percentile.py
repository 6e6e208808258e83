import numpy as np
import pytest
from pyspark.sql import functions as F

from ds2_spark.operators.percentile import grouped_percentile_hist


def _toy(spark, seed=7, n=4000, groups=4, dp=2, null_frac=0.01):
    rng = np.random.default_rng(seed)
    g = rng.integers(0, groups, n)
    v = np.round(rng.normal(50, 10, n), dp)
    v[rng.random(n) < null_frac] = np.nan
    rows = [
        (int(gi), None if np.isnan(vi) else float(vi)) for gi, vi in zip(g, v)
    ]
    return spark.createDataFrame(rows, ["grp", "val"]).repartition(8), g, v


def test_hist_percentile_matches_builtin_and_numpy(spark):
    """Histogram decomposition == Spark percentile() == np.percentile,
    including the p=0 / p=1 edges, interpolating ps, and NULL exclusion."""
    df, g, v = _toy(spark)
    ps = [0.0, 0.25, 0.5, 0.75, 0.9, 1.0]
    got = {
        r["grp"]: r
        for r in grouped_percentile_hist(df, ["grp"], "val", ps).collect()
    }
    ref = df.groupBy("grp").agg(
        *[
            F.expr(f"percentile(val, {p})").alias(f"r{i}")
            for i, p in enumerate(ps)
        ]
    ).collect()
    labels = ["p0", "p25", "p50", "p75", "p90", "p100"]
    for r in ref:
        gr = got[r["grp"]]
        for i, lab in enumerate(labels):
            assert gr[lab] == pytest.approx(r[f"r{i}"], abs=1e-12)
    for gi in set(g.tolist()):
        vals = v[(g == gi) & ~np.isnan(v)]
        assert got[gi]["n"] == len(vals)
        for p, lab in zip(ps, labels):
            assert got[gi][lab] == pytest.approx(
                float(np.percentile(vals, p * 100)), abs=1e-9
            )


def test_hist_percentile_single_value_group_and_labels(spark):
    df = spark.createDataFrame([(0, 5.0), (1, 1.0), (1, 3.0)], ["grp", "val"])
    out = grouped_percentile_hist(df, ["grp"], "val", [0.5, 0.125])
    assert set(out.columns) == {"grp", "n", "p50", "p12_5000"}
    rows = {r["grp"]: r for r in out.collect()}
    assert rows[0]["p50"] == 5.0 and rows[0]["n"] == 1
    assert rows[1]["p50"] == 2.0  # midpoint interpolation
    assert rows[1]["p12_5000"] == pytest.approx(1.25)


def test_hist_percentile_refuses_unbounded_domain(spark):
    """The guard must refuse loudly instead of building a giant window."""
    df = spark.range(0, 3000).select(
        (F.col("id") % 2).alias("grp"),
        (F.col("id").cast("double") / 7.0).alias("val"),  # ~all distinct
    )
    with pytest.raises(ValueError, match="max_hist_rows"):
        grouped_percentile_hist(
            df, ["grp"], "val", [0.5], max_hist_rows=100
        )
    with pytest.raises(ValueError, match="out of range"):
        grouped_percentile_hist(df, ["grp"], "val", [1.5])
    with pytest.raises(ValueError, match="non-empty"):
        grouped_percentile_hist(df, ["grp"], "val", [])


def test_hist_percentile_all_null_group_and_reserved_names(spark):
    """Groups whose values are all NULL stay in the output with NULL
    percentiles and n=0 (percentile() group semantics); reserved
    internal/output column names are refused loudly."""
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", None), ("b", None), ("c", None), ("c", 7.0)],
        ["grp", "val"],
    )
    rows = {
        r["grp"]: r
        for r in grouped_percentile_hist(df, ["grp"], "val", [0.5]).collect()
    }
    assert set(rows) == {"a", "b", "c"}
    assert rows["a"]["p50"] == 2.0 and rows["a"]["n"] == 2
    assert rows["b"]["p50"] is None and rows["b"]["n"] == 0
    assert rows["c"]["p50"] == 7.0 and rows["c"]["n"] == 1  # mixed NULLs excluded

    import pytest as _pytest

    with _pytest.raises(ValueError, match="reserved"):
        grouped_percentile_hist(df.withColumnRenamed("grp", "n"), ["n"], "val", [0.5])
    with _pytest.raises(ValueError, match="output label"):
        grouped_percentile_hist(df.withColumnRenamed("grp", "p50"), ["p50"], "val", [0.5])
