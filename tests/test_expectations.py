"""Data-contract validation (operators/expectations.check_contract).

Oracle model: hand-countable synthetic frames (every violation planted
on purpose) plus a pure-pandas replay; the q_expectations contract
query pins the DuckDB parity on real TPC-H data. Also pins the plan
property the docstring claims (ONE aggregate pass / one scan) and the
refusal cases.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from ds2_spark.operators.expectations import (
    check_contract,
    rule_in_set,
    rule_not_null,
    rule_range,
    rule_rlike,
    violating_rows,
)

ROWS = [
    (1, "a", 5),
    (2, "b", 50),   # v out of range
    (2, "c", None),  # dup k; NULL v passes range
    (None, "a", 7),  # NULL k
    (4, "zz", 8),   # cat out of domain + format
    (4, "a", -1),   # dup k again; v out of range
]


def _df(spark):
    return spark.createDataFrame(ROWS, "k int, cat string, v int")


def _report(spark):
    out = check_contract(
        _df(spark),
        rules=[
            rule_not_null("k_not_null", "k"),
            rule_range("v_in_1_30", "v", 1, 30),
            rule_in_set("cat_domain", "cat", ["a", "b", "c"]),
            rule_rlike("cat_format", "cat", "^[a-c]$"),
        ],
        unique=["k"],
    )
    return {r["rule"]: r for r in out.collect()}


def test_counts_match_hand_derivation(spark):
    got = _report(spark)
    # pandas replay, independent of the Spark mechanics
    pdf = pd.DataFrame(ROWS, columns=["k", "cat", "v"])
    assert got["k_not_null"]["violations"] == int(pdf["k"].isna().sum()) == 1
    assert got["v_in_1_30"]["violations"] == int(((pdf["v"] < 1) | (pdf["v"] > 30)).sum()) == 2
    assert got["cat_domain"]["violations"] == int((~pdf["cat"].isin(["a", "b", "c"])).sum()) == 1
    assert got["cat_format"]["violations"] == 1
    nn = pdf["k"].dropna()
    assert got["unique:k"]["violations"] == len(nn) - nn.nunique() == 2
    for r in got.values():
        assert r["n_rows"] == len(ROWS)
        assert r["pass"] == (r["violations"] == 0)


def test_all_pass_on_clean_frame(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k int, cat string")
    out = check_contract(
        df,
        rules=[rule_not_null("k_not_null", "k")],
        unique=["k"],
    ).collect()
    assert all(r["violations"] == 0 and r["pass"] for r in out)


def test_single_scan_plan(spark):
    # the docstring's scale claim: all rules ride ONE aggregate —
    # exactly one scan of the input in the physical plan
    out = check_contract(
        _df(spark),
        rules=[
            rule_not_null("k_not_null", "k"),
            rule_range("v_in_1_30", "v", 1, 30),
        ],
        unique=["k"],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") + plan.count("Scan parquet") == 1


def test_null_ok_false_variants(spark):
    df = spark.createDataFrame([(None,), (5,)], "v int")
    strict = check_contract(df, rules=[rule_range("r", "v", 1, 30, null_ok=False)])
    assert strict.collect()[0]["violations"] == 1
    lax = check_contract(df, rules=[rule_range("r", "v", 1, 30)])
    assert lax.collect()[0]["violations"] == 0


def test_violating_rows_bounded(spark):
    rule = rule_range("v_in_1_30", "v", 1, 30)
    rows = violating_rows(_df(spark), rule, limit=1).collect()
    assert len(rows) == 1
    assert rows[0]["v"] in (50, -1)


def test_refusals(spark):
    with pytest.raises(ValueError, match="no rules"):
        check_contract(_df(spark))
    with pytest.raises(ValueError, match="duplicate rule names"):
        check_contract(
            _df(spark),
            rules=[rule_not_null("x", "k"), rule_not_null("x", "v")],
        )


def test_approx_mode_runs(spark):
    out = check_contract(_df(spark), unique=["k"], approx=True).collect()
    # HLL on 3 distinct values is exact in practice; the contract here
    # is only that the mode runs and keeps the schema
    assert out[0]["rule"] == "unique:k"
    assert out[0]["violations"] >= 0


def test_empty_batch_reports_zero_not_null(spark):
    # sum() over zero rows is NULL in Spark; a NULL violations/pass row
    # is neither accepted nor refused by a `NOT pass` gate filter
    df = spark.createDataFrame([], "k int, v int")
    out = check_contract(
        df,
        rules=[rule_not_null("k_not_null", "k")],
        unique=["k"],
    ).collect()
    by_rule = {r["rule"]: r for r in out}
    for name in ("k_not_null", "unique:k"):
        assert by_rule[name]["violations"] == 0, name
        assert by_rule[name]["pass"] is True, name
        assert by_rule[name]["n_rows"] == 0, name


def test_unique_violations_never_negative(spark):
    # approx_count_distinct may overestimate above the non-null count;
    # the unique rule clamps at 0 instead of reporting negative
    # duplicates / spurious pass=False
    df = spark.createDataFrame([(i,) for i in range(5000)], "k int")
    out = check_contract(df, unique=["k"], approx=True).collect()
    assert out[0]["violations"] >= 0
    exact = check_contract(df, unique=["k"]).collect()
    assert exact[0]["violations"] == 0 and exact[0]["pass"] is True


def test_duplicate_unique_rule_name_refused(spark):
    with pytest.raises(ValueError, match="duplicate rule names"):
        check_contract(_df(spark), unique=["k", "k"])
    with pytest.raises(ValueError, match="duplicate rule names"):
        check_contract(
            _df(spark),
            rules=[("unique:k", F.col("k").isNull())],
            unique=["k"],
        )
