"""Capstone composition: every stage of q_corpus_build must fire
non-vacuously and the assembled ladder must be internally consistent
(NOTES #45 — a green hash over vacuous stages proves nothing)."""

import pytest

from ds2_spark import queries_catalog


@pytest.fixture(scope="module")
def built(spark):
    return queries_catalog.q_corpus_build(
        spark, "/root/testdata/sf0.001"
    ).collect()


def test_every_stage_fires(built):
    reasons = {}
    for r in built:
        reasons[r["drop_reason"]] = reasons.get(r["drop_reason"], 0) + 1
    for expected in (
        "benchmark", "empty_after_scrub", "exact_dup",
        "contaminated", "not_sampled", "",
    ):
        assert reasons.get(expected, 0) > 0, (expected, reasons)


def test_ladder_consistency(built):
    for r in built:
        kept = r["kept"]
        reason = r["drop_reason"]
        assert kept == (1 if reason == "" else 0)
        if reason in ("benchmark", "empty_after_scrub", "exact_dup",
                      "contaminated"):
            # dropped before tokenization
            assert r["n_tokens"] is None, r
        else:
            # reached stage 4: tokenized
            assert r["n_tokens"] is not None and r["n_tokens"] > 0, r


def test_kept_token_mass_near_budget(built):
    kept_tokens = sum(r["n_tokens"] for r in built if r["kept"] == 1)
    # md5-bucket sampling is binomial around the planned expectation;
    # the plan itself targets 40k
    assert 0.7 * 40_000 < kept_tokens < 1.3 * 40_000, kept_tokens
