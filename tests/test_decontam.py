"""Benchmark decontamination: hand-computed n-gram overlap cases."""


def test_contamination_report_and_filter(spark):
    from ds2_spark.operators.decontam import (
        contamination_report,
        decontaminate,
    )

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over")], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [
            # contains both benchmark 5-grams, case-insensitively
            (1, "intro text THE QUICK Brown fox jumps over and more"),
            # shares only a 4-word run — below n, clean
            (2, "the quick brown fox sleeps all day long here"),
            (3, "completely unrelated content with many different words"),
            (4, "short doc"),  # < n words: no grams at all
        ],
        "doc_id long, text string",
    )

    rows = {
        r["doc_id"]: r["n_hits"]
        for r in contamination_report(docs, bench, n=5).collect()
    }
    assert rows == {1: 2}  # 'the quick brown fox jumps' + 'quick ... over'

    kept = sorted(
        r["doc_id"] for r in decontaminate(docs, bench, n=5).collect()
    )
    assert kept == [2, 3, 4]


def test_repeated_gram_counts_once(spark):
    """n_hits counts DISTINCT shared grams: a doc repeating the same
    benchmark 5-gram three times scores 1, not 3."""
    from ds2_spark.operators.decontam import contamination_report

    bench = spark.createDataFrame(
        [(9, "a b c d e")], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [(1, "a b c d e x a b c d e y a b c d e")],
        "doc_id long, text string",
    )
    rows = contamination_report(docs, bench, n=5).collect()
    assert len(rows) == 1 and rows[0]["n_hits"] == 1
