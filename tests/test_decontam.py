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


def test_containment_asymmetry(spark):
    """A short doc fully quoted inside a long doc: containment(A in B)
    is 1.0 while containment(B in A) is small — exactly the case
    symmetric Jaccard signatures miss."""
    from ds2_spark.operators.decontam import containment_pairs

    quote = " ".join(f"q{i}" for i in range(10))
    filler = " ".join(f"f{i}" for i in range(60))
    docs = spark.createDataFrame(
        [
            (1, quote),                       # 6 distinct 5-grams
            (2, filler + " " + quote),        # contains all of doc 1
            (3, "totally different words here repeated words here"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in containment_pairs(docs, n=5, threshold=0.5).collect()
    }
    assert got[(1, 2)] == 1.0         # doc 1 fully contained in doc 2
    assert (2, 1) not in got          # 6/67 grams — far below threshold
    assert all(3 not in pair for pair in got)


def test_containment_hot_bucket_cap(spark):
    """A gram shared by more docs than max_bucket identifies nothing:
    with the cap at 2, three docs sharing one gram produce no pairs."""
    from ds2_spark.operators.decontam import containment_pairs

    same = "a b c d e"
    docs = spark.createDataFrame(
        [(i, same) for i in range(3)], "doc_id long, text string"
    )
    assert containment_pairs(docs, n=5, threshold=0.5, max_bucket=2).count() == 0
    # raise the cap and every ordered pair appears at containment 1.0
    rows = containment_pairs(docs, n=5, threshold=0.5, max_bucket=3).collect()
    assert {(r["id_a"], r["id_b"]) for r in rows} == {
        (a, b) for a in range(3) for b in range(3) if a != b
    }
    assert all(r["containment"] == 1.0 for r in rows)
