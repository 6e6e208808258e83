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


def test_bloom_report_is_superset_with_false_positives(spark):
    """Bloom decontamination vs the exact report on the same corpus:
    every exactly-contaminated doc is flagged (no false negatives —
    the property that makes bloom safe for decontamination), and with
    a deliberately tiny filter false positives DO occur (otherwise the
    test degenerates to exact equality and proves nothing about the
    bloom path). Also: n_flagged_grams >= n_hits per common doc."""
    from ds2_spark.operators.decontam import (
        bloom_contamination_report,
        contamination_report,
    )

    # per-doc-unique words: the ONLY exact contaminations are the
    # bench docs matching themselves, leaving 109 clean docs for the
    # bloom to false-positive on (measured: m=4096 -> 23 FP docs)
    rows = [(i, " ".join(f"d{i}w{j}" for j in range(30)))
            for i in range(120)]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    bench = docs.filter("doc_id % 11 = 0")

    exact = {r["doc_id"]: r["n_hits"]
             for r in contamination_report(docs, bench, n=5).collect()}
    bloom = {r["doc_id"]: r["n_flagged_grams"]
             for r in bloom_contamination_report(
                 docs, bench, n=5, k=3, m_bits=4096).collect()}

    assert set(exact) <= set(bloom), "bloom lost a true contamination"
    for d, h in exact.items():
        assert bloom[d] >= h, (d, h, bloom[d])
    fps = set(bloom) - set(exact)
    assert fps, "no false positives — filter not actually exercised"

    # a roomy filter on the same corpus: still a superset, fewer FPs
    roomy = {r["doc_id"]: r["n_flagged_grams"]
             for r in bloom_contamination_report(
                 docs, bench, n=5, k=3, m_bits=1 << 20).collect()}
    assert set(exact) <= set(roomy)
    assert len(set(roomy) - set(exact)) <= len(fps)
