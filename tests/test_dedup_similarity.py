import numpy as np
import pytest
from pyspark.sql import functions as F

from ds2_spark.operators.dedup import (
    exact_duplicates,
    hamming_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash64,
    simhash_banded_pairs,
)
from ds2_spark.operators.similarity import (
    brute_force_topk,
    cosine_neardup_pairs,
    lsh_topk,
)


@pytest.fixture(scope="module")
def docs(spark):
    base = [
        (0, "the quick brown fox jumps over the lazy dog near the river bank"),
        (1, "a completely different document about spark query optimization"),
        (2, "the quick brown fox jumps over the lazy dog near the river bank"),  # exact dup of 0
        (3, "the quick brown fox leaps over the lazy dog near the river bank"),  # near dup of 0
        (4, "columnar execution engines vectorize expression evaluation"),
        (5, "THE  QUICK brown fox jumps over the lazy dog near the river bank"),  # case/ws dup of 0
        (6, "unrelated short text"),
    ]
    return spark.createDataFrame(base, ["doc_id", "text"])


def test_exact_dedup_finds_planted(spark, docs):
    out = {r["doc_id"]: (r["canonical_id"], r["is_duplicate"])
           for r in exact_duplicates(docs).collect()}
    assert out[2] == (0, True)
    assert out[5] == (0, True)  # case/whitespace normalized
    assert out[0] == (0, False)
    assert not out[1][1] and not out[3][1]


def test_minhash_lsh_finds_near_dups(spark, docs):
    sigs = minhash_signatures(docs, n_hashes=16, k=5)
    pairs = lsh_candidate_pairs(sigs, n_hashes=16, bands=8)
    jac = ngram_jaccard_pairs(docs, pairs, k=5)
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in jac.collect()}
    assert got.get((0, 2)) == 1.0
    assert got.get((0, 5)) == 1.0
    assert (0, 3) in got and got[(0, 3)] > 0.6  # near dup caught
    assert (1, 4) not in got  # unrelated never pairs


def test_simhash_hamming(spark, docs):
    sig = simhash64(docs)
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in hamming_pairs(sig, max_dist=6).collect()}
    assert pairs.get((0, 2)) == 0
    assert pairs.get((0, 5)) == 0
    assert (0, 3) in pairs  # one-token change -> small distance
    assert (1, 4) not in pairs


def test_simhash_banded_equals_crossjoin(spark, docs):
    """The pigeonhole-banded scale path must return EXACTLY the pairs
    the all-pairs verification finds — banding only prunes candidates
    that cannot be within max_dist, never true positives."""
    sig = simhash64(docs)
    for d in (0, 3, 6):
        brute = {(r["id_a"], r["id_b"]): r["hamming"]
                 for r in hamming_pairs(sig, max_dist=d).collect()}
        banded = {(r["id_a"], r["id_b"]): r["hamming"]
                  for r in simhash_banded_pairs(sig, max_dist=d).collect()}
        assert banded == brute, (d, banded, brute)


def test_ann_lsh_recall_vs_brute_force(spark):
    rng = np.random.default_rng(11)
    n, dim, k = 300, 32, 5
    base = rng.normal(0, 1, size=(n, dim)).astype(np.float32)
    rows = [(int(i), base[i].tolist()) for i in range(n)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    cand = emb.filter(F.col("vec_id") >= 10).select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv")
    )
    exact = brute_force_topk(q, cand, k=k)
    approx = lsh_topk(q, cand, dim=dim, k=k, n_planes=4, n_tables=8)
    ex = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    ap = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.5, recall  # multiprobe LSH on random gaussians


def test_cosine_neardup_symmetric_threshold(spark):
    v = [1.0, 0.0, 0.0]
    rows = [(0, v), (1, [0.999, 0.01, 0.0]), (2, [0.0, 1.0, 0.0])]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    pairs = {(r["id_a"], r["id_b"]) for r in cosine_neardup_pairs(emb, 0.95).collect()}
    assert pairs == {(0, 1)}
