"""Distributed LM training (operators/lm.py) vs independent oracles."""

import numpy as np
import pytest

from ds2_spark.functions.textkernels import PPL_BUCKETS, perplexities, ppl_model


def test_distributed_counts_reproduce_fixture_model(spark):
    """train_trigram_counts on the exact corpus ppl_model() was built
    from must reproduce its dense arrays EXACTLY — the distributed
    groupBy-sum and the driver's np.add.at loop are integer counts of
    the same salted window hashes, so equality is bit-level, and
    scoring with the trained model is then bit-identical too."""
    from ds2_spark.functions.corpus import LANGS, training_text
    from ds2_spark.operators.lm import train_lm

    rows = [(s,) for lang in LANGS for s in training_text(lang)]
    docs = spark.createDataFrame(rows, "text string").repartition(7)
    cnt3, cnt2, d = train_lm(docs, "text")
    ref3, ref2, refd = ppl_model()
    assert d == refd
    assert np.array_equal(cnt3, ref3)
    assert np.array_equal(cnt2, ref2)

    probe = [
        "the quick brown fox jumps over the lazy dog",
        "zzzzqqqq off-corpus bytes ééé",
        "",
        None,
        "ab",  # <3 bytes -> sentinel
    ]
    got = perplexities(probe, model=(cnt3, cnt2, d))
    want = perplexities(probe)
    assert np.array_equal(got, want)


def test_trained_model_scores_off_corpus_higher(spark):
    """An LM trained on English-looking text must assign lower
    perplexity to held-out English-looking text than to byte noise."""
    from ds2_spark.operators.lm import train_lm

    rng = np.random.default_rng(7)
    words = ["the", "voice", "clip", "was", "recorded", "in", "a", "studio"]
    train = [
        (" ".join(rng.choice(words, size=12).tolist()),) for _ in range(400)
    ]
    docs = spark.createDataFrame(train, "text string")
    model = train_lm(docs, "text", buckets=1 << 14)
    heldout = " ".join(rng.choice(words, size=12).tolist())
    noise = "qxjzv wkpgy bmfdh qxjzv"
    ppl = perplexities([heldout, noise], model=model)
    assert ppl[0] < ppl[1]


def test_empty_model_refused(spark):
    """Zero trigram mass must refuse loudly, never score 0/0 -> NaN."""
    from ds2_spark.operators.lm import train_lm

    docs = spark.createDataFrame([("ab",), (None,), ("",)], "text string")
    with pytest.raises(ValueError, match="zero trigrams"):
        train_lm(docs, "text", buckets=256)
    zero = (np.zeros(256), np.zeros(256), 0.75)
    with pytest.raises(ValueError, match="zero trigram mass"):
        perplexities(["hello world text"], model=zero)


def test_counts_to_model_refuses_wrong_buckets(spark):
    from ds2_spark.operators.lm import counts_to_model, train_trigram_counts

    docs = spark.createDataFrame([("abcdef",), ("ghijkl",)], "text string")
    counts = train_trigram_counts(docs, "text", buckets=1 << 10)
    with pytest.raises(ValueError, match="bucket"):
        # collecting 2^10-space counts into a 4-bucket model must refuse
        counts_to_model(counts, buckets=4)


def _kn_oracle(texts, discount):
    """Pure-Python interpolated KN over word trigrams. Tokenizes with
    the explicit ASCII class the engine and DuckDB twin use — NOT
    str.split(), which adds unicode whitespace (e.g. \\xa0) that
    neither regex engine splits on."""
    import re
    from collections import Counter

    c3 = Counter()
    for t in texts:
        toks = [w for w in re.split(r"[ \t\n\x0b\f\r]+", t or "") if w]
        for i in range(len(toks) - 2):
            c3[(toks[i], toks[i + 1], toks[i + 2])] += 1
    ctx_total = Counter()
    ctx_cont = Counter()
    w3_cont = Counter()
    for (w1, w2, w3), n in c3.items():
        ctx_total[(w1, w2)] += n
        ctx_cont[(w1, w2)] += 1
        w3_cont[w3] += 1
    n_types = len(c3)
    out = {}
    for (w1, w2, w3), n in c3.items():
        c2 = ctx_total[(w1, w2)]
        p = max(n - discount, 0.0) / c2 + (
            discount * ctx_cont[(w1, w2)] / c2
        ) * (w3_cont[w3] / n_types)
        out[(w1, w2, w3)] = (n, round(p, 6))
    return out


def test_kn_word_trigrams_matches_pure_python(spark):
    from ds2_spark.operators.lm import kn_word_trigrams

    texts = [
        "a b c a b d",
        "a b c x",
        "  a   b   c ",  # runs of whitespace collapse
        "short one",  # <3 tokens: no trigrams
        None,
        "x a b c",
        "a\x0bb\tc\nd",  # \x0b IS a separator (explicit class)
        "p\xa0q r s t",  # \xa0 is NOT: 'p\xa0q' stays one token
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r["w1"], r["w2"], r["w3"]): (r["c3"], r["p_kn"])
        for r in kn_word_trigrams(docs, discount=0.75, top_n=1000).collect()
    }
    want = _kn_oracle(texts, 0.75)
    assert got == want
    # probability sanity: every interpolated-KN prob is in (0, 1]
    assert all(0.0 < p <= 1.0 for _, p in got.values())
    # 'a b c' appears in 5 docs (incl. the \x0b-separated one) -> the
    # highest-count trigram
    assert got[("a", "b", "c")][0] == 5


def test_pipeline_stage_with_trained_model_bit_identical(spark):
    """transcript_features(ppl_model_bc=...) with an LM trained
    distributively on the SAME corpus ppl_model() was built from must
    emit bit-identical ppl for every clip — the production 'train on
    a trusted slice, score the corpus' hookup end to end, broadcast
    included."""
    from ds2_spark.functions.corpus import LANGS, training_text
    from ds2_spark.operators.lm import train_lm
    from ds2_spark.plans.pipeline import transcript_features

    corpus = spark.createDataFrame(
        [(s,) for lang in LANGS for s in training_text(lang)], "text string"
    )
    model = train_lm(corpus, "text")
    bc = spark.sparkContext.broadcast(model)

    clips = spark.createDataFrame(
        [
            ("c0", "the quick brown fox", "pcm16", 1000),
            ("c1", "zzz qqq off corpus ยาว", "pcm16", 1000),
            ("c2", None, "pcm16", 1000),
            ("c3", "", "pcm16", 1000),
        ],
        "clip_id string, transcript string, codec string, dur_ms int",
    )
    default = {
        r["clip_id"]: r["ppl"]
        for r in transcript_features(clips).select("clip_id", "ppl").collect()
    }
    trained = {
        r["clip_id"]: r["ppl"]
        for r in transcript_features(clips, ppl_model_bc=bc)
        .select("clip_id", "ppl")
        .collect()
    }
    assert trained == default  # exact float equality, not approx
    bc.unpersist()


def test_kn_top_n_order_is_deterministic(spark):
    from ds2_spark.operators.lm import kn_word_trigrams

    docs = spark.createDataFrame(
        [(i, "t u v " * 5) for i in range(20)], "doc_id long, text string"
    )
    a = [tuple(r) for r in kn_word_trigrams(docs, top_n=5).collect()]
    b = [tuple(r) for r in kn_word_trigrams(docs.repartition(13), top_n=5).collect()]
    assert a == b
