import numpy as np
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from ds2_spark.functions import textkernels as tk
from ds2_spark.functions.text import (
    embed_udf,
    fingerprint_col,
    langid_udf,
    ppl_udf,
    token_count_col,
    with_quality_features,
)


def _texts(fixture_paths):
    tbl = pq.read_table(fixture_paths["clips"], columns=["clip_id", "transcript"])
    return tbl.column("clip_id").to_pylist(), tbl.column("transcript").to_pylist()


def test_langid_udf_matches_kernel(spark, clips_df, fixture_paths):
    ids, texts = _texts(fixture_paths)
    idx, margin, _ = tk.langid_scores([t or "" for t in texts])
    _, langs = tk.langid_model()
    expected = {i: langs[j] for i, j in zip(ids, idx)}
    rows = clips_df.select("clip_id", langid_udf("transcript").alias("l")).collect()
    got = {r["clip_id"]: r["l"]["lang"] for r in rows}
    assert got == expected
    got_m = {r["clip_id"]: r["l"]["lang_margin"] for r in rows}
    exp_m = dict(zip(ids, margin))
    for k in got_m:
        assert abs(got_m[k] - exp_m[k]) < 1e-9


def test_langid_accuracy_vs_truth(spark, clips_df, fixture_paths):
    truth = pq.read_table(fixture_paths["truth"]).to_pandas().set_index("clip_id")
    rows = clips_df.select("clip_id", langid_udf("transcript").alias("l")).collect()
    ok = total = 0
    for r in rows:
        t = truth.loc[r["clip_id"]]
        if t.is_empty or t.is_gibberish:
            continue
        total += 1
        ok += r["l"]["lang"] == t.lang_true
    assert ok / total > 0.95


def test_ppl_udf_matches_kernel_and_separates(spark, clips_df, fixture_paths):
    ids, texts = _texts(fixture_paths)
    expected = dict(zip(ids, tk.perplexities([t or "" for t in texts])))
    got = dict(clips_df.select("clip_id", ppl_udf("transcript").alias("p")).collect())
    for k in got:
        assert abs(got[k] - expected[k]) < 1e-9
    truth = pq.read_table(fixture_paths["truth"]).to_pandas().set_index("clip_id")
    gib = [got[i] for i in truth.index[truth.is_gibberish]]
    norm = [got[i] for i in truth.index[~(truth.is_gibberish | truth.is_empty)]]
    if gib:
        assert np.median(gib) > 10 * np.median(norm)


def test_embed_udf_matches_kernel(spark, clips_df, fixture_paths):
    ids, texts = _texts(fixture_paths)
    expected = tk.embed_texts([t or "" for t in texts], dim=32)
    rows = clips_df.select("clip_id", embed_udf(32)("transcript").alias("e")).collect()
    got = {r["clip_id"]: np.array(r["e"], dtype=np.float32) for r in rows}
    for i, k in enumerate(ids):
        assert np.array_equal(got[k], expected[i])
    # normalized
    norms = np.linalg.norm(expected, axis=1)
    nz = norms > 0
    assert np.allclose(norms[nz], 1.0, atol=1e-5)


def test_quality_features_match_numpy(spark, clips_df, fixture_paths):
    ids, texts = _texts(fixture_paths)
    stats = tk.quality_stats([t or "" for t in texts])
    rows = with_quality_features(clips_df.select("clip_id", "transcript")).select(
        "clip_id", "n_chars", "n_tokens", "digit_ratio"
    ).collect()
    exp_chars = dict(zip(ids, [len((t or "").strip()) for t in texts]))
    exp_tokens = dict(zip(ids, stats["n_tokens"]))
    exp_digit = dict(zip(ids, stats["digit_ratio"]))
    for r in rows:
        assert r["n_chars"] == exp_chars[r["clip_id"]]
        assert r["n_tokens"] == exp_tokens[r["clip_id"]]
        assert abs(r["digit_ratio"] - exp_digit[r["clip_id"]]) < 1e-9


def test_fingerprint_and_token_count(spark):
    df = spark.createDataFrame(
        [("a", "Hello  World"), ("b", "hello world"), ("c", "different")],
        ["clip_id", "transcript"],
    )
    rows = df.select(
        "clip_id",
        fingerprint_col("transcript").alias("fp"),
        token_count_col("transcript").alias("tc"),
    ).collect()
    by = {r["clip_id"]: r for r in rows}
    assert by["a"]["fp"] == by["b"]["fp"]  # case/whitespace-insensitive dup key
    assert by["a"]["fp"] != by["c"]["fp"]
    assert by["a"]["tc"] == 2


def test_repetition_features_hand_computed(spark):
    """Literal expectations computed by hand (module docstring
    semantics), including the short-doc / empty-doc / whitespace-only
    edge cases and the Spark sequence(1, n<1) descent trap."""
    from ds2_spark.operators.repetition import repetition_features

    docs = spark.createDataFrame(
        [
            # 3 lines, 'aa bb' twice: dlf 1/3, dcf (1*5)/(2*5+2)=5/12,
            # words [aa,bb,aa,bb,cc] -> top gram 'aa bb' cnt 2 len 5,
            # text_len 14 -> 10/14; dlf>0.3 -> drop
            (1, "aa bb\naa bb\ncc"),
            # 12 distinct words, one line: all-distinct grams len 5,
            # top 5/35; keep
            (2, " ".join(f"q{i:x}" for i in range(12))),
            (3, ""),  # no lines, no grams -> zeros, keep
            (4, "  hello  "),  # 1 line after trim, no grams, keep
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_features(docs).collect()}

    r1 = rows[1]
    assert r1["n_lines"] == 3
    assert abs(r1["dup_line_frac"] - 1 / 3) < 1e-12
    assert abs(r1["dup_line_char_frac"] - 5 / 12) < 1e-12
    assert abs(r1["top_2gram_char_frac"] - 10 / 14) < 1e-12
    assert r1["rep_keep"] == 0

    r2 = rows[2]
    assert r2["n_lines"] == 1
    assert r2["dup_line_frac"] == 0.0
    assert abs(r2["top_2gram_char_frac"] - 5 / 35) < 1e-12
    assert r2["rep_keep"] == 1

    for d in (3, 4):
        r = rows[d]
        assert (
            r["dup_line_frac"],
            r["dup_line_char_frac"],
            r["top_2gram_char_frac"],
            r["rep_keep"],
        ) == (0.0, 0.0, 0.0, 1)
    assert rows[3]["n_lines"] == 0
    assert rows[4]["n_lines"] == 1


def test_tfidf_top_terms_hand_computed(spark):
    """Smoothed TF-IDF against hand-derived values (N=3, ln-based,
    6-dp rounding) with deterministic tie-breaks."""
    import math

    from ds2_spark.operators.tfidf import tfidf_top_terms

    docs = spark.createDataFrame(
        [
            (1, "apple banana APPLE"),
            (2, "banana cherry"),
            (3, "durian durian durian"),
        ],
        "doc_id long, text string",
    )
    rows = {
        (r["doc_id"], r["rank"]): (r["term"], r["tf"], r["df"], r["score"])
        for r in tfidf_top_terms(docs, k=2).collect()
    }
    idf1 = math.log(4 / 2) + 1  # df=1
    idf2 = math.log(4 / 3) + 1  # df=2
    assert rows[(1, 1)] == ("apple", 2, 1, round(2 * idf1, 6))
    assert rows[(1, 2)] == ("banana", 1, 2, round(idf2, 6))
    assert rows[(2, 1)] == ("cherry", 1, 1, round(idf1, 6))
    assert rows[(2, 2)] == ("banana", 1, 2, round(idf2, 6))
    assert rows[(3, 1)] == ("durian", 3, 1, round(3 * idf1, 6))
    assert (3, 2) not in rows  # single-term doc has one ranked row


def test_text_operators_tolerate_null_text(spark):
    """NULL transcripts exist in real corpora: every text operator
    must degrade to 'no content' semantics, never throw."""
    from ds2_spark.operators.decontam import (
        contamination_report,
        decontaminate,
    )
    from ds2_spark.operators.repetition import repetition_features
    from ds2_spark.operators.tfidf import tfidf_top_terms

    docs = spark.createDataFrame(
        [(1, None), (2, "a b c d e f")], "doc_id long, text string"
    )
    rep = {r["doc_id"]: r for r in repetition_features(docs).collect()}
    assert rep[1]["n_lines"] == 0 and rep[1]["rep_keep"] == 1

    bench = spark.createDataFrame([(9, "a b c d e")], "doc_id long, text string")
    assert [r["doc_id"] for r in contamination_report(docs, bench, n=5).collect()] == [2]
    assert sorted(r["doc_id"] for r in decontaminate(docs, bench, n=5).collect()) == [1]

    tf = tfidf_top_terms(docs, k=2).collect()
    assert {r["doc_id"] for r in tf} == {2}  # null doc has no terms
    # N counts the null-text doc: idf = ln((2+1)/(1+1)) + 1
    import math
    assert tf[0]["score"] == round(math.log(3 / 2) + 1, 6)


def test_char_entropy_and_compression_ratio(spark):
    """Entropy against closed-form values (uniform k-symbol text has
    exactly log2(k) bits); compression ratio against direct zlib."""
    import zlib

    from ds2_spark.functions.entropy import (
        char_entropy,
        compression_ratio_udf,
    )

    docs = spark.createDataFrame(
        [
            (1, "aaaa"),        # 0 bits
            (2, "abab"),        # 1 bit
            (3, "abcd"),        # 2 bits
            (4, None),
            (5, ""),
            (6, "aab"),         # -2/3*log2(2/3) - 1/3*log2(1/3)
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in char_entropy(docs).collect()}
    assert (rows[1]["n_chars"], rows[1]["entropy_bits"]) == (4, 0.0)
    assert (rows[2]["n_chars"], rows[2]["entropy_bits"]) == (4, 1.0)
    assert (rows[3]["n_chars"], rows[3]["entropy_bits"]) == (4, 2.0)
    for d in (4, 5):
        assert (rows[d]["n_chars"], rows[d]["entropy_bits"]) == (0, 0.0)
    import math
    exp6 = round(-(2 / 3) * math.log2(2 / 3) - (1 / 3) * math.log2(1 / 3), 6)
    assert rows[6]["entropy_bits"] == exp6

    texts = ["x" * 5000, "the quick brown fox jumps over the lazy dog", "", None]
    out = (
        spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "i long, text string"
        )
        .select("i", compression_ratio_udf("text").alias("r"))
        .collect()
    )
    got = {r["i"]: r["r"] for r in out}
    for i, t in enumerate(texts):
        if not t:
            assert got[i] == 1.0
        else:
            raw = t.encode()
            assert got[i] == len(zlib.compress(raw, 6)) / len(raw)
    assert got[0] < 0.01  # pure repetition crushes
    assert got[1] > 0.8   # short natural text barely compresses


def test_bm25_topk_hand_computed(spark):
    """BM25 against an independent Python recomputation on a 4-doc
    corpus, plus ranking and absent-term behavior."""
    import math

    from ds2_spark.operators.tfidf import bm25_topk

    corpus = {
        1: "cat sat on the mat",
        2: "cat cat cat",
        3: "dog sat",
        4: "unrelated words entirely here",
    }
    docs = spark.createDataFrame(
        list(corpus.items()), "doc_id long, text string"
    )
    qs = spark.createDataFrame(
        [("qa", "cat sat"), ("qb", "zebra")],
        "query_id string, query_text string",
    )
    got = {
        (r["query_id"], r["doc_id"]): (r["score"], r["rank"])
        for r in bm25_topk(docs, qs, k=3).collect()
    }

    toks = {d: t.split() for d, t in corpus.items()}
    n = len(corpus)
    avgdl = sum(len(t) for t in toks.values()) / n
    df = {}
    for t in toks.values():
        for w in set(t):
            df[w] = df.get(w, 0) + 1

    def bm25(q, d, k1=1.2, b=0.75):
        s = 0.0
        for w in set(q.split()):
            tf = toks[d].count(w)
            if not tf:
                continue
            idf = math.log((n - df[w] + 0.5) / (df[w] + 0.5) + 1.0)
            s += idf * tf / (tf + k1 * (1 - b + b * len(toks[d]) / avgdl))
        return round(s, 6)

    exp_scores = {d: bm25("cat sat", d) for d in corpus if bm25("cat sat", d) > 0}
    order = sorted(exp_scores, key=lambda d: (-exp_scores[d], d))
    exp = {
        ("qa", d): (exp_scores[d], i + 1) for i, d in enumerate(order[:3])
    }
    assert got == exp  # zebra matches nothing; doc 4 never appears


def test_nfc_udf_normalizes_and_passes_null(spark):
    """NFC: decomposed sequences compose, NFC/ASCII input round-trips
    unchanged, NULL passes through, and the op is idempotent."""
    from pyspark.sql import functions as F

    from ds2_spark.functions.text import nfc_udf

    rows = [
        ("cafe\u0301",),  # e + combining acute -> \u00e9
        ("A\u030Angstro\u0308m",),  # decomposed A-ring and o-umlaut
        ("ni\u00f1o",),  # already NFC
        ("plain",),
        (None,),
        ("",),
    ]
    df = spark.createDataFrame(rows, "t string").withColumn(
        "n", nfc_udf(F.col("t"))
    )
    got = [r["n"] for r in df.collect()]
    assert got == ["caf\u00e9", "\u00c5ngstr\u00f6m", "ni\u00f1o", "plain", None, ""]
    # idempotent: normalizing the normalized column changes nothing
    again = [
        r["n2"] for r in df.withColumn("n2", nfc_udf(F.col("n"))).collect()
    ]
    assert again == got


def test_tokenization_parity_on_hostile_text(spark):
    """Spark vs DuckDB n_tokens / n_tokens_bpe / space_ratio parity on
    inputs that historically diverged across regex engines (NOTES #76):
    \\x0b (in Java's \\s, not RE2's), \\xa0 (Unicode WS — in neither
    explicit class), trailing punctuation / whitespace (Java split drops
    trailing empties, DuckDB keeps them), Unicode punctuation (\\p{P}
    matches, POSIX [:punct:] doesn't), and Eastern-Arabic digits
    (Python isdigit() true, [0-9] false)."""
    import duckdb

    texts = [
        ("t01", "Hello world."),            # trailing ASCII punct
        ("t02", "foo\x0bbar"),              # vertical tab
        ("t03", "foo\xa0bar"),              # NBSP: a non-token-break in all engines
        ("t04", "\tleading tab"),
        ("t05", "trailing tab\t"),
        ("t06", "«quoted» — dash…"),        # Unicode punct only
        ("t07", "٣٤ eastern digits"),
        ("t08", "  spaces  only-trim  "),
        ("t09", ""),
        ("t10", None),
        ("t11", "end with space "),
        ("t12", "a.b,c;d!e?f"),
        ("t13", ".lead punct"),
    ]
    df = spark.createDataFrame(texts, ["doc_id", "transcript"])
    got = {
        r["doc_id"]: r
        for r in with_quality_features(df)
        .withColumn("n_tokens_bpe", token_count_col("transcript"))
        .select("doc_id", "n_tokens", "n_tokens_bpe",
                F.round("space_ratio", 6).alias("space_ratio"),
                F.round("digit_ratio", 6).alias("digit_ratio"))
        .collect()
    }

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs(doc_id VARCHAR, text VARCHAR)"
    )
    con.executemany("INSERT INTO docs VALUES (?, ?)", texts)
    exp = con.execute(
        r"""
        WITH t AS (
          SELECT doc_id, coalesce(text, '') AS tx,
                 trim(coalesce(text, '')) AS tr
          FROM docs)
        SELECT doc_id,
               len(list_filter(regexp_split_to_array(tr, '[ \t\n\x0b\f\r]+'),
                               x -> x <> '')) AS n_tokens,
               len(list_filter(regexp_split_to_array(
                     tr, '[ \t\n\x0b\f\r\x21-\x2f\x3a-\x40\x5b-\x60\x7b-\x7e]+'),
                               x -> x <> '')) AS n_tokens_bpe,
               round(length(regexp_replace(tx, '[^ \t\n\x0b\f\r]', '', 'g'))
                     / greatest(length(tx), 1), 6) AS space_ratio,
               round(length(regexp_replace(tx, '[^0-9]', '', 'g'))
                     / greatest(length(tx), 1), 6) AS digit_ratio
        FROM t
        """
    ).fetchall()
    assert len(exp) == len(texts)
    for doc_id, n_tok, n_bpe, sr, dr in exp:
        g = got[doc_id]
        assert g["n_tokens"] == n_tok, (doc_id, g["n_tokens"], n_tok)
        assert g["n_tokens_bpe"] == n_bpe, (doc_id, g["n_tokens_bpe"], n_bpe)
        assert abs(g["space_ratio"] - sr) < 1e-9, (doc_id, g["space_ratio"], sr)
        assert abs(g["digit_ratio"] - dr) < 1e-9, (doc_id, g["digit_ratio"], dr)

    # NumPy twin agrees on token counts for the same hostile set — on
    # EVERY row: non-WS-run counts are trim-invariant (trimming only
    # removes WS chars, which can never merge or split a non-WS run),
    # so the twin's untrimmed findall == the engines' trimmed
    # filtered-piece count by construction.
    stats = tk.quality_stats([t or "" for _, t in texts])
    by_exp = {d: n for d, n, *_ in exp}
    for (doc_id, t), n in zip(texts, stats["n_tokens"]):
        assert n == by_exp[doc_id], (doc_id, n)
