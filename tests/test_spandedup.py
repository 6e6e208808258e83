"""Span dedup vs an independent pure-Python replay + adversarial
planted cases (owner retention, island merge, full-doc removal)."""

import hashlib

from ds2_spark.operators.spandedup import dedup_spans


def _py_span_dedup(rows, k):
    """Independent reference: dict/set implementation, no windows."""
    toks = {i: [w for w in t.split() if w] for i, t in rows}
    where = {}
    for i, ws in toks.items():
        for p in range(len(ws) - k + 1):
            key = hashlib.md5(
                " ".join(ws[p:p + k]).encode()
            ).hexdigest()[:16]
            where.setdefault(key, []).append((i, p + 1))
    removed = {i: set() for i in toks}
    for key, occ in where.items():
        docs = {i for i, _ in occ}
        if len(docs) < 2:
            continue
        owner = min(docs)
        for i, p in occ:
            if i != owner:
                removed[i].update(range(p, p + k))
    out = {}
    for i, ws in toks.items():
        rem = sorted(removed[i])
        spans = []
        for p in rem:
            if spans and p <= spans[-1][1] + 1:
                spans[-1][1] = max(spans[-1][1], p)
            else:
                spans.append([p, p])
        kept = [w for j, w in enumerate(ws, start=1) if j not in removed[i]]
        out[i] = (
            len(ws),
            len(spans),
            len(removed[i]),
            " ".join(kept),
        )
    return out


def _run(spark, rows, k):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (
            r["n_tokens"], r["n_spans"], r["tokens_removed"], r["dedup_text"]
        )
        for r in dedup_spans(df, k=k).collect()
    }
    assert got == _py_span_dedup(rows, k)
    return got


def test_matches_python_replay_on_corpus_slice(spark):
    rows = [
        (r["doc_id"], r["text"])
        for r in spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).select("doc_id", "text").limit(200).collect()
    ]
    got = _run(spark, rows, 8)
    # non-vacuous: the corpus's planted near-dups must lose spans
    assert sum(1 for v in got.values() if v[2] > 0) > 0


def test_owner_keeps_copy_and_merge_semantics(spark):
    boiler = "all rights reserved contact the site admin for removal"
    rows = [
        (10, f"alpha beta {boiler} gamma delta"),
        (20, f"epsilon {boiler} zeta"),          # loses the span
        (30, f"{boiler} {boiler}"),              # touching spans merge to 1
        (40, boiler),                            # fully removed -> ''
        (50, "too short"),                       # < k tokens, untouched
    ]
    got = _run(spark, rows, 8)
    assert got[10][2] == 0                       # owner untouched
    assert got[20][2] > 0 and boiler not in got[20][3]
    assert got[30] == (18, 1, 18, "")            # one merged island
    assert got[40][3] == ""
    assert got[50] == (2, 0, 0, "too short")


def test_overlapping_marks_merge_into_one_span(spark):
    # doc 2 contains a 10-token run shared with doc 1 -> three
    # overlapping 8-gram marks, one island, 10 tokens removed
    run = "a b c d e f g h i j"
    rows = [(1, f"x {run} y"), (2, f"p q r {run} s t")]
    got = _run(spark, rows, 8)
    assert got[2][1] == 1 and got[2][2] == 10
    assert got[2][3] == "p q r s t"


def test_null_text_passes_through_as_null(spark):
    """Hostile input: NULL text rows survive with NULL tokens/text
    and zero span counts — no crash, no silent drop."""
    rows = [(0, "a b c d"), (1, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in dedup_spans(df, k=2).collect()}
    assert got[1]["n_tokens"] is None and got[1]["dedup_text"] is None
    assert got[1]["n_spans"] == 0 and got[1]["tokens_removed"] == 0
    assert got[0]["dedup_text"] == "a b c d"


def test_incremental_matches_python_replay_and_batch_relation(spark):
    """dedup_spans_incremental vs a dict replay, plus the relation to
    the batch operator: when delta docs share grams ONLY with the
    base (no delta-delta or base-base duplication), a full-corpus
    batch run must scrub the delta docs identically (base ids < delta
    ids makes the base the keep-first owner either way)."""
    from ds2_spark.operators.spandedup import dedup_spans_incremental

    boiler = "terms of service apply to all content on this site"
    base_rows = [
        (0, f"original article text {boiler} more original prose"),
        (1, "completely unrelated base document about other things"),
    ]
    delta_rows = [
        (10, f"fresh crawl intro {boiler} fresh crawl outro"),
        (11, "novel delta content with no duplication at all"),
        (12, boiler),                      # fully duplicated vs base
        (13, "short doc"),                 # < k tokens
    ]
    base = spark.createDataFrame(base_rows, ["doc_id", "text"])
    delta = spark.createDataFrame(delta_rows, ["doc_id", "text"])
    inc = {
        r["doc_id"]: (r["n_tokens"], r["n_spans"], r["tokens_removed"],
                      r["dedup_text"])
        for r in dedup_spans_incremental(delta, base, k=8).collect()
    }

    # python replay: mark delta windows whose key is any base window's
    base_keys = set()
    for _, t in base_rows:
        ws = t.split()
        for p in range(len(ws) - 7):
            base_keys.add(" ".join(ws[p:p + 8]))
    exp = {}
    for i, t in delta_rows:
        ws = t.split()
        removed = set()
        for p in range(len(ws) - 7):
            if " ".join(ws[p:p + 8]) in base_keys:
                removed.update(range(p + 1, p + 9))
        spans = []
        for p in sorted(removed):
            if spans and p <= spans[-1][1] + 1:
                spans[-1][1] = p
            else:
                spans.append([p, p])
        kept = [w for j, w in enumerate(ws, 1) if j not in removed]
        exp[i] = (len(ws), len(spans), len(removed), " ".join(kept))
    assert inc == exp
    assert inc[10][2] > 0 and boiler not in inc[10][3]
    assert inc[11] == (8, 0, 0, delta_rows[1][1])
    assert inc[12][3] == ""
    assert inc[13] == (2, 0, 0, "short doc")

    # batch relation on the union (delta shares grams only with base)
    both = base.unionByName(delta)
    batch = {
        r["doc_id"]: (r["n_tokens"], r["n_spans"], r["tokens_removed"],
                      r["dedup_text"])
        for r in dedup_spans(both, k=8).collect()
    }
    for i, _ in delta_rows:
        assert batch[i] == inc[i], i
