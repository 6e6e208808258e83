"""Property-based invariants (hypothesis) — SURVEY.md §5.2:
T row-stochastic, scrub idempotent, compress bounds, selection size,
langid/ppl determinism. Pure-Python/NumPy properties run many cases;
Spark-backed properties use a handful of seeded cases."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from ds2_spark.fixtures import make_t_true
from ds2_spark.functions import textkernels as tk
from ds2_spark.functions.scrub import scrub_py
from ds2_spark.operators.selection import bucket_budgets

text_st = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=300
)


@given(text_st)
@settings(max_examples=200, deadline=None)
def test_scrub_idempotent_property(t):
    once = scrub_py(t)
    assert scrub_py(once) == once


_local = st.from_regex(r"[A-Za-z0-9][A-Za-z0-9._%+-]{0,20}", fullmatch=True)
_domain = st.from_regex(r"[A-Za-z0-9-]{1,12}(\.[A-Za-z0-9-]{1,8}){0,2}\.[A-Za-z]{2,6}", fullmatch=True)


@given(_local, _domain)
@settings(max_examples=100, deadline=None)
def test_scrub_removes_conventional_emails(local, domain):
    # scope: conventional addresses (the scrub chain deliberately does
    # not chase RFC-exotic locals like '*@a.com' — documented in
    # functions/scrub.py; broadening the pattern makes it over-greedy)
    email = f"{local}@{domain}"
    assert email not in scrub_py(f"contact: {email} thanks")


@given(st.integers(0, 2**31 - 1))
@settings(max_examples=100, deadline=None)
def test_t_true_row_stochastic_any_seed(seed):
    t = make_t_true(seed)
    assert np.allclose(t.sum(axis=1), 1.0)
    assert (t >= 0).all()


@given(
    st.dictionaries(st.integers(0, 5), st.integers(0, 500), min_size=0, max_size=6),
    st.integers(0, 3000),
)
@settings(max_examples=200, deadline=None)
def test_bucket_budgets_properties(sizes, budget):
    take = bucket_budgets(sizes, budget)
    total_take = sum(take.values())
    total_avail = sum(sizes.values())
    assert total_take == min(budget, total_avail)
    for s, t in take.items():
        assert 0 <= t <= sizes.get(s, 0)
    # higher buckets fill first: if any lower bucket got items, every
    # higher bucket must be fully taken
    for s in range(6):
        if take.get(s, 0) > 0:
            for higher in range(s + 1, 6):
                assert take.get(higher, 0) == sizes.get(higher, 0)


@given(st.lists(text_st, min_size=1, max_size=8))
@settings(max_examples=50, deadline=None)
def test_langid_ppl_deterministic_and_finite(texts):
    i1, m1, _ = tk.langid_scores(texts)
    i2, m2, _ = tk.langid_scores(texts)
    assert np.array_equal(i1, i2) and np.array_equal(m1, m2)
    p1 = tk.perplexities(texts)
    p2 = tk.perplexities(texts)
    assert np.array_equal(p1, p2)
    assert np.isfinite(p1).all() and (p1 > 0).all()


@given(st.lists(text_st, min_size=1, max_size=8))
@settings(max_examples=50, deadline=None)
def test_embeddings_normalized(texts):
    m = tk.embed_texts(texts, dim=32)
    norms = np.linalg.norm(m, axis=1)
    for n in norms:
        assert n == 0 or abs(n - 1.0) < 1e-4


@given(
    st.integers(1, 60),   # queries
    st.integers(1, 80),   # index rows
    st.integers(1, 12),   # k
    st.integers(0, 2**31 - 1),
)
@settings(max_examples=60, deadline=None)
def test_cosine_knn_matches_naive(nq, ni, k, seed):
    """The cache-blocked fused kernel must equal a naive full-sort
    top-k with (distance, index) tie-break for any shape — including
    k > index size (padded with -1)."""
    from ds2_spark.operators.knn_kernels import cosine_knn, l2_normalize_rows

    rng = np.random.default_rng(seed)
    q = l2_normalize_rows(rng.normal(0, 1, (nq, 8)).astype(np.float32))
    x = l2_normalize_rows(rng.normal(0, 1, (ni, 8)).astype(np.float32))
    d, i = cosine_knn(q, x, k=k)
    # naive: full distance matrix in the SAME f32 arithmetic
    full = 1.0 - (q @ x.T)
    for r in range(nq):
        order = sorted(range(ni), key=lambda c: (float(full[r, c]), c))[:k]
        expect = order + [-1] * (k - len(order))
        assert list(i[r]) == expect, (r, list(i[r]), expect)


def test_zorder_key_locality_and_exactness(spark):
    """Morton key: matches a pure-Python bit interleave; preserves the
    locality property (any aligned 2^k x 2^k tile maps to ONE
    contiguous zkey range — that is what makes min/max file stats
    prune on both dimensions)."""
    from ds2_spark.functions.zorder import zorder2
    import pyspark.sql.functions as F

    pts = [(x, y) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y", zorder2(F.col("x"), F.col("y"), 8).alias("z")).collect()
    }

    def morton(x, y):
        z = 0
        for i in range(8):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    assert all(got[(x, y)] == morton(x, y) for x, y in pts)

    # locality: every aligned 8x8 tile occupies exactly one contiguous
    # 64-key range
    for tx in range(4):
        for ty in range(4):
            keys = sorted(
                got[(x, y)]
                for x in range(tx * 8, tx * 8 + 8)
                for y in range(ty * 8, ty * 8 + 8)
            )
            assert keys == list(range(keys[0], keys[0] + 64)), (tx, ty)
