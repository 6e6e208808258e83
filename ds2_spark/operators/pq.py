"""Product quantization (PQ) — compressed-domain ANN for 100 TB-scale
embedding search.

Public method: Jégou, Douze, Schmid, "Product Quantization for
Nearest Neighbor Search" (TPAMI 2011). Split each D-dim vector into M
subvectors; quantize each against a per-subspace codebook of K
centroids; a vector becomes M small codes (here M=8 bytes vs 64
floats — 32x less memory). Queries never decompress: asymmetric
distance computation (ADC) precomputes, per query, an M x K lookup
table of query-subvector-to-centroid distances, and a candidate's
approximate distance is M table lookups summed.

Why this is THE scale path beyond IVF/LSH (similarity.py): at 10^12
vectors the raw float embeddings are ~250 TB and cannot live hot;
PQ codes are ~8 TB and scan at memory bandwidth. The operators here
keep the Spark shapes that matter at that size:

  * encode is one vectorized einsum per Arrow batch (mapInPandas) —
    the only pass that touches raw vectors; output is (id, codes).
  * the codes relation is the only thing downstream jobs scan/shuffle.
  * queries ride a BROADCAST of their M x K integer LUTs; the ADC
    scan is JVM-side array arithmetic over the codes column — no
    Python, no shuffle of vectors; only (query_id, neighbor_id, dist)
    ids enter the top-k exchange.

Cross-engine exactness (the repo-wide recipe): embeddings and
codebooks are quantized to integers (floor(x*scale + 0.5), the
unified tie rule — NOTES.md #27); every distance is an int64 sum of
squared integer diffs; argmin ties break to the LOWEST code id
(np.argmin's first-occurrence == SQL row_number ordered by
(dist, code)). A DuckDB oracle replays encode + LUT + ADC from the
same codebook literals and hash-matches bit for bit.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pq_train_codebooks(
    vectors: np.ndarray, m: int, k: int, scale: int, iters: int = 10,
    seed: int = 0,
) -> np.ndarray:
    """Per-subspace k-means on a (driver-side, bounded) training
    sample -> integer codebooks (m, k, d/m). Seeded and integer-
    rounded so a given sample always yields the same codebooks.
    Lloyd iterations in float64, final centroids quantized once."""
    n, d = vectors.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    rng = np.random.default_rng(seed)
    sub = vectors.reshape(n, m, dsub)
    books = np.empty((m, k, dsub), dtype=np.int64)
    for mi in range(m):
        x = sub[:, mi, :].astype(np.float64)
        cents = x[rng.choice(n, size=k, replace=False)]
        for _ in range(iters):
            d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(k):
                mask = assign == c
                if mask.any():
                    cents[c] = x[mask].mean(axis=0)
        books[mi] = np.floor(cents * scale + 0.5).astype(np.int64)
    return books


def _valid_mask(col, d: int) -> np.ndarray:
    """True where the cell is a length-d vector (NULL rows and
    wrong-dimension vectors are refused — codes NULL — rather than
    silently garbled; the audio decoders' decoded_ok policy)."""
    return np.fromiter(
        (v is not None and len(v) == d for v in col),
        dtype=bool,
        count=len(col),
    )


def _stack_valid(col, mask: np.ndarray, d: int) -> np.ndarray:
    vals = [v for v, ok in zip(col, mask) if ok]
    if not vals:
        return np.zeros((0, d), dtype=np.float64)
    return np.stack(vals)


def _encode_batch(emb: np.ndarray, books: np.ndarray, scale: int) -> np.ndarray:
    """(n, d) float embeddings -> (n, m) int codes; integer-exact."""
    n = emb.shape[0]
    m, k, dsub = books.shape
    q = np.floor(emb.astype(np.float64) * scale + 0.5).astype(np.int64)
    sub = q.reshape(n, m, dsub)
    # (n, m, k) integer distances: ||x||^2 - 2 x.c + ||c||^2
    # computed as explicit diffs to stay in exact int64
    diffs = sub[:, :, None, :] - books[None, :, :, :]
    d2 = (diffs * diffs).sum(axis=3)
    return d2.argmin(axis=2).astype(np.int32)  # first min == lowest code


def _lut_batch(emb: np.ndarray, books: np.ndarray, scale: int) -> np.ndarray:
    """(n, d) query embeddings -> (n, m, k) int64 ADC lookup tables."""
    n = emb.shape[0]
    m, k, dsub = books.shape
    q = np.floor(emb.astype(np.float64) * scale + 0.5).astype(np.int64)
    sub = q.reshape(n, m, dsub)
    diffs = sub[:, :, None, :] - books[None, :, :, :]
    return (diffs * diffs).sum(axis=3)


def ivfpq_train(
    vectors: np.ndarray,
    n_cells: int,
    m: int,
    k: int,
    scale: int,
    iters: int = 10,
    seed: int = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """Train the composed index on a (driver-side, bounded) sample:
    coarse k-means for the cells, then PQ codebooks on the RESIDUALS
    (vector minus its cell centroid) — training the codebooks on raw
    vectors would spend the codebook budget re-describing the coarse
    structure the cells already capture. Returns (centroids int64 in
    the quantized domain, codebooks int64 in the residual domain),
    both seeded-deterministic for a given sample."""
    n, d = vectors.shape
    x = vectors.astype(np.float64)
    rng = np.random.default_rng(seed)
    cents = x[rng.choice(n, size=n_cells, replace=False)]
    for _ in range(iters):
        d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(n_cells):
            mask = assign == c
            if mask.any():
                cents[c] = x[mask].mean(axis=0)
    d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    resid = x - cents[d2.argmin(axis=1)]
    books = pq_train_codebooks(
        resid, m=m, k=k, scale=scale, iters=iters, seed=seed + 1
    )
    cents_q = np.floor(cents * scale + 0.5).astype(np.int64)
    return cents_q, books


def _assign_cells(q: np.ndarray, cents: np.ndarray, nprobe: int) -> np.ndarray:
    """(n, d) int64 quantized vectors -> (n, nprobe) nearest coarse
    cells by integer L2 (ties -> lowest cell id via stable argsort)."""
    diffs = q[:, None, :] - cents[None, :, :]
    d2 = (diffs * diffs).sum(axis=2)
    return np.argsort(d2, axis=1, kind="stable")[:, :nprobe].astype(np.int32)


def _encode_int(sub: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, m, dsub) int64 subvectors -> (n, m) codes (first-min ties)."""
    diffs = sub[:, :, None, :] - books[None, :, :, :]
    d2 = (diffs * diffs).sum(axis=3)
    return d2.argmin(axis=2).astype(np.int32)


def ivfpq_topk(
    queries: DataFrame,
    candidates: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    k: int = 3,
    nprobe: int = 2,
    query_id: str = "query_id",
    cand_id: str = "neighbor_id",
    vec_col: str = "embedding",
    quantize_scale: int = 1000,
) -> DataFrame:
    """IVF-PQ with residual encoding — the composed production index
    (FAISS IndexIVFPQ architecture, from the same public PQ paper):
    a coarse quantizer routes each vector to its nearest cell, PQ
    encodes the RESIDUAL (vector minus cell centroid), and queries
    probe only `nprobe` cells with a per-(query, cell) residual LUT.

    Why residuals: within a cell the residual distribution is far
    tighter than the raw data, so the same M x K codebook budget
    quantizes it with much less error — and the ADC distance is
    exact w.r.t. the residual geometry of the probed cell because
    the query LUT is rebuilt against that cell's centroid.

    Spark shapes at 10^12 vectors: candidates pass once through a
    vectorized assign+encode mapInPandas -> (id, cell, codes) — the
    index relation, ~9 small ints per vector; queries explode to
    nprobe (id, cell, lut) rows and BROADCAST; the probe is an
    equi-join on cell (the IVF pruning — only matching cells' codes
    are scanned), ADC is JVM array arithmetic, and only
    (query, neighbor, dist) ids reach the top-k exchange.

    centroids: (C, d) int64 in the QUANTIZED domain (x * scale);
    codebooks: (m, k, d/m) int64 in the residual domain. Integer
    in, integer out: every distance is exact int64, ties break to
    the lowest cell/code/neighbor id — SQL-replayable end to end.
    """
    cents = np.ascontiguousarray(centroids, dtype=np.int64)
    books = np.ascontiguousarray(codebooks, dtype=np.int64)
    m, kk, dsub = books.shape
    d = cents.shape[1]
    if m * dsub != d:
        raise ValueError(f"codebooks {books.shape} do not tile dim {d}")

    def _cand_op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            col = pdf[vec_col].to_numpy()
            mask = _valid_mask(col, d)
            emb = _stack_valid(col, mask, d)
            q = np.floor(
                emb.astype(np.float64) * quantize_scale + 0.5
            ).astype(np.int64)
            cell = _assign_cells(q, cents, 1)[:, 0] if len(q) else (
                np.zeros(0, dtype=np.int32)
            )
            resid = (q - cents[cell]).reshape(len(q), m, dsub)
            codes = _encode_int(resid, books)
            cells_out, codes_out, ci = [], [], 0
            for ok in mask:
                cells_out.append(int(cell[ci]) if ok else None)
                codes_out.append(list(codes[ci]) if ok else None)
                ci += ok
            yield pd.DataFrame(
                {
                    cand_id: pdf[cand_id],
                    "cell": pd.array(cells_out, dtype="Int32"),
                    "codes": codes_out,
                }
            )

    index = candidates.select(cand_id, vec_col).mapInPandas(
        _cand_op, schema=f"{cand_id} long, cell int, codes array<int>"
    )

    def _query_op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            col = pdf[vec_col].to_numpy()
            mask = _valid_mask(col, d)
            emb = _stack_valid(col, mask, d)
            qids = pdf[query_id][mask].to_numpy()
            q = np.floor(
                emb.astype(np.float64) * quantize_scale + 0.5
            ).astype(np.int64)
            np_eff = min(nprobe, len(cents))
            probes = _assign_cells(q, cents, np_eff)
            # one vectorized LUT computation for ALL (query, probe)
            # pairs: residuals (n*nprobe, m, dsub) against the
            # codebooks in a single diff+sum, one bulk tolist()
            flat_cells = probes.reshape(-1)
            resid = (
                np.repeat(q, np_eff, axis=0) - cents[flat_cells]
            ).reshape(-1, m, dsub)
            diffs = resid[:, :, None, :] - books[None, :, :, :]
            luts = (diffs * diffs).sum(axis=3)
            yield pd.DataFrame(
                {
                    query_id: np.repeat(qids, np_eff),
                    "cell": flat_cells.astype(np.int32),
                    "lut": luts.tolist(),
                }
            )

    luts = queries.select(query_id, vec_col).mapInPandas(
        _query_op,
        schema=f"{query_id} long, cell int, lut array<array<bigint>>",
    )
    # the IVF prune: equi-join on cell — only probed cells' codes scan
    joined = index.join(F.broadcast(luts), "cell")
    adc = joined.select(
        query_id,
        cand_id,
        F.aggregate(
            F.zip_with(
                "codes",
                "lut",
                lambda c, row: F.element_at(row, c + F.lit(1)),
            ),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("adc_dist"),
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("adc_dist").asc(), F.col(cand_id).asc()
    )
    return adc.withColumn("rk", F.row_number().over(w)).where(
        F.col("rk") <= k
    )


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    quantize_scale: int = 1000,
) -> DataFrame:
    """(id, vector) -> (id, codes array<int>). One vectorized einsum-
    shaped pass per Arrow batch; raw vectors never leave it."""
    books = np.ascontiguousarray(codebooks, dtype=np.int64)
    pruned = df.select(id_col, vec_col)

    d = books.shape[0] * books.shape[2]

    def _op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            col = pdf[vec_col].to_numpy()
            mask = _valid_mask(col, d)
            codes = _encode_batch(
                _stack_valid(col, mask, d), books, quantize_scale
            )
            out, ci = [], 0
            for ok in mask:
                out.append(list(codes[ci]) if ok else None)
                ci += ok
            yield pd.DataFrame({id_col: pdf[id_col], "codes": out})

    return pruned.mapInPandas(_op, schema=f"{id_col} long, codes array<int>")


def pq_topk(
    queries: DataFrame,
    candidates: DataFrame,
    codebooks: np.ndarray,
    k: int = 3,
    query_id: str = "query_id",
    cand_id: str = "neighbor_id",
    vec_col: str = "embedding",
    quantize_scale: int = 1000,
    rerank_k: int | None = None,
) -> DataFrame:
    """ADC top-k: for each query, the k candidates with the smallest
    PQ-approximated squared distance (ties -> lowest neighbor id).

    queries: (query_id, <vec_col>) — small (broadcast side).
    candidates: (neighbor_id, <vec_col>) — the corpus.

    Output: (query_id, neighbor_id, adc_dist, rk). adc_dist is exact
    int64 given the integer codebooks, so the whole result is
    hash-comparable against a SQL replay.

    `rerank_k` is the production composition (PQ cannot micro-order
    neighbors whose true gaps are below quantization error): take an
    ADC shortlist of rerank_k (> k), BROADCAST it against the corpus
    scan (a broadcast-hash join keeps raw vectors out of any shuffle
    — only the Q * rerank_k shortlist rows survive the probe),
    re-rank by exact integer squared distance, return top-k. Output
    then carries exact_dist alongside adc_dist, ranked by exact_dist.

    This is the encode-then-search convenience form; the stored-index
    production shape is `pq_topk_codes` (search over a persisted
    codes relation, so the corpus is encoded ONCE and only ingest
    deltas ever touch raw vectors — see pq_append).
    """
    books = np.ascontiguousarray(codebooks, dtype=np.int64)
    codes = pq_encode(
        candidates, books, vec_col=vec_col, id_col=cand_id,
        quantize_scale=quantize_scale,
    )
    return pq_topk_codes(
        queries, codes, books, k=k, query_id=query_id, cand_id=cand_id,
        vec_col=vec_col, quantize_scale=quantize_scale, rerank_k=rerank_k,
        candidates=candidates,
    )


def pq_append(
    delta: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    quantize_scale: int = 1000,
) -> DataFrame:
    """Incremental index maintenance: encode an ingest delta under the
    FROZEN codebooks and return its codes relation, ready to union
    with (or append to) the stored base index. The same freeze
    discipline as incremental curation / span dedup: the base corpus
    is encoded once and never re-read; codebook retraining is a
    deliberate, versioned event (re-encode everything or nothing),
    never a side effect of ingest — two batches encoded under
    different codebooks would produce incomparable ADC distances.
    O(delta) per ingest; raw vectors never leave the Arrow batch."""
    return pq_encode(
        delta, codebooks, vec_col=vec_col, id_col=id_col,
        quantize_scale=quantize_scale,
    )


def pq_topk_codes(
    queries: DataFrame,
    codes: DataFrame,
    codebooks: np.ndarray,
    k: int = 3,
    query_id: str = "query_id",
    cand_id: str = "neighbor_id",
    vec_col: str = "embedding",
    quantize_scale: int = 1000,
    rerank_k: int | None = None,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """ADC top-k over a STORED codes relation ((cand_id, codes) — the
    persisted 32x-compressed index, typically base codes unioned with
    pq_append deltas). Identical semantics and output to pq_topk; the
    difference is operational: the corpus is never re-encoded per
    query batch. `rerank_k` needs the raw-vector corpus to re-rank
    against — pass `candidates`; refused loudly if absent (a silent
    ADC-only fallback would change the ranking contract)."""
    books = np.ascontiguousarray(codebooks, dtype=np.int64)
    m, kk, _ = books.shape
    if rerank_k is not None and candidates is None:
        raise ValueError(
            "rerank_k requires the raw-vector `candidates` relation"
        )

    d = m * books.shape[2]

    def _lut_op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            col = pdf[vec_col].to_numpy()
            mask = _valid_mask(col, d)
            lut = _lut_batch(
                _stack_valid(col, mask, d), books, quantize_scale
            )
            # invalid query vectors are refused: no LUT row, so the
            # query is absent from the result (never silently wrong)
            yield pd.DataFrame(
                {
                    query_id: pdf[query_id][mask],
                    "lut": [[row.tolist() for row in tab] for tab in lut],
                }
            )

    luts = queries.select(query_id, vec_col).mapInPandas(
        _lut_op, schema=f"{query_id} long, lut array<array<bigint>>"
    )
    # broadcast the tiny LUT side; ADC = M JVM array lookups per pair.
    # The Q x N expansion is the DECLARED shape of exhaustive ADC (Q is
    # the broadcast query batch, N the codes scan — the same scan an
    # IVF-pruned variant would run per probed cell); no vector data is
    # in it, only codes + id. NULL-coded rows (refused vectors) carry
    # no usable distance and are excluded.
    joined = codes.where(F.col("codes").isNotNull()).crossJoin(
        F.broadcast(luts)
    )
    adc = joined.select(
        query_id,
        cand_id,
        F.aggregate(
            F.zip_with(
                "codes",
                "lut",
                lambda c, row: F.element_at(row, c + F.lit(1)),
            ),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("adc_dist"),
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("adc_dist").asc(), F.col(cand_id).asc()
    )
    if rerank_k is None:
        return adc.withColumn("rk", F.row_number().over(w)).where(
            F.col("rk") <= k
        )
    if rerank_k < k:
        raise ValueError(f"rerank_k={rerank_k} must be >= k={k}")
    shortlist = adc.withColumn("_ark", F.row_number().over(w)).where(
        F.col("_ark") <= rerank_k
    )

    def _qsq(col):  # quantized integer vector (same rule as encode)
        return F.transform(
            col,
            lambda x: F.floor(
                x.cast("double") * quantize_scale + 0.5
            ).cast("bigint"),
        )

    qv = queries.select(query_id, _qsq(F.col(vec_col)).alias("_qq"))
    cv = candidates.select(cand_id, _qsq(F.col(vec_col)).alias("_cq"))
    # BROADCAST the Q*rerank_k shortlist against the corpus scan: the
    # corpus vector column is filtered by a broadcast-hash join (no
    # corpus shuffle, no sort-merge — the shortlist descends from a
    # window over a cross join, so the static planner has no stats to
    # discover this on its own)
    paired = (
        cv.join(F.broadcast(shortlist), cand_id)
        .join(F.broadcast(qv), query_id)
        .select(
            query_id,
            cand_id,
            "adc_dist",
            F.aggregate(
                F.zip_with("_qq", "_cq", lambda a, b: (a - b) * (a - b)),
                F.lit(0).cast("bigint"),
                lambda acc, x: acc + x,
            ).alias("exact_dist"),
        )
    )
    w2 = Window.partitionBy(query_id).orderBy(
        F.col("exact_dist").asc(), F.col(cand_id).asc()
    )
    return paired.withColumn("rk", F.row_number().over(w2)).where(
        F.col("rk") <= k
    )
