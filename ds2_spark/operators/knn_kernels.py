"""Blocked, deterministic NumPy kNN kernels.

Shared by the Spark operators (inside mapInPandas tasks) and the test
oracles — sharing the float kernels is what makes engine-vs-oracle
comparisons exact; orchestration (sampling, epochs, aggregation) is
implemented independently on each side.

Semantics mirror the reference's chunked cosine-distance kNN
(score_curation/docta/core/hoc.py:173-214, core_utils.py:29-40) with
one deliberate difference: ties are broken by ascending row index
(stable), where the reference inherits torch.topk's unspecified tie
order — pinning ties is part of this engine's determinism contract
(SURVEY.md §7.3).
"""

from __future__ import annotations

import numpy as np

# Tile shape: GEMM + top-k selection are FUSED per (SUB x CHUNK) tile
# so the 2MB distance tile is consumed by argpartition while still
# cache-resident. The round-1 layout (2048x8192 = 64MB tiles, select
# in a second pass) streamed every distance through DRAM twice —
# measured 2-4x slower and REGRESSING with process count on this
# bandwidth-capped VM; the fused tile scales (kernel-only probe:
# 0.94x -> 2.2x wall speedup at 2->8 procs on identical work).
SUB = 256
CHUNK = 2048

# Per-process scratch cache: cosine_knn's working buffers are up to
# 64MB; allocating them FRESH per call means an mmap/munmap cycle per
# Arrow batch, which serializes badly under sandboxed (gVisor-style)
# runtimes — measured as a ~3.5s fixed cost per kernel invocation
# regardless of row count. Python workers are reused across batches,
# so a grow-only cache amortizes the allocation to once per executor.
_SCRATCH: dict[str, np.ndarray] = {}


def _scratch(name: str, shape: tuple[int, ...], dtype) -> np.ndarray:
    need = 1
    for s in shape:
        need *= int(s)
    arr = _SCRATCH.get(name)
    if arr is None or arr.size < need or arr.dtype != np.dtype(dtype):
        arr = np.empty(max(need, 1), dtype=dtype)
        _SCRATCH[name] = arr
    return arr[:need].reshape(shape)


def l2_normalize_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.maximum(n, 1e-12)


def cosine_knn(
    queries: np.ndarray,
    index: np.ndarray,
    k: int,
    exclude_self_offset: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Top-k smallest cosine distances of each query row against the
    index matrix, blocked to bound memory (reference hoc.py:173 block
    1024). Rows must be L2-normalized already.

    exclude_self_offset: if not None, query i corresponds to index row
    (i + offset) and that entry is masked out (self-match).

    Returns (dists [nq,k], idx [nq,k]) with deterministic tie-break by
    ascending index id.
    """
    nq, ni = queries.shape[0], index.shape[0]
    out_d = np.empty((nq, k), dtype=np.float64)
    out_i = np.empty((nq, k), dtype=np.int64)
    # Cache-blocked, fused GEMM+select, float32, REUSED buffers:
    #  - (SUB x CHUNK) distance tiles: ~2MB, written by the GEMM and
    #    immediately consumed by one argpartition pass while cache-
    #    resident — distances never round-trip through DRAM;
    #  - all scratch comes from the per-process _SCRATCH cache (fresh
    #    multi-MB allocations serialize under sandboxed runtimes);
    #  - per-tile top-k then a lexsort merge of (rows x k*chunks)
    #    candidates. Ties: smallest distance, then smallest global
    #    index — deterministic.
    index32 = np.ascontiguousarray(index, dtype=np.float32)
    n_chunks = (ni + CHUNK - 1) // CHUNK
    bm = min(SUB, nq)
    buf = _scratch("gemm", (bm, min(CHUNK, ni)), np.float32)
    cand_d = _scratch("cand_d", (bm, n_chunks * k), np.float64)
    cand_i = _scratch("cand_i", (bm, n_chunks * k), np.int64)
    for s in range(0, nq, SUB):
        e = min(s + SUB, nq)
        m = e - s
        block = np.ascontiguousarray(queries[s:e], dtype=np.float32)
        rr = np.arange(m)
        cand_d[:m].fill(np.inf)
        cand_i[:m].fill(-1)
        for ci, c0 in enumerate(range(0, ni, CHUNK)):
            c1 = min(c0 + CHUNK, ni)
            w = c1 - c0
            d = buf[:m, :w]
            np.matmul(block, index32[c0:c1].T, out=d)
            np.subtract(np.float32(1.0), d, out=d)
            if exclude_self_offset is not None:
                rows = np.arange(s, e)
                cols = rows + exclude_self_offset
                ok = (cols >= c0) & (cols < c1)
                d[rr[ok], cols[ok] - c0] = np.inf
            kk = min(k, w)
            base = ci * k
            part = np.argpartition(d, kk - 1, axis=1)[:, :kk]
            pv = np.take_along_axis(d, part, axis=1)
            order = np.lexsort((part, pv), axis=1)
            cand_i[:m, base : base + kk] = (
                np.take_along_axis(part, order, axis=1) + c0
            )
            cand_d[:m, base : base + kk] = np.take_along_axis(pv, order, axis=1)
        # merge candidates: sort by (distance, global index)
        order = np.lexsort((cand_i[:m], cand_d[:m]), axis=1)[:, :k]
        out_d[s:e] = np.take_along_axis(cand_d[:m], order, axis=1)
        sel = np.take_along_axis(cand_i[:m], order, axis=1)
        sel[~np.isfinite(out_d[s:e])] = -1
        out_i[s:e] = sel
    return out_d, out_i


def weighted_label_distribution(
    nn_idx: np.ndarray,
    nn_dist: np.ndarray,
    labels_index: np.ndarray,
    own_labels: np.ndarray,
    num_classes: int,
) -> np.ndarray:
    """Distance-weighted neighbor label distribution per row, with the
    reference's dataset-duplication trick emulated by prepending each
    row's own label at distance 0 (SURVEY.md §7.3; equivalent to
    diagnose.py:53's duplicate=True + knn.py:22 self-distance adjust).

    weight = 1 - dist (cosine similarity), clipped at 0. Rows are
    L1-normalized.
    """
    n, k = nn_idx.shape
    probs = np.zeros((n, num_classes), dtype=np.float64)
    rows = np.arange(n)
    probs[rows, own_labels] += 1.0  # the distance-0 duplicate
    w = np.clip(1.0 - nn_dist, 0.0, None)
    valid = nn_idx >= 0
    for j in range(k):
        vj = valid[:, j]
        np.add.at(probs, (rows[vj], labels_index[nn_idx[vj, j]]), w[vj, j])
    s = probs.sum(axis=1, keepdims=True)
    return probs / np.maximum(s, 1e-12)
