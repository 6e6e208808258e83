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

BLOCK = 2048


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
    nq = queries.shape[0]
    out_d = np.empty((nq, k), dtype=np.float64)
    out_i = np.empty((nq, k), dtype=np.int64)
    # float32 GEMM into a REUSED buffer: deterministic, half the memory
    # traffic of float64, and — critical in sandboxed (gVisor-style)
    # containers where large mmap/munmap cycles serialize — no
    # per-block large allocations.
    index32 = np.ascontiguousarray(index, dtype=np.float32)
    buf = np.empty((min(BLOCK, nq), index.shape[0]), dtype=np.float32)
    for s in range(0, nq, BLOCK):
        e = min(s + BLOCK, nq)
        block = np.ascontiguousarray(queries[s:e], dtype=np.float32)
        d = buf[: e - s]
        np.matmul(block, index32.T, out=d)
        np.subtract(np.float32(1.0), d, out=d)
        if exclude_self_offset is not None:
            rows = np.arange(s, e)
            cols = rows + exclude_self_offset
            ok = (cols >= 0) & (cols < index.shape[0])
            d[np.arange(e - s)[ok], cols[ok]] = np.inf
        # deterministic top-k by iterative argmin: ascending distance,
        # ties broken by LOWEST index (argmin returns the first min).
        # Allocation-free — argpartition would materialize a full
        # (rows x n) int64 index array per block, which is exactly the
        # mmap churn that serializes sandboxed runtimes.
        kk = min(k, d.shape[1])
        rr = np.arange(e - s)
        for j in range(kk):
            am = d.argmin(axis=1)
            out_i[s:e, j] = am
            out_d[s:e, j] = d[rr, am]
            d[rr, am] = np.inf
        if kk < k:
            out_i[s:e, kk:] = -1
            out_d[s:e, kk:] = np.inf
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
