"""Classical (non-semiring) NumPy golds for each graph algorithm.

The reference gold-checks only single-shot spmv (app/spmv.cpp:144); iterative
apps run unchecked (app/sssp.cpp:243 passes an empty gold). Here every
algorithm has an independent classical implementation to validate the
semiring fixpoint path end-to-end — Dijkstra-free Bellman-Ford for SSSP,
frontier BFS, dense power iteration for PageRank/eigenvector, and iterated
label propagation for SCC-style forward reachability.

Edge convention: ``A[i, j] != 0`` is an edge j → i (so y = A ⊗ x propagates
along edges), matching the SpMV dataflow.
"""

from __future__ import annotations

import numpy as np

from sparseharness_tpu.formats.sparse import COO

FLT_MAX = float(np.finfo(np.float32).max)


def sssp_gold(coo: COO, root: int, max_iter: int | None = None) -> np.ndarray:
    """Bellman-Ford distances from root; unreachable = FLT_MAX (the reference's
    'infinity', README.md:34)."""
    n = coo.shape[0]
    dist = np.full(n, FLT_MAX, dtype=np.float64)
    dist[root] = 0.0
    it = 0
    limit = max_iter if max_iter is not None else n
    changed = True
    while changed and it < limit:
        changed = False
        nd = dist[coo.cols] + coo.vals.astype(np.float64)
        upd = np.full(n, FLT_MAX, dtype=np.float64)
        np.minimum.at(upd, coo.rows, nd)
        new = np.minimum(dist, upd)
        if not np.array_equal(new, dist):
            changed = True
        dist = new
        it += 1
    return np.where(dist >= FLT_MAX, FLT_MAX, dist).astype(np.float32)


def bfs_reach_gold(coo: COO, root: int) -> np.ndarray:
    """Boolean reachability from root (the or/and fixpoint's limit)."""
    n = coo.shape[0]
    reach = np.zeros(n, dtype=bool)
    reach[root] = True
    frontier = np.zeros(n, dtype=bool)
    frontier[root] = True
    while frontier.any():
        nxt = np.zeros(n, dtype=bool)
        hit = frontier[coo.cols]
        np.logical_or.at(nxt, coo.rows, hit)
        frontier = nxt & ~reach
        reach |= frontier
    return reach


def bfs_levels_gold(coo: COO, root: int) -> np.ndarray:
    """BFS level per vertex; -1 = unreachable."""
    n = coo.shape[0]
    level = np.full(n, -1, dtype=np.int32)
    level[root] = 0
    frontier = np.zeros(n, dtype=bool)
    frontier[root] = True
    d = 0
    while frontier.any():
        d += 1
        nxt = np.zeros(n, dtype=bool)
        np.logical_or.at(nxt, coo.rows, frontier[coo.cols])
        frontier = nxt & (level < 0)
        level[frontier] = d
    return level


def pagerank_gold(
    coo: COO, damping: float = 0.85, tol: float = 1e-6, max_iter: int = 1000
) -> np.ndarray:
    """Power iteration on the column-stochastic damped matrix with uniform
    teleport (the intended semantics of app/pr.cpp: x0 = 1/N, β-term =
    (1−d)/N per iteration)."""
    n = coo.shape[0]
    colsum = np.zeros(n, dtype=np.float64)
    np.add.at(colsum, coo.cols, np.abs(coo.vals.astype(np.float64)))
    w = np.abs(coo.vals.astype(np.float64)) / np.where(
        colsum[coo.cols] > 0, colsum[coo.cols], 1.0
    )
    x = np.full(n, 1.0 / n, dtype=np.float64)
    for _ in range(max_iter):
        y = np.zeros(n, dtype=np.float64)
        np.add.at(y, coo.rows, w * x[coo.cols])
        new = damping * y + (1.0 - damping) / n
        if np.abs(new - x).max() < tol:
            x = new
            break
        x = new
    return x.astype(np.float32)


def scc_labels_gold(coo: COO, max_iter: int | None = None) -> np.ndarray:
    """Forward-reachability max-label fixpoint: label[i] = max vertex id that
    can reach i (including itself). Matches the intended semantics of the
    reference's single-direction SCC propagation (app/scc.cpp; full SCC =
    forward ∧ backward intersection, provided by algorithms.scc)."""
    n = coo.shape[0]
    label = np.arange(n, dtype=np.int64)
    limit = max_iter if max_iter is not None else n
    for _ in range(limit):
        upd = np.full(n, -1, dtype=np.int64)
        np.maximum.at(upd, coo.rows, label[coo.cols])
        new = np.maximum(label, upd)
        if np.array_equal(new, label):
            break
        label = new
    return label.astype(np.int32)


def scc_gold(coo: COO) -> np.ndarray:
    """True SCC ids via forward ∧ backward reachability label intersection
    (Tarjan-free, matches the algorithms.scc fixpoint pair)."""
    fwd = scc_labels_gold(coo)
    bwd = scc_labels_gold(coo.transpose())
    # same component iff labels agree in both directions; canonical id = pair
    pair = fwd.astype(np.int64) * coo.shape[0] + bwd
    _, inv = np.unique(pair, return_inverse=True)
    return inv.astype(np.int32)


def eigenvector_gold(
    coo: COO, tol: float = 1e-6, max_iter: int = 1000
) -> np.ndarray:
    """Dominant-eigenvector power iteration with L2 normalization (the
    reference's app/eigenvector.cpp is dead code; this is the real thing)."""
    n = coo.shape[0]
    # deterministic uniform start, shared with algorithms.eigenvector so the
    # two iterate the same sequence
    x = np.full(n, 1.0 / np.sqrt(n), dtype=np.float64)
    for _ in range(max_iter):
        y = np.zeros(n, dtype=np.float64)
        np.add.at(y, coo.rows, coo.vals.astype(np.float64) * x[coo.cols])
        norm = np.linalg.norm(y)
        if norm == 0:
            return y.astype(np.float32)
        y /= norm
        if np.abs(y - x).max() < tol:
            return y.astype(np.float32)
        x = y
    return x.astype(np.float32)


def connected_components_gold(coo: COO) -> np.ndarray:
    """Undirected connected components via min-label propagation (edges
    treated as bidirectional)."""
    n = coo.shape[0]
    label = np.arange(n, dtype=np.int64)
    rows = np.concatenate([coo.rows, coo.cols])
    cols = np.concatenate([coo.cols, coo.rows])
    for _ in range(n):
        upd = np.full(n, n + 1, dtype=np.int64)
        np.minimum.at(upd, rows, label[cols])
        new = np.minimum(label, upd)
        if np.array_equal(new, label):
            break
        label = new
    return label.astype(np.int32)


def widest_path_gold(coo: COO, root: int) -> np.ndarray:
    """Max-min (bottleneck) path widths from root; unreachable = -FLT_MAX,
    root = +FLT_MAX (the ⊗-identity)."""
    n = coo.shape[0]
    lo = float(-np.finfo(np.float32).max)
    hi = float(np.finfo(np.float32).max)
    width = np.full(n, lo, dtype=np.float64)
    width[root] = hi
    for _ in range(n):
        cand = np.minimum(width[coo.cols], coo.vals.astype(np.float64))
        upd = np.full(n, lo, dtype=np.float64)
        np.maximum.at(upd, coo.rows, cand)
        new = np.maximum(width, upd)
        if np.array_equal(new, width):
            break
        width = new
    return width.astype(np.float32)
