"""Synthetic matrix/graph generators for tests and benchmarks.

The reference ships five SuiteSparse matrices as fixed workloads
(example/matrix*.mtx); for TPU-scale benchmarking we additionally need
generators that reach SuiteSparse-scale sizes (BASELINE.json: "SuiteSparse-
scale matrices") without shipping data files.
"""

from __future__ import annotations

import numpy as np

from sparseharness_tpu.formats.sparse import COO, coo_from_arrays


def _dedup(rows, cols, vals, shape) -> COO:
    key = rows.astype(np.int64) * shape[1] + cols
    _, idx = np.unique(key, return_index=True)
    return coo_from_arrays(rows[idx], cols[idx], vals[idx], shape)


def random_coo(
    n_rows: int,
    n_cols: int,
    nnz: int,
    dtype=np.float32,
    seed: int = 0,
    value_range=(0.1, 1.0),
) -> COO:
    """Uniform-random sparsity pattern; duplicates removed (nnz may shrink)."""
    rng = np.random.default_rng(seed)
    rows = rng.integers(0, n_rows, size=nnz, dtype=np.int64)
    cols = rng.integers(0, n_cols, size=nnz, dtype=np.int64)
    vals = rng.uniform(*value_range, size=nnz).astype(dtype)
    return _dedup(rows, cols, vals, (n_rows, n_cols))


def random_graph_coo(
    n: int,
    avg_degree: float,
    dtype=np.float32,
    seed: int = 0,
    weight_range=(0.1, 1.0),
    connected: bool = True,
) -> COO:
    """Random directed graph adjacency; optionally chained for connectivity."""
    rng = np.random.default_rng(seed)
    m = int(n * avg_degree)
    rows = rng.integers(0, n, size=m, dtype=np.int64)
    cols = rng.integers(0, n, size=m, dtype=np.int64)
    if connected and n > 1:
        # add a hamiltonian-ish chain so every vertex is reachable from 0
        chain_src = np.arange(n - 1, dtype=np.int64)
        chain_dst = chain_src + 1
        rows = np.concatenate([rows, chain_dst])  # edge dst→... A[i,j]: j→i
        cols = np.concatenate([cols, chain_src])
    vals = rng.uniform(*weight_range, size=len(rows)).astype(dtype)
    return _dedup(rows, cols, vals, (n, n))


def banded_coo(n: int, bandwidth: int, dtype=np.float32, seed: int = 0) -> COO:
    """Banded matrix — the regular-structure end of the sweep spectrum."""
    rng = np.random.default_rng(seed)
    offs = np.arange(-bandwidth, bandwidth + 1)
    rows_list, cols_list = [], []
    for o in offs:
        r = np.arange(max(0, -o), min(n, n - o), dtype=np.int64)
        rows_list.append(r)
        cols_list.append(r + o)
    rows = np.concatenate(rows_list)
    cols = np.concatenate(cols_list)
    vals = rng.uniform(0.1, 1.0, size=len(rows)).astype(dtype)
    return _dedup(rows, cols, vals, (n, n))


def power_law_coo(
    n: int,
    nnz: int,
    alpha: float = 1.5,
    dtype=np.float32,
    seed: int = 0,
) -> COO:
    """Power-law (scale-free-ish) pattern — the ragged-row stress case that
    motivates the reference's split/chunk kernel schedules
    (example/kernel3.json splitSize, kernel6.json chunkSize)."""
    rng = np.random.default_rng(seed)
    # zipf-distributed column popularity, uniform rows
    ranks = rng.zipf(alpha, size=nnz).astype(np.int64)
    cols = np.minimum(ranks - 1, n - 1)
    rows = rng.integers(0, n, size=nnz, dtype=np.int64)
    # also make some rows heavy by swapping with probability .5
    swap = rng.random(nnz) < 0.5
    rows2 = np.where(swap, cols, rows)
    cols2 = np.where(swap, rows, cols)
    vals = rng.uniform(0.1, 1.0, size=nnz).astype(dtype)
    return _dedup(rows2, cols2, vals, (n, n))


def chained_power_law_coo(
    n: int,
    clusters: int,
    nnz_per_node: float = 4.0,
    alpha: float = 1.5,
    dtype=np.float32,
    seed: int = 0,
    weight_range=(0.1, 1.0),
) -> COO:
    """``clusters`` power-law blobs strung on a path with bidirectional
    bridge edges — scattered local structure with a diameter that scales
    with ``clusters``. The long-diameter benchmark shape: BFS/SSSP run
    O(clusters) iterations with cluster-sized frontiers, so iteration-
    capped two-point timing has caps that bind (a flat zipf blob
    converges in a handful of sweeps).

    The returned order is ``clusters * max(n // clusters, 2)`` — smaller
    than ``n`` when ``n`` is not divisible by ``clusters`` and larger
    when ``n < 2 * clusters`` (every cluster holds at least 2 nodes so
    the bridge edges exist); read the size off ``.shape``, not ``n``."""
    rng = np.random.default_rng(seed)
    m = max(n // clusters, 2)
    sub = power_law_coo(m, int(nnz_per_node * m), alpha=alpha, seed=seed + 1)
    lo, hi = weight_range
    rows = [
        np.concatenate([sub.rows.astype(np.int64) + ci * m
                        for ci in range(clusters)])
    ]
    cols = [
        np.concatenate([sub.cols.astype(np.int64) + ci * m
                        for ci in range(clusters)])
    ]
    vals = [np.tile(np.abs(sub.vals).astype(dtype) + lo, clusters)]
    link = np.arange(1, clusters, dtype=np.int64) * m
    rows.append(np.concatenate([link, link - 1]))
    cols.append(np.concatenate([link - 1, link]))
    vals.append(np.full(2 * link.size, (lo + hi) / 2, dtype))
    n_tot = clusters * m
    return _dedup(
        np.concatenate(rows), np.concatenate(cols), np.concatenate(vals),
        (n_tot, n_tot),
    )


def block_random_coo(
    n: int,
    blocks_per_row: int,
    bm: int = 8,
    bn: int = 128,
    dtype=np.float32,
    seed: int = 0,
    value_range=(0.1, 1.0),
) -> COO:
    """Block-structured random sparsity: every (bm-row) block-row gets
    ``blocks_per_row`` dense (bm, bn) blocks at distinct random block
    columns — the FEM/graph-contraction structure BSR layouts exist for
    (each stored tile is fully occupied, so tile layouts pay no padding)."""
    rng = np.random.default_rng(seed)
    n_br = max(n // bm, 1)
    n_bc = max(n // bn, 1)
    k = min(blocks_per_row, n_bc)
    # distinct block-cols per block-row via argpartition of random keys
    keys = rng.random((n_br, n_bc))
    bcols = np.argpartition(keys, k - 1, axis=1)[:, :k]  # (n_br, k)
    br = np.repeat(np.arange(n_br, dtype=np.int64), k)
    bc = bcols.reshape(-1).astype(np.int64)
    # expand each block to its bm*bn entries
    rr = (br[:, None] * bm + np.arange(bm)[None, :]).reshape(-1)
    rows = np.repeat(rr, bn)
    cc = (bc[:, None] * bn + np.arange(bn)[None, :])
    cols = np.tile(cc.reshape(len(br), 1, bn), (1, bm, 1)).reshape(-1)
    vals = rng.uniform(*value_range, size=len(rows)).astype(dtype)
    keep = (rows < n) & (cols < n)
    return coo_from_arrays(rows[keep], cols[keep], vals[keep], (n, n))
