#!/usr/bin/env python
"""Probe: two-layer first-fit skyline packing for sell2 sublanes.

The layout already supports per-SUBLANE block bindings (blk0/blk1 ride
wordB per stream sublane), so the r3 all-or-nothing block *pairing* is
needlessly rigid: a heavy block's d_b sublanes can each carry a different
second block, absorbing the light tail into the heavy blocks' slack.
Model: sublanes are bins with 128 lane-cells and <=2 block bindings;
process blocks by demand descending; for each block find the earliest
prefix of open sublanes whose per-lane free-cell counts cover the block's
lane histogram; place, else append fresh sublanes.

Reports total sublanes vs the r3 pairing and the sum-demand/2 floor.
"""

import sys
import os
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparseharness_tpu.formats import power_law_coo
from sparseharness_tpu.formats.sparse import fold_duplicates, round_up
from sparseharness_tpu.ops.pallas_sell2 import (
    CHUNK_COLS, LANES, SLAB_ROWS, SPLIT_T, VIRT_DEMAND_T,
)


def firstfit_pool(cnt, window=256):
    """Pack one chunk-pool's blocks (cnt: nb x 128 lane histograms).

    Returns total sublanes used. window caps how many open sublanes are
    scanned per block (first-fit prefix search).
    """
    nb = cnt.shape[0]
    order = np.argsort(-cnt.max(axis=1), kind="stable")
    cap = int(cnt.max(axis=1).sum())  # worst case: no sharing
    occ = np.zeros((cap, LANES), bool)
    bind = np.zeros(cap, np.int8)
    n_sub = 0                          # sublanes allocated so far
    open_list = []                     # indices with bind<2, maybe free cells
    for bi in order:
        h = cnt[bi]
        d = int(h.max())
        if d == 0:
            continue
        placed = False
        if open_list:
            ol = np.asarray(open_list[:window])
            free = (~occ[ol]) & (bind[ol] < 2)[:, None]
            cum = np.cumsum(free, axis=0)
            ok = np.all(cum >= h[None, :], axis=1)
            hit = np.argmax(ok) if ok.any() else -1
            if hit >= 0:
                S = ol[: hit + 1]
                # assign: per lane fill from the START of S (keeps early
                # sublanes fullest -> they leave open_list sooner)
                freeS = free[: hit + 1]
                csum = np.cumsum(freeS, axis=0)
                take = freeS & (csum <= h[None, :])
                rows_t, lanes_t = np.nonzero(take)
                occ[S[rows_t], lanes_t] = True
                used_rows = np.unique(S[rows_t])
                bind[used_rows] += 1
                # drop closed sublanes from open_list
                open_list = [s for s in open_list
                             if bind[s] < 2 and not occ[s].all()]
                placed = True
        if not placed:
            S = np.arange(n_sub, n_sub + d)
            n_sub += d
            pos = np.nonzero(h > 0)[0]
            for l in pos:
                occ[S[: h[l]], l] = True
            bind[S] += 1
            open_list.extend(int(s) for s in S)
    return n_sub, occ[:n_sub], bind[:n_sub]


def main():
    t0 = time.time()
    big = power_law_coo(500_000, 2_000_000, alpha=1.5, seed=13)
    coo = fold_duplicates(big, lambda a, b: a + b)
    nnz = coo.nnz
    print(f"matrix: n={coo.shape[0]} nnz={nnz}")

    s = coo.sorted_by_row()
    n = coo.shape[0]
    base_pad = round_up(max(n, 1), 1024)
    lens = np.bincount(s.rows, minlength=n).astype(np.int64)
    heavy = np.nonzero(lens > SPLIT_T)[0]
    indptr0 = np.zeros(n + 1, np.int64)
    np.cumsum(lens, out=indptr0[1:])
    rows_k = s.rows.astype(np.int64)
    if heavy.size:
        p_r = -(-lens[heavy] // SPLIT_T)
        ov_off = np.cumsum(p_r) - p_r
        rank = np.arange(s.nnz, dtype=np.int64) - indptr0[s.rows]
        is_h = lens[s.rows] > SPLIT_T
        hidx = np.searchsorted(heavy, s.rows[is_h])
        rows_k[is_h] = base_pad + ov_off[hidx] + rank[is_h] % p_r[hidx]
        n_tot = base_pad + int(p_r.sum())
        order0 = np.lexsort((s.cols, rows_k))
        k_rows = rows_k[order0]
        k_cols = s.cols.astype(np.int64)[order0]
    else:
        n_tot = n
        k_rows = rows_k
        k_cols = s.cols.astype(np.int64)
    n_pad = round_up(max(n_tot, 1), 1024)
    n_chunks = round_up(max(coo.shape[1], 1), CHUNK_COLS) // CHUNK_COLS
    indptr = np.zeros(n_tot + 1, np.int64)
    np.cumsum(np.bincount(k_rows, minlength=n_tot), out=indptr[1:])

    totals = {}
    for wname, window in (("w128", 128), ("w512", 512)):
        tot = 0
        tw = time.time()
        for r0 in range(0, n_pad, SLAB_ROWS):
            e0 = int(indptr[min(r0, n_tot)])
            e1 = int(indptr[min(r0 + SLAB_ROWS, n_tot)])
            if e1 == e0:
                continue
            rows_e = k_rows[e0:e1] - r0
            cols_e = k_cols[e0:e1]
            lane = (rows_e % LANES).astype(np.int64)
            gb = cols_e // LANES
            gbu, gbi = np.unique(gb, return_inverse=True)
            cnt_b = np.zeros((len(gbu), LANES), np.int64)
            np.add.at(cnt_b, (gbi, lane), 1)
            dem_b = cnt_b.max(axis=1)
            chu = gbu // LANES
            dem_c = np.zeros(int(chu.max()) + 1, np.int64)
            np.add.at(dem_c, chu, dem_b)
            light_b = dem_c[chu] <= VIRT_DEMAND_T
            echunk = chu.copy()
            if np.unique(chu[light_b]).size >= 2:
                lb = np.nonzero(light_b)[0]
                vid = np.arange(lb.size, dtype=np.int64)
                echunk[lb] = n_chunks + vid // LANES
            for ch in np.unique(echunk):
                sel = echunk == ch
                ns, _, _ = firstfit_pool(cnt_b[sel], window)
                tot += ns
        totals[wname] = tot
        print(f"  {wname}: {tot} sublanes  {tot*LANES/nnz:.3f} slots/nnz"
              f"  ({time.time()-tw:.1f}s)", flush=True)

    print(f"\nr3 pairing: 28508 (2.129)   sum-demand/2 floor: 20492 (1.531)")
    print(f"total {time.time()-t0:.1f}s")


if __name__ == "__main__":
    main()
