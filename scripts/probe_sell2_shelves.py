#!/usr/bin/env python
"""Probe: two-shelf interval packing for sell2 sublanes.

Two layers ("shelves") of block intervals over the sublane axis; each
sublane is covered by <=1 interval per shelf => <=2 block bindings, which
is exactly what the layout's per-sublane blk0/blk1 fields support. Blocks
sorted by demand descending; each block goes at the shorter shelf's
frontier, pushed forward until its lane piles fit the actual free cells
(exact occupancy bookkeeping). Optionally small blocks backfill earlier
holes.
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


def twoshelf_pool(cnt, max_push=64, backfill=True):
    """Pack one chunk-pool; returns sublanes used."""
    demand = cnt.max(axis=1)
    order = np.argsort(-demand, kind="stable")
    order = order[demand[order] > 0]
    if not len(order):
        return 0
    cap = int(demand.sum())
    occ = np.zeros((cap, LANES), bool)
    frontier = [0, 0]
    holes = []          # (start, end) fully-uncovered-by-either-shelf? no:
    # holes are per-shelf uncovered spans created by pushes
    shelf_holes = [[], []]
    for bi in order:
        h = cnt[bi]
        d = int(demand[bi])
        placed = False
        if backfill:
            # try existing holes (either shelf) smallest-first
            for sh in (0, 1):
                for k, (h0, h1) in enumerate(shelf_holes[sh]):
                    if h1 - h0 < d:
                        continue
                    o = h0
                    # scan positions within the hole
                    while o + d <= h1:
                        win = occ[o:o + d]
                        freec = d - win.sum(axis=0)
                        if np.all(freec >= h):
                            break
                        o += 1
                    else:
                        continue
                    # place at o
                    for l in np.nonzero(h)[0]:
                        rows = np.nonzero(~occ[o:o + d, l])[0][: h[l]]
                        occ[o + rows, l] = True
                    # shrink hole
                    new = []
                    if o > h0:
                        new.append((h0, o))
                    if o + d < h1:
                        new.append((o + d, h1))
                    shelf_holes[sh][k:k + 1] = new
                    placed = True
                    break
                if placed:
                    break
        if placed:
            continue
        sh = 0 if frontier[0] <= frontier[1] else 1
        o = frontier[sh]
        pushes = 0
        while pushes < max_push:
            win = occ[o:o + d]
            freec = d - win.sum(axis=0)
            if np.all(freec >= h):
                break
            o += 1
            pushes += 1
        else:
            # give up pushing: place beyond both frontiers (fresh ground)
            o = max(frontier[0], frontier[1])
        for l in np.nonzero(h)[0]:
            rows = np.nonzero(~occ[o:o + d, l])[0][: h[l]]
            occ[o + rows, l] = True
        if o > frontier[sh]:
            shelf_holes[sh].append((frontier[sh], o))
        frontier[sh] = o + d
    return max(frontier)


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

    for backfill in (False, True):
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
                tot += twoshelf_pool(cnt_b[sel], backfill=backfill)
        print(f"twoshelf backfill={backfill}: {tot} sublanes  "
              f"{tot*LANES/nnz:.3f} slots/nnz  ({time.time()-tw:.1f}s)",
              flush=True)
    print("(r3 pairing 2.129; hh64 2.007; sum-demand/2 floor 1.532)")
    print(f"total {time.time()-t0:.1f}s")


if __name__ == "__main__":
    main()
