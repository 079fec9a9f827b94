#!/usr/bin/env python
"""Probe: host-group packing for sell2 sublanes.

Take the heaviest unplaced block A as *host* of a group with S = d_A
sublanes. Admit partner blocks Bi (each occupying a distinct slice of
size d_Bi) while:
  (2) per-lane combined histogram cnt_A + sum_i cnt_Bi <= S   (cell fit)
  (3) sum_i d_Bi <= S                                          (slice fit)
Feasibility: partners live in their slice; host fills leftover cells
across slices (per-lane transportation, always feasible given (2)).
Cost per group = S. This generalizes pairing (every sublane can reach
2 bindings) without smearing footprints; no kernel change needed since
blk0/blk1 already ride per-sublane.
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


def hostgroups_pool(cnt, scan_cap=512):
    """Pack one chunk-pool. Returns total sublanes."""
    demand = cnt.max(axis=1)
    order = np.argsort(-demand, kind="stable")
    order = order[demand[order] > 0]
    alive = np.ones(len(order), bool)
    total = 0
    for i in range(len(order)):
        if not alive[i]:
            continue
        alive[i] = False
        a = order[i]
        S = int(demand[a])
        comb = cnt[a].copy()
        budget = S
        scanned = 0
        for j in range(i + 1, len(order)):
            if budget == 0 or scanned >= scan_cap:
                break
            if not alive[j]:
                continue
            scanned += 1
            b = order[j]
            db = int(demand[b])
            if db > budget:
                continue
            nc = comb + cnt[b]
            if int(nc.max()) <= S:
                comb = nc
                budget -= db
                alive[j] = False
        total += S
    return total


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

    tot = 0
    tot_floor = 0
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
            tot += hostgroups_pool(cnt_b[sel])
            tot_floor += int(-(-int(dem_b[sel].sum()) // 2))
    print(f"hostgroups: {tot} sublanes  {tot*LANES/nnz:.3f} slots/nnz")
    print(f"(r3 pairing 2.129; hh64 2.007; sum-demand/2 floor "
          f"{tot_floor*LANES/nnz:.3f})")
    print(f"total {time.time()-t0:.1f}s")


if __name__ == "__main__":
    main()
