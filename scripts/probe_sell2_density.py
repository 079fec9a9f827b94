#!/usr/bin/env python
"""Quantify the sell2 stream-packing decomposition on the zipf bench matrix
(VERDICT r3 next #1): where do the 2.27 slots/nnz go, and what would
(a) stronger block pairing and (b) within-128-row-group row permutation
(lane rebalancing) each buy?  Pure NumPy — replicates the builder's
demand accounting without building the kernel arrays.

Definitions per slab (32K rows):
  cnt[b, l]   entries of (virtual-)block b in row-lane class l = row % 128
  demand_b    max_l cnt[b, l]         (sublanes block b must touch)
  T[l]        sum_b cnt[b, l]         (entries per lane)
Floors (x128 slots / nnz):
  lane floor       sum_slab max_l T[l]          -- fixed row->lane map
  binding floor    sum_b ceil(demand_b odd pairing) / 2  (<=2 blocks/sublane)
  balanced floors  same with cnt[b,.] flattened (ceil(E_b/128))
"""

import sys
import os
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparseharness_tpu.formats import power_law_coo
from sparseharness_tpu.formats.sparse import fold_duplicates, round_up
from sparseharness_tpu.ops.pallas_sell2 import (
    CHUNK_COLS, LANES, SLAB_ROWS, SPLIT_T, USABLE, VIRT_DEMAND_T, build_sell2,
)
from sparseharness_tpu.semiring import PLUS_TIMES


def pair_greedy(cnt, chunk_of_b, window=16):
    """The builder's windowed greedy pairing; returns total pair demand."""
    total = 0
    npairs = 0
    demand = cnt.max(axis=1)
    for ch in np.unique(chunk_of_b):
        idx = np.nonzero(chunk_of_b == ch)[0]
        idx = idx[np.argsort(-demand[idx], kind="stable")]
        alive = np.ones(len(idx), bool)
        fi, bi = 0, len(idx) - 1
        while fi <= bi:
            if not alive[fi]:
                fi += 1
                continue
            a = idx[fi]
            alive[fi] = False
            cand_pos = []
            p = bi
            while p > fi and len(cand_pos) < window:
                if alive[p]:
                    cand_pos.append(p)
                p -= 1
            if cand_pos:
                cands = idx[cand_pos]
                costs = (cnt[a] + cnt[cands]).max(axis=1)
                k = int(np.argmin(costs))
                b = int(cands[k])
                alive[cand_pos[k]] = False
                while bi > fi and not alive[bi]:
                    bi -= 1
                total += int((cnt[a] + cnt[b]).max())
            else:
                total += int(cnt[a].max())
            npairs += 1
    return total, npairs


def slab_stats(rows_e, cols_e, n_chunks):
    """Per-slab histograms with the builder's virtual-chunk regrouping."""
    lane = rows_e % LANES
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
    return cnt_b, echunk, lane, gbi


def main():
    t0 = time.time()
    big = power_law_coo(500_000, 2_000_000, alpha=1.5, seed=13)
    coo = fold_duplicates(big, lambda a, b: a + b)
    print(f"matrix: n={coo.shape[0]} nnz={coo.nnz}")

    # actual builder slot count
    op = build_sell2(coo, PLUS_TIMES)
    slots = sum(lay.panels for lay in op.layouts) * LANES * LANES
    print(f"builder: {slots} slots  {slots/coo.nnz:.3f} slots/nnz  "
          f"({time.time()-t0:.1f}s)")

    # replicate the heavy-row split + slab partition
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

    agg = dict(lane_floor=0, bind_floor=0, bind_bal=0, lane_bal=0,
               pair_cur=0, pair_bal=0, nblocks=0, npairs=0,
               singles=0, singles_e=0)
    for r0 in range(0, n_pad, SLAB_ROWS):
        e0 = int(indptr[min(r0, n_tot)])
        e1 = int(indptr[min(r0 + SLAB_ROWS, n_tot)])
        if e1 == e0:
            continue
        rows_e = k_rows[e0:e1] - r0
        cols_e = k_cols[e0:e1]
        cnt_b, echunk, lane, gbi = slab_stats(rows_e, cols_e, n_chunks)
        E_b = cnt_b.sum(axis=1)
        demand = cnt_b.max(axis=1)
        T = np.bincount(lane, minlength=LANES)

        agg["lane_floor"] += int(T.max())
        agg["lane_bal"] += int(-(-T.sum() // USABLE))
        # binding floor: each sublane touches <=2 blocks
        agg["bind_floor"] += int(-(-int(demand.sum()) // 2))
        dem_bal = np.maximum(-(-E_b // LANES), 1)
        agg["bind_bal"] += int(-(-int(dem_bal.sum()) // 2))
        agg["nblocks"] += len(E_b)
        agg["singles"] += int((E_b <= 2).sum())
        agg["singles_e"] += int(E_b[E_b <= 2].sum())

        # current pairing on real histograms
        pc, npr = pair_greedy(cnt_b, echunk)
        agg["pair_cur"] += pc
        agg["npairs"] += npr
        # pairing on BALANCED histograms (flat = E_b/128 spread):
        # pair demand ~= ceil((E_a + E_b)/128) -> simulate with flat cnt
        flat = np.zeros_like(cnt_b)
        q, r = divmod(E_b, LANES)
        flat[:] = q[:, None]
        iota = np.arange(LANES)
        flat += (iota[None, :] < r[:, None])
        pb, _ = pair_greedy(flat, echunk)
        agg["pair_bal"] += pb

    nnz = coo.nnz
    print(f"\nper-slab sublane totals (x128/nnz = slots/nnz):")
    for k in ("lane_floor", "lane_bal", "bind_floor", "bind_bal",
              "pair_cur", "pair_bal"):
        print(f"  {k:12s} {agg[k]:8d} sublanes  "
              f"{agg[k]*LANES/nnz:6.3f} slots/nnz")
    print(f"  blocks {agg['nblocks']}  pairs {agg['npairs']}  "
          f"singleton-ish blocks (E<=2): {agg['singles']} "
          f"({agg['singles_e']} entries, "
          f"{agg['singles_e']/nnz*100:.1f}% of nnz)")
    print(f"total {time.time()-t0:.1f}s")


if __name__ == "__main__":
    main()
