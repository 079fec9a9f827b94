#!/usr/bin/env python
"""A/B the sell2 stream-packing levers host-side (no TPU): pairing
strategies on real (block, row-lane) histograms, then a pair-aware
within-128-row-group row permutation (lane water-filling), measuring the
resulting total pair sublane demand = stream slots.

Builds on probe_sell2_density.py's finding: pairing inefficiency
(2.129 vs the 1.531 sum-demand/2 floor) + per-block histogram unevenness
(1.531 vs 0.979 balanced floor) are the two big terms; flattening blocks
independently is counterproductive (flat+flat collide everywhere: 1.958).
"""

import sys
import os
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparseharness_tpu.formats import power_law_coo
from sparseharness_tpu.formats.sparse import fold_duplicates, round_up
from sparseharness_tpu.ops.pallas_sell2 import (
    CHUNK_COLS, LANES, SLAB_ROWS, SPLIT_T, USABLE, VIRT_DEMAND_T,
)

rng = np.random.default_rng(0)


def pair_heavy_light(cnt, chunk_of_b, window=16):
    """Builder r3 greedy: heaviest + least-colliding of the W lightest."""
    pairs = []
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
                pairs.append((a, b))
            else:
                pairs.append((a, -1))
    return pairs


def pair_heavy_heavy(cnt, chunk_of_b, window=16):
    """Heaviest + least-colliding among the W next-heaviest alive."""
    pairs = []
    demand = cnt.max(axis=1)
    for ch in np.unique(chunk_of_b):
        idx = np.nonzero(chunk_of_b == ch)[0]
        idx = idx[np.argsort(-demand[idx], kind="stable")]
        alive = np.ones(len(idx), bool)
        fi = 0
        while fi < len(idx):
            if not alive[fi]:
                fi += 1
                continue
            a = idx[fi]
            alive[fi] = False
            cand_pos = []
            p = fi + 1
            while p < len(idx) and len(cand_pos) < window:
                if alive[p]:
                    cand_pos.append(p)
                p += 1
            if cand_pos:
                cands = idx[cand_pos]
                costs = (cnt[a] + cnt[cands]).max(axis=1)
                k = int(np.argmin(costs))
                b = int(cands[k])
                alive[cand_pos[k]] = False
                pairs.append((a, b))
            else:
                pairs.append((a, -1))
    return pairs


def pair_demand(cnt, pairs):
    tot = 0
    for a, b in pairs:
        h = cnt[a] if b < 0 else cnt[a] + cnt[b]
        tot += int(h.max())
    return tot


def permute_groups(ent_grp, ent_lam, ent_pair, npairs, rounds=1,
                   pair_fn=None, cnt=None, chunk_of_b=None, block_of=None):
    """Greedy per-group lane assignment minimizing sum_p H[p,l]*c.

    ent_*: per-entry group (0..255), lambda (row%128), pair id.
    Returns per-group perm lam->lane and the final pair histograms.
    """
    n_grp = int(ent_grp.max()) + 1
    H = np.zeros((npairs, LANES), np.int64)
    perm = np.tile(np.arange(LANES), (n_grp, 1))
    order_g = np.argsort(ent_grp, kind="stable")
    g_sorted = ent_grp[order_g]
    starts = np.r_[0, 1 + np.nonzero(np.diff(g_sorted))[0], len(g_sorted)]
    gids = g_sorted[starts[:-1]]
    for gi, s0, s1 in zip(gids, starts[:-1], starts[1:]):
        e = order_g[s0:s1]
        lam = ent_lam[e]
        pr = ent_pair[e]
        # W[lam, p] counts for touched pairs
        pu, pinv = np.unique(pr, return_inverse=True)
        W = np.zeros((LANES, len(pu)), np.float32)
        np.add.at(W, (lam, pinv), 1.0)
        touched = W.sum(axis=1) > 0
        C = W @ H[pu].astype(np.float32)        # (128 lam, 128 lanes)
        # greedy: heaviest class first, argmin available lane
        wsum = W.sum(axis=1)
        lam_order = np.argsort(-wsum, kind="stable")
        used = np.zeros(LANES, bool)
        pg = np.full(LANES, -1, np.int64)
        for lm in lam_order:
            if wsum[lm] == 0:
                continue
            c = C[lm].copy()
            c[used] = np.inf
            l = int(np.argmin(c))
            pg[lm] = l
            used[l] = True
        free = np.nonzero(~used)[0]
        pg[pg < 0] = free[: int((pg < 0).sum())]
        perm[gi] = pg
        np.add.at(H, (pr, pg[lam]), 1)
    return perm, H


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

    res = {}
    for r0 in range(0, n_pad, SLAB_ROWS):
        e0 = int(indptr[min(r0, n_tot)])
        e1 = int(indptr[min(r0 + SLAB_ROWS, n_tot)])
        if e1 == e0:
            continue
        rows_e = k_rows[e0:e1] - r0
        cols_e = k_cols[e0:e1]
        lane = (rows_e % LANES).astype(np.int64)
        grp = rows_e // LANES
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

        for name, fn, w in (
            ("hl16 (r3)", pair_heavy_light, 16),
            ("hh16", pair_heavy_heavy, 16),
            ("hh64", pair_heavy_heavy, 64),
        ):
            pairs = fn(cnt_b, echunk, w)
            res.setdefault(name, 0)
            res[name] += pair_demand(cnt_b, pairs)

        # pair-aware permutation: pair with hh64, then water-fill groups
        pairs = pair_heavy_heavy(cnt_b, echunk, 64)
        pair_of = np.zeros(len(gbu), np.int64)
        for pi, (a, b) in enumerate(pairs):
            pair_of[a] = pi
            if b >= 0:
                pair_of[b] = pi
        ent_pair = pair_of[gbi]
        perm, H = permute_groups(grp, lane, ent_pair, len(pairs))
        res.setdefault("hh64+perm", 0)
        res["hh64+perm"] += int(H.max(axis=1).sum())

        # round 2: re-pair on permuted block histograms, permute again
        lane2 = np.zeros_like(lane)
        for gi in range(perm.shape[0]):
            pass
        lane2 = perm[grp, lane]
        cnt_b2 = np.zeros_like(cnt_b)
        np.add.at(cnt_b2, (gbi, lane2), 1)
        pairs2 = pair_heavy_heavy(cnt_b2, echunk, 64)
        res.setdefault("hh64+perm+rp", 0)
        res["hh64+perm+rp"] += pair_demand(cnt_b2, pairs2)
        pair_of2 = np.zeros(len(gbu), np.int64)
        for pi, (a, b) in enumerate(pairs2):
            pair_of2[a] = pi
            if b >= 0:
                pair_of2[b] = pi
        perm2, H2 = permute_groups(grp, lane, pair_of2[gbi], len(pairs2))
        res.setdefault("hh64+rp+perm2", 0)
        res["hh64+rp+perm2"] += int(H2.max(axis=1).sum())
        print(f"  slab@{r0} done {time.time()-t0:.1f}s", flush=True)

    print("\ntotal sublane demand (x128/nnz = slots/nnz):")
    for k, v in res.items():
        print(f"  {k:16s} {v:8d}  {v*LANES/nnz:6.3f} slots/nnz")
    print(f"total {time.time()-t0:.1f}s")


if __name__ == "__main__":
    main()
