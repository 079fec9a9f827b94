"""Chip evidence for the sharded batched-SpMM Pallas path (VERDICT r4
weak/next #4): ``--roots --mesh`` local compute is the strip tile-SpMM
kernel (parallel/sharded_spmm.py), measured against the ELL-gather path
it replaces.

Workloads (blocked structure — the tile layout's home):
  block    — 131k-row random-block matrix (33.5M nnz), full multi-SSSP
             solve from 8 roots, gold-checked per root
  chained  — 128 chained block clusters (long diameter), per-iteration
             MARGINAL via the min-wall two-point method over binding caps
             (solver factories prebuilt; fixed costs cancel; caps_reached
             recorded — the r3 clock-discipline rules)

Writes results/sharded_spmm_tpu.json. Run from /root/repo on TPU.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/sh_tpu_jax_cache")

from sparseharness_tpu.formats import block_random_coo
from sparseharness_tpu.formats.sparse import COO
from sparseharness_tpu.gold import sssp_gold
from sparseharness_tpu.parallel import make_mesh, sharded_multi_sssp


def chained_block_coo(clusters: int, m: int, seed: int = 0) -> COO:
    rr, cc, vv = [], [], []
    for ci in range(clusters):
        sub = block_random_coo(m, blocks_per_row=2, bm=8, bn=128,
                               seed=seed + ci)
        rr.append(sub.rows.astype(np.int64) + ci * m)
        cc.append(sub.cols.astype(np.int64) + ci * m)
        vv.append(np.abs(sub.vals) + 0.05)
    link = np.arange(1, clusters, dtype=np.int64) * m
    rr.append(link); cc.append(link - 1)
    rr.append(link - 1); cc.append(link)
    vv.append(np.full(link.size, 0.5, np.float32))
    vv.append(np.full(link.size, 0.5, np.float32))
    n = clusters * m
    return COO(np.concatenate(rr).astype(np.int32),
               np.concatenate(cc).astype(np.int32),
               np.concatenate(vv).astype(np.float32), (n, n))


def sync(res):
    np.asarray(np.asarray(res.x).ravel()[:1])
    return res


def main() -> int:
    on_tpu = jax.default_backend() == "tpu"
    report = {"backend": jax.default_backend()}
    mesh = make_mesh(1)
    roots = [0, 17, 4099, 65537, 9000, 23456, 100001, 130000] \
        if on_tpu else [0, 5]

    # ---- full solve + gold, blocked workload --------------------------
    n = 131072 if on_tpu else 2048
    g = block_random_coo(n, blocks_per_row=2, bm=8, bn=128, seed=5)
    g = g.with_values(np.abs(g.vals) + 0.05)
    roots = [r for r in roots if r < n]
    gold = np.stack([sssp_gold(g, r) for r in roots], axis=1)
    solves = {}
    for mode in ("tiles", "gather"):
        try:
            solver = sharded_multi_sssp(g, roots, mesh=mesh, mode=mode,
                                        return_solver=True)
            res = sync(solver())                # compile + converge
            ok = bool(np.allclose(np.asarray(res.x), gold, rtol=1e-5,
                                  atol=1e-5))
            walls = []
            for _ in range(3):
                t0 = time.perf_counter()
                res = sync(solver())
                walls.append(time.perf_counter() - t0)
            solves[mode] = {
                "wall_ms": round(float(np.median(walls)) * 1e3, 2),
                "iterations": int(res.iterations),
                "outputs_match_gold": ok,
            }
        except Exception as e:  # noqa: BLE001 — survey artifact
            # the ELL row-gather fallback crashes the remote compile
            # helper at this scale (HTTP 500) — recorded: the Pallas
            # tiles path works where the fallback compute cannot build
            solves[mode] = {"error": f"{type(e).__name__}: {e}"[:200]}
        print(mode, solves[mode], flush=True)
    report["block_full_solve"] = {
        "matrix": f"block n={n} nnz={g.nnz} roots={len(roots)}",
        **solves,
    }

    # ---- per-iteration marginal, chained long-diameter workload -------
    # smaller than the full-solve workload: the gather path's compile
    # crashes at 131k x 33.5M, so the marginal pair runs at a scale both
    # paths build
    C = 64 if on_tpu else 8
    m = 512 if on_tpu else 256
    gch = chained_block_coo(C, m, seed=9)
    k1, k2 = (32, 96) if on_tpu else (4, 8)
    marg = {}
    for mode in ("tiles", "gather"):
        s1 = sharded_multi_sssp(gch, [0, 17], mesh=mesh,
                                mode=mode, max_iter=k1, return_solver=True)
        s2 = sharded_multi_sssp(gch, [0, 17], mesh=mesh,
                                mode=mode, max_iter=k2, return_solver=True)
        r1, r2 = sync(s1()), sync(s2())
        w1 = w2 = np.inf
        for _ in range(3):
            t0 = time.perf_counter(); sync(s1())
            w1 = min(w1, time.perf_counter() - t0)
            t0 = time.perf_counter(); sync(s2())
            w2 = min(w2, time.perf_counter() - t0)
        marg[mode] = {
            "marginal_ms_per_iter": round((w2 - w1) / (k2 - k1) * 1e3, 3),
            "caps_reached": (int(r1.iterations) == k1
                             and int(r2.iterations) == k2),
        }
        print(mode, marg[mode], flush=True)
    if marg["tiles"]["marginal_ms_per_iter"] > 0:
        marg["gather_over_tiles"] = round(
            marg["gather"]["marginal_ms_per_iter"]
            / marg["tiles"]["marginal_ms_per_iter"], 3)
    report["chained_marginal"] = {
        "matrix": f"chained-block C={C} m={m} nnz={gch.nnz}",
        "caps": [k1, k2], **marg,
    }

    dst = os.path.join("results", "sharded_spmm_tpu.json")
    with open(dst, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
