#!/usr/bin/env python
"""BASELINE.json configs #3-#5 on the real chip: fixpoint solve rates.

Runs the three iterative workloads the north star names — BFS (or_and),
SSSP (min_plus), PageRank (plus_times + teleport fold) — on a
SuiteSparse-scale banded graph (512k rows) with the auto-selected Pallas
kernel, plus sharded PageRank on a 1-device mesh (the multi-chip program:
shard_map + psum convergence; N>1 chips are not reachable from this host,
the 8-virtual-device CPU suite covers the collective logic).

Each solve is one device dispatch (whole fixpoint inside lax.while_loop),
but on the axon-tunneled backend a dispatch carries a large fixed RPC +
transfer cost, so a single solve's wall clock says nothing about the
per-iteration rate (results/fixpoint_diag_tpu.json: the while_loop body
itself runs at 0.88-1.04 ms/iter ≈ HBM roofline, while naive solve walls
read 12-21 ms/iter). The honest clock is two-point differencing over the
iteration cap: time a K1-capped and a K2-capped solve of the SAME
non-converging workload and take (t_K2 − t_K1)/(K2 − K1) — every fixed
per-dispatch cost cancels. per-iteration work is one semiring SpMV, so
iters/s × nnz = effective Gnnz/s.

Writes results/fixpoint_tpu.json. Run from /root/repo.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/sh_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sparseharness_tpu.algorithms import bfs, pagerank, sssp
    from sparseharness_tpu.formats import banded_coo
    from sparseharness_tpu.gold import (
        bfs_reach_gold, pagerank_gold, sssp_gold,
    )
    from sparseharness_tpu.parallel import make_mesh, sharded_pagerank

    on_tpu = jax.default_backend() == "tpu"
    n = 1 << 19 if on_tpu else 1 << 12
    g = banded_coo(n, 3, seed=7)          # band 3 → 7 nnz/row, diameter n/3
    # correctness gate on a small instance of the same structure
    gs = banded_coo(1 << 10, 3, seed=7)
    small = {
        "bfs": np.array_equal(np.asarray(bfs(gs, 0).x), bfs_reach_gold(gs, 0)),
        "sssp": bool(np.allclose(np.asarray(sssp(gs, 0).x),
                                 sssp_gold(gs, 0), rtol=1e-5)),
        "pagerank": bool(np.allclose(np.asarray(pagerank(gs).x),
                                     pagerank_gold(gs), atol=1e-5)),
    }

    out = {"backend": jax.default_backend(),
           "device": jax.devices()[0].device_kind,
           "graph": f"banded n={n} nnz={g.nnz}",
           "gold_small": small, "solves": {}}

    def sync(res):
        np.asarray(np.asarray(res.x).ravel()[:1])
        return res

    def rate(name, make_solver, k1, k2, nnz=None):
        # make_solver(cap) = prebuilt factory (return_solver=True): the
        # timed call reruns ONLY the jitted on-device fixpoint — operand
        # build and upload happen once, like the reference's Harness ctor.
        # Two-point differencing over the caps cancels the axon dispatch
        # floor (see module docstring); convergence must not fire < k2
        # (checked via res.iterations).
        s1, s2 = make_solver(k1), make_solver(k2)
        r1 = sync(s1())            # compile + warm both cap programs
        r2 = sync(s2())
        # min-wall two-point: min over trials of each cap's solve wall,
        # ONE difference — the clock the r3 audit standardized on
        # (memory: tpu-clock-traps; ADVICE r3: median-of-paired-diffs
        # re-admits the ±40% rank-pairing jitter this repo already hit)
        w1, w2 = [], []
        for _ in range(3):
            t0 = time.perf_counter()
            sync(s1())
            w1.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            r2 = sync(s2())
            w2.append(time.perf_counter() - t0)
        per = (min(w2) - min(w1)) / (k2 - k1)
        capped_ok = int(r1.iterations) == k1 and int(r2.iterations) == k2
        nnz_eff = g.nnz if nnz is None else nnz
        out["solves"][name] = {
            "k1": k1, "k2": k2, "caps_reached": bool(capped_ok),
            "ms_per_iter": round(per * 1e3, 4),
            "iters_per_s": round(1.0 / per, 2) if per > 0 else 0.0,
            "effective_gnnz_per_s": round(nnz_eff / per / 1e9, 3)
            if per > 0 else 0.0,
            "dispatch_wall_s_k2": round(float(min(w2)), 4),
            "note": "dispatch_wall includes the axon RPC/transfer floor; "
                    "ms_per_iter is the two-point differential",
        }

    k1, k2 = (64, 192) if on_tpu else (4, 12)
    kp1, kp2 = (24, 72) if on_tpu else (4, 12)
    # band-3 BFS/SSSP need ~n/3 iterations to converge — caps never bind;
    # PageRank runs with delta=0 so δ-convergence cannot fire either
    rate("bfs_or_and",
         lambda cap: bfs(g, 0, variant="auto", max_iter=cap,
                         return_solver=True), k1, k2)
    rate("sssp_min_plus",
         lambda cap: sssp(g, 0, variant="auto", max_iter=cap,
                          return_solver=True), k1, k2)
    rate("pagerank",
         lambda cap: pagerank(g, variant="auto", delta=0.0, max_iter=cap,
                              return_solver=True), kp1, kp2)

    mesh = make_mesh(1)
    rate("sharded_pagerank_1dev",
         lambda cap: sharded_pagerank(g, mesh=mesh, delta=0.0, max_iter=cap,
                                      return_solver=True), kp1, kp2)

    # scattered regime: BFS on a long-diameter chained power-law graph —
    # variant=auto routes the structure to the sell2 crossbar kernel
    # (virtual-chunk packing), caps bind because diameter >> k2
    from sparseharness_tpu.formats import chained_power_law_coo

    gz = chained_power_law_coo(1 << 18 if on_tpu else 1 << 12,
                               128 if on_tpu else 8, seed=23)
    out["scattered_graph"] = f"chained zipf n={gz.shape[0]} nnz={gz.nnz}"
    rate("bfs_or_and_scattered_sell2",
         lambda cap: bfs(gz, 0, variant="auto", max_iter=cap,
                         return_solver=True), k1, k2, nnz=gz.nnz)

    # end-to-end converged PageRank (default δ=1e-6): the wall of one full
    # solve, reported separately so the converged-iteration count is on
    # record without polluting the per-iteration rate
    solver = pagerank(g, variant="auto", return_solver=True)
    sync(solver())
    t0 = time.perf_counter()
    res = sync(solver())
    dt = time.perf_counter() - t0
    out["solves"]["pagerank_converged"] = {
        "iterations": int(res.iterations), "converged": bool(res.converged),
        "dispatch_wall_s": round(dt, 4),
    }

    print(json.dumps(out, indent=1))
    if on_tpu:
        with open("results/fixpoint_tpu.json", "w") as f:
            json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
